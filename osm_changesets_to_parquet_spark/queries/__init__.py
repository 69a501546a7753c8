"""Declared query surface (SURVEY.md §2.B) — the executable contract.

Each :class:`QuerySpec` pairs a Spark implementation (a callable taking
``(spark, sf_dir)`` and returning a DataFrame) with the ANSI-SQL oracle
string DuckDB runs on the same parquet tables.  The driver hash-matches
the two at sf0.01 (CORRECTNESS_r{N}.json); ``tests/test_oracle_parity.py``
runs the same comparison locally at sf0.001.

Determinism discipline (SURVEY.md §2.B rules 1-5):
- every query's output has a unique total order key (for LIMIT queries,
  the ORDER BY is total);
- every floating aggregate is ROUND()ed, with the rounding applied to
  the *same* double on both sides;
- time arithmetic is over integer epoch micros (``catalog.load_table``
  normalizes ``events.ts`` to a ``ts_us`` long whatever physical unit a
  fixture generation carries — the current fixtures are
  TIMESTAMP(MICROS); integer micros is the Spark/DuckDB shared domain);
- column names are aliased identically on both sides (the driver sorts
  columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


class FixtureGateError(ValueError):
    """A calibration-pinned query refusing an uncalibrated fixture.

    Recall-property queries (a51/a52/q135/q146/q150/q151) verify their
    approximate path against a brute-force oracle only on fixtures
    where the parameters were swept to recall 1.0; on any other
    fixture they fail fast with THIS error instead of letting a
    spurious mismatch be recorded.  A dedicated type (ADVICE r09) lets
    bench.py record the refusal as a ``tier2_skipped`` entry while any
    other ValueError — a genuine bug — still crashes the bench loudly.
    Subclasses ValueError so pre-r10 callers' handling is unchanged.
    """


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => driver does a weaker rows-only check
    doc: str = ""
    tables: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tables: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tables=tables)
        return fn

    return deco


# The driver records correctness rows in registry order and its window
# has held exactly 50 entries per round (CORRECTNESS_r01-r12.json) — so
# ordering is part of the verification contract.  Round 13 continues
# the REGISTRATION FREEZE (VERDICT r09-r12): zero new queries.  The
# stale burn-down completed in r12 (CORRECTNESS_r12.json: 50/50 green;
# no witness predates r4), so this is the FIRST steady-state window:
# pure oldest-witnessed-first output of tools/next_window.py — it
# fronts the r4-era streaming/UDF names (s1–s3, s4b, s5, s9, s10,
# u1/u2/u4, q124–q126, cs9–cs11, m47) and fills with the oldest
# r5-witnessed names in ascending name order.
#
# STANDING DEBT RULE (VERDICT r08 item 2): new registrations per round
# <= 50 minus the never-witnessed backlog; while backlog > 0, zero new
# names (hard cap 3, only for driver-found defects).
#
# STANDING ROTATION RULE (VERDICT r10 item 5) — this window IS the
# rule's output: the window is chosen OLDEST-WITNESSED-FIRST, computed
# from the git-TRACKED CORRECTNESS_r*.json ledger by
# ``tools/next_window.py`` (ties broken by registry name; see that
# tool's docstring for why the rule reads only tracked ledgers — the
# driver drops each round's ledger untracked after the final commit).
# With 410 names and 50-slot windows the full cycle is ~8.2 rounds, so
# the maximum witness age under the rule is bounded at ~9 rounds;
# _PRIORITY is regenerated from the tool's output each round (the tool
# prints the tuple to paste here, and
# tests/test_registry_integrity.py::test_window_follows_rotation_rule
# pins that the head of _PRIORITY equals the tool's choice).
_PRIORITY: tuple[str, ...] = (
    # ---- window (50): oldest-witnessed-first ----
    "q124_doc_chunking",
    "q125_jaccard_prefix_filter",
    "q126_group_cap_sample",
    "s10_stream_merge_upsert",
    "s1_tumbling_window",
    "s2_sliding_window",
    "s3_session_window",
    "s4b_watermark_late_drops",
    "s5_streaming_dedup",
    "s9_session_window_stream",
    "u1_pandas_udf_normalize",
    "u2_grouped_map_zscore",
    "u4_udtf_tokenize",
    "cs10_bbox_cells",
    "cs11_python_datasource",
    "cs9_pipeline_roundtrip",
    "m47_multimodal_meta",
    "q08_approx_count_distinct",
    "q09_percentile",
    "q10_join4_revenue",
    "q11_left_join",
    "q127_leakage_safe_split",
    "q128_mad_outlier_scrub",
    "q129_unigram_logprob",
    "q12_full_outer",
    "q130_text_normalize",
    "q131_cross_source_dups",
    "q133_join_skew_profile",
    "q134_dedup_funnel",
    "q135_contrastive_ann",
    "q136_boilerplate_phrases",
    "q137_equifreq_deciles",
    "q138_cluster_canonical_pick",
    "q139_incremental_neardup",
    "q13_semi_join",
    "q140_range_lookup",
    "q141_heavyhitters",
    "q14_anti_join",
    "q15_cross_join",
    "q16_theta_join",
    "q17_range_join",
    "q18_asof_join",
    "q19_rank_topn",
    "q20_lag_lead",
    "q21_running_sum",
    "q22_range_frame",
    "q23_ntile_percent_rank",
    "q24_topk",
    "q25_union",
    "q26_intersect",
    # ---- next-oldest tail (14) ----
    "q36_cosine_topk",
    "q37_centroid",
    "q38_token_freq",
    "q39_bigrams",
    "q40_tfidf",
    "s11_left_outer_stream_join",
    "s12_python_stream_source",
    "t41_language_id",
    "t42_quality_score",
    "t43_token_count",
    "t44_fingerprint",
    "t45_simhash",
    "q152_unigram_entropy",
    "q153_group_jaccard",
)
# no rows-only queries remain (a51/a52 carry tolerance oracles now)
_LAST: tuple[str, ...] = ()


def load_all_modules() -> None:
    """Import every query module so REGISTRY is fully populated."""
    from osm_changesets_to_parquet_spark.queries import (  # noqa: F401
        analytics,
        analytics_metrics,
        ann,
        ann_embeddings,
        ann_ranking,
        bucketing,
        conversion,
        curation,
        dedup_sim,
        governance,
        graph,
        graph_apps,
        llm_ops,
        ml_corpus,
        ml_experiments,
        ml_model_eval,
        ml_model_fit,
        ml_stat_tests,
        ml_timeseries,
        multimodal,
        quality,
        relational,
        relational_ext,
        sketches,
        sources_roundtrip,
        stats,
        stats_inference,
        streaming_jobs,
        temporal,
        udfs,
        windows_streaming,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered and name not in _LAST:
            ordered[name] = spec
    for name in _LAST:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    REGISTRY.clear()
    REGISTRY.update(ordered)


def queries() -> dict[str, QueryFn]:
    load_all_modules()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    load_all_modules()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
