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
# has held exactly 50 entries per round (CORRECTNESS_r01-r10.json) — so
# ordering is part of the verification contract.  Round 11 continues
# the REGISTRATION FREEZE (VERDICT r09/r10): zero new queries; round 10
# burned the last 39 never-witnessed names plus the 11 stalest
# (CORRECTNESS_r10.json: 50/50 green), so never-witnessed debt is 0 and
# 64 names remain whose latest witness is r2/r3.  The round-11 window
# is the first 50 of that stale queue, exactly as reserved by round
# 10's boundary comment (the 15 r2-era function-coverage names, then
# the r3 band through q90); the final 14 (q91 onward + s4a/s6-s8/u3)
# complete the burn-down in round 12, after which no witness predates
# r4.  Round-10 window names dropped out of _PRIORITY (they follow in
# module order).
#
# STANDING DEBT RULE (VERDICT r08 item 2): new registrations per round
# <= 50 minus the never-witnessed backlog; while backlog > 0, zero new
# names (hard cap 3, only for driver-found defects).
#
# STANDING ROTATION RULE (VERDICT r10 item 5) — in force from round 13,
# once the stale burn-down completes: the window is chosen
# OLDEST-WITNESSED-FIRST, computed from the CORRECTNESS_r*.json ledger
# by ``tools/next_window.py`` (ties broken by registry name).  With 410
# names and 50-slot windows the full cycle is ~8.2 rounds, so the
# maximum witness age under the rule is bounded at ~9 rounds; _PRIORITY
# is regenerated from the tool's output each round (it IS the rule's
# materialization — the tool prints the tuple to paste here, and
# tests/test_registry_integrity.py::test_window_follows_rotation_rule
# pins that the head of _PRIORITY equals the tool's choice).
_PRIORITY: tuple[str, ...] = (
    # ---- round-11 window (50): the stale queue, oldest-first, exactly
    # as reserved by the round-10 boundary comment.
    # -- (15) r2-era remainder --
    "q54_unpivot",
    "q55_grouping_sets",
    "q56_scalar_subquery",
    "q57_in_subquery",
    "q58_exists_not_exists",
    "q59_having",
    "q60_case_coalesce",
    "q61_stats_agg",
    "q62_argmin_argmax",
    "q63_string_agg",
    "q65_window_frame_funcs",
    "q66_values_lookup_join",
    "q67_distinct_multicol",
    "q73_vector_normalize",
    "q74_quantize_int8",
    # -- (49) r3-era, name order --
    "a51_lsh_recall_prop",
    "a52_ivf_recall_prop",
    "cs0_xml_to_parquet",
    "cs2_error_tolerant",
    "cs7_fallback_xml",
    "m51_media_dedup",
    "q100_incremental_agg",
    "q101_containment_pairs",
    "q16b_theta_join_agg_rewrite",
    "q34_exact_dedup",
    "q35a_jaccard_truth",
    "q35b_minhash_lsh",
    "q64_conditional_agg",
    "q68_neardup_clusters",
    "q68b_neardup_clusters_lsh",
    "q69_hash_sample",
    "q70_train_test_split",
    "q71_profile",
    "q72_histogram",
    "q75_funnel",
    "q76_retention_cohort",
    "q77_nullsafe_join",
    "q78_bag_setops",
    "q79_limit_offset",
    "q80_count_min_sketch",
    "q81_merge_upsert",
    "q82_resample_ffill",
    "q83_ewma",
    "q84_pagerank",
    "q85_bloom_prefilter",
    "q86_ngram_decontaminate",
    "q87_repetition_filter",
    "q88_top_word_dominance",
    "q89_stratified_sample",
    "q90_rebalance_sources",
    # ---- window boundary (50) — the final 14 below reserve for round
    # 12 and complete the stale burn-down; from round 13 the window is
    # chosen by the standing oldest-witnessed-first rule above --
    "q91_props_template",
    "q92_bloom_composite_key",
    "q93_adaptive_length_filter",
    "q94_incremental_dedup",
    "q95_weighted_sample",
    "q96_vocab_oov",
    "q97_sequence_packing",
    "q98_zorder_cells",
    "q99_salted_skew_join",
    "s4a_watermark_ontime",
    "s6_stateful_running_agg",
    "s7_stream_stream_join",
    "s8_stream_static_join",
    "u3_udaf_geomean",
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
