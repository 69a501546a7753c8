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
- time arithmetic is over integer epoch micros (``events.ts`` is
  TIMESTAMP(NANOS) parquet; Spark truncates to micros, DuckDB keeps ns —
  integer micros is the shared domain);
- column names are aliased identically on both sides (the driver sorts
  columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


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
# has held exactly 50 entries per round (CORRECTNESS_r01-r08.json) — so
# ordering is part of the verification contract.  Round 9 is a
# REGISTRATION FREEZE (VERDICT r08 items 1-2): zero new queries; the
# window takes the next 50 queued names exactly as reserved last round
# — the 42 round-8 session-2/3 registrations, then the first 8 of the
# round-7 remainder (q254, s22, q255-q260) — dropping the
# never-driver-witnessed count 89 -> 39.
#
# STANDING DEBT RULE (VERDICT r08 item 2): new registrations per round
# <= 50 minus the never-witnessed backlog; while backlog > 0, zero new
# names (hard cap 3, only for driver-found defects).  Round 10 is
# reserved for the remaining 39 never-witnessed (q261-q298 band, m52)
# plus the first 11 r1-r3-stale names (m48-m50, q27-q33, q53); round 11
# finishes the stale backlog so no witness predates r4.  Names
# witnessed in r8 drop out of _PRIORITY (they follow in module order).
_PRIORITY: tuple[str, ...] = (
    # -- round-9 window: round-8 session-2 registrations (13) --
    "q313_t_closeness",
    "q314_mcnemar",
    "q315_cochran_armitage",
    "q316_brown_forsythe",
    "q317_anova_f",
    "q318_cvm_two_sample",
    "q319_holm_stepdown",
    "q320_nelson_aalen",
    "q321_forecast_backtest",
    "q322_simpson_paradox",
    "q323_connected_components",
    "s25_stream_quantile_sketch",
    "m54_video_scene_cuts",
    # -- round-9 window: round-8 session-3 registrations (29) --
    "q324_hits",
    "q331_wl_refinement",
    "q333_khop_reach",
    "q326_position_attribution",
    "q330_js_divergence",
    "q327_dp_noisy_counts",
    "q325_fellegi_sunter",
    "q328_empirical_bayes",
    "q329_uplift_qini",
    "q332_lm_holdout",
    "m55_audio_vad",
    "q335_textrank_keywords",
    "q336_item_cf",
    "q334_gmm_em",
    "q337_dbscan",
    "s26_backfill_cutover",
    "q338_cf_eval",
    "q339_knn_classifier",
    "q340_markov_attribution",
    "q341_randomized_response",
    "q342_modularity",
    "q343_greedy_decode",
    "q345_iv_wald",
    "q346_regression_discontinuity",
    "q347_rec_coverage",
    "q344_adaboost_stumps",
    "q348_als_factorization",
    "q349_bandit_replay",
    "q350_holt_winters",
    # -- round-9 window: first 8 of the round-7 remainder (42+8=50) --
    "q254_randomization_test",
    "s22_streaming_anomaly",
    "q255_markov_eval",
    "q256_heaps_law",
    "q257_label_propagation",
    "q258_degree_assortativity",
    "q259_seasonal_decomposition",
    "q260_term_burstiness",
    # ---- window boundary (50) — names below reserve for round 10:
    # the remaining 39 never-witnessed, then the stalest r1-r3 names --
    "q261_cohort_ltv",
    "q262_similarity_histogram",
    "q263_token_bucket",
    "q264_rrf_fusion",
    "m52_cdc_chunk_dedup",
    "q265_cohens_kappa",
    "q266_ratio_metric_delta",
    "q267_importance_ess",
    "q268_rank_biased_overlap",
    "q269_woe_iv",
    "q270_churn_labels",
    "q271_rendezvous_sharding",
    "q272_greedy_set_cover",
    "q273_apriori_triples",
    "q274_good_turing",
    "q275_ab_power_mde",
    "q276_capture_recapture",
    "q277_partial_correlation",
    "q278_profile_cosine",
    "q279_engagement_auc",
    "q280_cost_threshold",
    "q281_session_lift",
    "q282_quantile_treatment_effect",
    "q283_cuped",
    "q284_srm_check",
    "q285_dedup_roi",
    "q286_page_hinkley",
    "q287_subgroup_auc_gap",
    "q288_lsh_planner",
    "q289_kruskal_wallis",
    "q290_logrank",
    "q291_fleiss_kappa",
    "q292_minhash_error_audit",
    "q293_vocab_forecast",
    "q294_markov_entropy_rate",
    "q295_similarity_transitivity",
    "q296_sprt",
    "q297_nbinom_fit",
    "q298_lsh_stage_quality",
    # -- (4) stalest (r1/r2-era) oldest-first --
    "m48_image_decode_features",
    "m49_audio_frame_sample",
    "m50_image_resize",
    "q27_except",
    "q28_string_funcs",
    "q29_date_funcs",
    "q30_math_funcs",
    "q31_json_extract",
    "q32_map_funcs",
    "q33_array_funcs",
    "q53_pivot",
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
    "q64_conditional_agg",
    "q75_funnel",
    "q76_retention_cohort",
    "q82_resample_ffill",
    "q83_ewma",
    "a51_lsh_recall_prop",
    "a52_ivf_recall_prop",
    "cs0_xml_to_parquet",
    "cs2_error_tolerant",
    "cs7_fallback_xml",
    "q69_hash_sample",
    "q70_train_test_split",
    "q71_profile",
    "q72_histogram",
    "q81_merge_upsert",
    "q35a_jaccard_truth",
    "q35b_minhash_lsh",
    "q68_neardup_clusters",
    "e46_embedding_neardup",
)
# no rows-only queries remain (a51/a52 carry tolerance oracles now)
_LAST: tuple[str, ...] = ()


def load_all_modules() -> None:
    """Import every query module so REGISTRY is fully populated."""
    from osm_changesets_to_parquet_spark.queries import (  # noqa: F401
        analytics,
        ann,
        bucketing,
        conversion,
        curation,
        dedup_sim,
        governance,
        graph,
        llm_ops,
        ml_corpus,
        ml_experiments,
        ml_model_eval,
        ml_stat_tests,
        ml_timeseries,
        multimodal,
        quality,
        relational,
        relational_ext,
        sketches,
        sources_roundtrip,
        stats,
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
