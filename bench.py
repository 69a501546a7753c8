#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is forced with the noop sink (full plan execution, no
collect/IO skew).  The set spans the engine's surface: scan, hash agg,
star join, range join, window, top-k, JSON, dedup, cosine top-k,
tf-idf, decontamination, repetition analysis, sequence packing,
Z-order layout, event-time windows, sessionization.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from osm_changesets_to_parquet_spark import queries as Q  # noqa: E402
from osm_changesets_to_parquet_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "q01_count",
    "q04_groupby_agg",
    "q10_join4_revenue",
    "q17_range_join",
    "q18_asof_join",
    "q19_rank_topn",
    "q24_topk",
    "q16_theta_join",
    "q31_json_extract",
    "q34_exact_dedup",
    "q35b_minhash_lsh",
    "q68b_neardup_clusters_lsh",
    "q36_cosine_topk",
    "q38_token_freq",
    "q40_tfidf",
    "q86_ngram_decontaminate",
    "q88_top_word_dominance",
    "q97_sequence_packing",
    "q98_zorder_cells",
    "m48_image_decode_features",
    "s1_tumbling_window",
    "s3_session_window",
    "s4a_watermark_ontime",
    # round 4 additions: hamming-band dedup, distributed k-means, and
    # the PassJoin edit-distance join (benchable since common-affix
    # stripping: the constant "Customer#0000" template is removed from
    # the blocking keys, DNF -> ~17 s at sf0.1; operators/editdist.py)
    "q110_simhash_neardup",
    "q112_editdist_join",
    "q115_kmeans",
    # round 5: keep the iterative-graph wins honest with tracked numbers
    # (star-contraction CC inside the simhash cluster path; pointer-
    # doubling hierarchy closure), plus the new corpus-scale phrase
    # profiler and the bucketed range lookup
    "q117_simhash_clusters",
    "q116_hierarchy_closure",
    "q136_boilerplate_phrases",
    "q140_range_lookup",
    # round 6: span-level repeated-substring dedup, the persisted-index
    # near-dup probe (the 100 TB increment path), and BPE merge rounds
    "q143_repeated_spans",
    "q142_neardup_persisted_index",
    "q144_bpe_merges",
    "q145_bpe_encode",
    "q146_quantized_rerank",
]

# Second tier (VERDICT r05 item 7): a fixed wider set run ONCE each (no
# min-of-3) so registry-wide regressions show up numerically instead of
# anecdotally — families the headline set doesn't touch: iterative
# graph, containment/prefix-filter/SemDeDup dedup, ranking/eval, PMI,
# skew profiling, global deciles, incremental near-dup, sketches, the
# three Python DataSource paths (batch read, write, partitioned stream).
TIER2_QUERIES = [
    "q84_pagerank",
    "q101_containment_pairs",
    "q102_semdedup",
    "q109_bm25_topk",
    "q121_ndcg_eval",
    "q123_pmi_collocations",
    "q125_jaccard_prefix_filter",
    "q133_join_skew_profile",
    "q137_equifreq_deciles",
    "q139_incremental_neardup",
    "q141_heavyhitters",
    # (q135_contrastive_ann is calibration-pinned to sf<=0.01 — excluded)
    "cs11_python_datasource",
    "cs12_python_datasource_writer",
    "s13_partitioned_stream_source",
    "s14_streaming_neardup",
    "q147_dsir_weights",
    "q148_tokenizer_fertility",
    "q149_decontaminate_spans",
    "q150_ann_persisted_index",
    "q151_ann_incremental",
    "s15_streaming_quality_router",
    "q152_unigram_entropy",
    "q153_group_jaccard",
    "q154_incremental_agg",
    "q155_grid_join_2d",
    "q156_event_transitions",
    "q157_rolling_median",
    "s16_streaming_transitions",
    "q158_variant_shred",
    "q159_manifest_skipping",
    "q160_log_odds_terms",
    "q161_sql_surface",
    "q162_group_ols",
    "q163_zorder_skipping",
    "q164_recursive_cte",
    "u5_arrow_grouped_stats",
    "q165_mmr_rerank",
    "q166_nearest_centroid",
    "s17_full_outer_stream_join",
    "q167_targeted_delete",
    "q168_budget_select",
    "q169_rolling_dau",
    "q170_autocorrelation",
    # round-6 continuation: pair mining, eval stats, blocking,
    # retrieval infra, sketch estimation, coreset/PCA, analytics
    "q171_frequent_pairs",
    "q172_roc_auc",
    "q173_ab_ztest",
    "q174_sorted_neighborhood",
    "q175_cms_join_estimate",
    "q176_inverted_index",
    "q177_kcenter_coreset",
    "s18_streaming_cms",
    "q178_pca_power",
    "q179_knn_label_audit",
    "q180_rfm_segments",
    "q181_twap",
    "q182_cusum_changepoint",
    "q183_attribution",
    "q184_benford_audit",
    "q185_windowed_funnel",
    "q186_path_mining",
    "q187_pareto_concentration",
    "u6_udtf_analyze_dynamic_schema",
    "q188_column_mi",
    "q189_key_gini",
    "q190_skyline",
    "q191_dynamic_partition_pruning",
    "q192_emd_drift",
    "q193_decile_lift",
    "s19_streaming_conversions",
    "q194_embedding_dim_stats",
    "q195_negative_sampling",
    "q196_poisson_bootstrap",
    "q197_table_digest",
    "q198_weighted_median",
    "q199_linear_interpolation",
    "q200_tpch_q3",
    "q201_hll_overlap",
    "q202_matrix_projection",
    "q203_grouped_percentiles",
    "q204_nearest_score_match",
    "q205_sequential_patterns",
    "s20_python_stream_sink",
    # round 7: sampling, robust stats, rank tests, geo/graph joins,
    # sketch-gated filtering, PAV calibration, streaming top-k
    "cs13_parse_diagnostics",
    "cs14_single_file_publish",
    "q206_stratified_sample",
    "q207_reservoir_sample",
    "q208_isotonic_calibration",
    "q209_session_entropy",
    "q210_bipartite_projection",
    "q211_haversine_join",
    "q212_theil_sen",
    "q213_mann_whitney",
    "q214_chi2_feature_select",
    "q215_winsorized_stats",
    "q216_bloom_antijoin",
    "q217_recency_weighted_ctr",
    "s21_streaming_topk",
    "q218_triangle_count",
    "q219_kaplan_meier",
    "q220_dow_seasonality",
    "q221_anomaly_zscore",
    "q222_bigram_perplexity",
    "q223_ks_drift",
    "q224_gram_novelty",
    "q225_source_overlap",
    "q226_lateral_topn",
    "q227_doc_chunking",
    "q228_dataset_mixing",
    "q229_batch_sessionize",
    "q230_weighted_reservoir",
    "q231_wow_growth",
    "u7_map_in_arrow",
    # round-7 session-2 additions: the perf-interesting shapes (the
    # cheap single-agg ones — q233/q239/q240/q242 — stay out to keep
    # the canary tight)
    "q232_spearman",
    "q235_naive_bayes",
    "q236_holt_smoothing",
    "q237_kendall_tau",
    "q238_kcore",
    "q241_vocab_coverage",
    "q243_pq_adc",
    "q249_retrieval_metrics",
    "q255_markov_eval",
    "s22_streaming_anomaly",
    "q257_label_propagation",
    "q263_token_bucket",
    "q264_rrf_fusion",
    "m52_cdc_chunk_dedup",
]


def _size_aware_shuffle_partitions(sf_dir: str, cpus: int) -> int:
    """Partition count should track data volume, not just core count.

    Rule: one shuffle partition per ~64 MiB of input, clamped to
    [cpus/4, 4*cpus].  At sf0.1 (~50 MiB total) that is 8 partitions —
    a 32-way shuffle of 30 MiB is pure task-scheduling overhead; on a
    real cluster the same rule scales the count up with the data and AQE
    coalesces/splits from runtime stats.

    Round-5 note on the BENCH_r04 q04 blip (0.314 -> 0.590 s): re-measured
    min-of-5 under both settings — q04 is 0.349 s at nshuf=8 vs 0.318 s at
    nshuf=32, i.e. this config costs ~0.03 s on the tiniest query (fewer
    but larger first-stage tasks), and the r04 0.59 s was shared-machine
    noise on top.  Keeping the rule: the ~10% penalty on a 0.3 s query is
    scheduling overhead the rule exists to trade away at real scale.
    """
    total = 0
    for p in Path(sf_dir).glob("*.parquet"):
        total += p.stat().st_size
    want = max(1, total // (64 * 1024 * 1024))
    return int(max(max(2, cpus // 4), min(want, 4 * cpus)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    nshuf = _size_aware_shuffle_partitions(sf_dir, cpus)
    spark = get_spark(
        "engine-bench",
        extra_conf={"spark.sql.shuffle.partitions": str(nshuf)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(nshuf))
    qs = Q.queries()

    # Warm-up: initialize executor threads, codegen, parquet footers for
    # every table — measure the engine, not JVM startup / first IO touch.
    from osm_changesets_to_parquet_spark.catalog import load_all

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for df in load_all(spark, sf_dir).values():
        df.count()
    # Steady-state measurement: run each query once un-timed so the timed
    # pass measures execution, not one-time whole-stage-codegen compilation
    # (JIT warm-up, standard JMH-style methodology).
    for name in BENCH_QUERIES:
        if name in qs:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            print(
                f"warmup {name} {time.perf_counter() - t0:.2f}s",
                file=sys.stderr,
                flush=True,
            )

    # min-of-3: identical code has measured +/-40% run-to-run drift from
    # shared-machine noise; the minimum is the standard steady-state
    # estimator (JMH practice) and makes cross-round comparisons about
    # the PLAN, not the neighbor's workload.
    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        total += best
        print(f"timed {name} {best:.2f}s", file=sys.stderr, flush=True)

    # tier 2: ONE cold timed run each — a regression canary for the
    # wider registry, not a steady-state micro-benchmark (its job is to
    # catch 2x plan regressions, not 5% drift; always-cold numbers are
    # comparable round-over-round, and warm+min-of-3 would triple the
    # bench wall-clock for no added signal at that sensitivity)
    tier2: dict[str, float] = {}
    tier2_total = 0.0
    for name in TIER2_QUERIES:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        tier2[name] = round(dt, 3)
        tier2_total += dt
        print(f"tier2 {name} {dt:.2f}s", file=sys.stderr, flush=True)

    # Driver contract (VERDICT r06 item 1): the harness captures only the
    # LAST ~2000 characters of stdout and parses the final line as JSON.
    # The full tier-2 dump (~80 entries, >2.5 KB) therefore goes to an
    # EARLIER stdout line + stderr; the final line is the compact headline
    # (tier-1 per-query timings + totals) and must stay under ~1.5 KB.
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail = json.dumps(
        {"tier2": tier2, "tier2_total": round(tier2_total, 3), "sf": sf_val},
        separators=(",", ":"),
    )
    print(detail)
    print(detail, file=sys.stderr, flush=True)
    headline = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": round(total, 3),
            "unit": "sec",
            "queries": timings,
            "tier2_total": round(tier2_total, 3),
            "tier2_count": len(tier2),
            "sf": sf_val,
        },
        separators=(",", ":"),
    )
    assert len(headline) < 1500, f"headline line too long: {len(headline)}"
    print(headline, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
