"""Operator-level tests for operators.quality/packing (the q86-q97 family):
edge cases the oracle-parity comparison can't see (short docs, empty
strata, repartition stability) plus plan-shape pins for the scale
claims each docstring makes."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark import queries as Q
from osm_changesets_to_parquet_spark.catalog import load_table
from osm_changesets_to_parquet_spark.operators import quality as QL

Q.load_all_modules()


def _plan(spark, sf_dir, name: str) -> str:
    df = Q.REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_word_ngrams_short_docs_yield_no_rows(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d e"), (3, ""), (4, "one two three four five")],
        "doc_id long, text string",
    )
    out = QL.word_ngrams(df, 5, keep=["doc_id"])
    rows = {(r.doc_id, r.ngram) for r in out.collect()}
    # only docs with >= 5 words contribute; exactly size-n+1 grams each
    assert rows == {
        (2, "a b c d e"),
        (4, "one two three four five"),
    }


def test_word_ngrams_counts_match_formula(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = 8
    got = QL.word_ngrams(docs, n, keep=["doc_id"]).groupBy("doc_id").count()
    expect = docs.select(
        "doc_id",
        F.greatest(
            F.size(F.split("text", " ")) - F.lit(n - 1), F.lit(0)
        ).alias("expect"),
    )
    bad = got.join(expect, "doc_id").where(F.col("count") != F.col("expect"))
    assert bad.count() == 0


def test_decontaminate_matches_naive_reference(spark):
    train = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5"),  # contains eval's 4-gram w2..w5
            (2, "w9 w8 w7 w6 w5"),  # reversed: shares words, not grams
            (3, "x1 x2 x3"),  # too short for any 4-gram
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "w2 w3 w4 w5 z9")], "doc_id long, text string"
    )
    got = {r.doc_id for r in QL.decontaminate(train, eval_df, n=4).collect()}
    assert got == {1}


def test_stratified_sample_stable_under_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = QL.stratified_sample(docs, "lang", {"en": 50}, 10)
    b = QL.stratified_sample(docs.repartition(17, "source"), "lang", {"en": 50}, 10)
    assert {r.doc_id for r in a.select("doc_id").collect()} == {
        r.doc_id for r in b.select("doc_id").collect()
    }


def test_rebalance_caps_every_source(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = QL.rebalance_sources(docs, max_share_permille=40).collect()
    total = sum(r.n_docs for r in out)
    cap = total * 40 // 1000
    for r in out:
        assert 0 <= r.rate_permille <= 1000
        assert r.n_kept <= r.n_docs
        # the hash downsampling is probabilistic around the rate, but the
        # rate itself must honor the share cap exactly (covers the
        # rate=1000 branch too: n_docs <= cap there)
        assert r.rate_permille * r.n_docs <= 1000 * cap


def test_repetition_metrics_empty_and_uniform(spark):
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in QL.repetition_metrics(df).collect()}
    assert rows[1].dup_word_frac == 0.75
    assert rows[2].dup_word_frac == 0.0


# -- plan pins ---------------------------------------------------------------


def test_q89_sample_filter_in_scan_stage(spark, sf_dir):
    # the CASE-chain rate lookup + id-hash predicate must evaluate before
    # the single aggregation shuffle: no join, exactly one exchange
    plan = _plan(spark, sf_dir, "q89_stratified_sample")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_q86_eval_side_deduped_before_semijoin(spark, sf_dir):
    # the eval n-gram set must be reduced (HashAggregate pair for the
    # distinct) and the contamination join must stay a semi join
    plan = _plan(spark, sf_dir, "q86_ngram_decontaminate")
    assert "LeftSemi" in plan


def test_q93_bounds_broadcast_not_shuffled(spark, sf_dir):
    # the percentile scalars join back via broadcast; the corpus re-scan
    # must not hash-exchange for it
    plan = _plan(spark, sf_dir, "q93_adaptive_length_filter")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_q90_rate_table_broadcast_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q90_rebalance_sources")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# -- packing / cumsum (operators.packing) ------------------------------------


def test_global_cumsum_matches_naive_window(spark, sf_dir):
    from pyspark.sql.window import Window

    from osm_changesets_to_parquet_spark.operators.packing import global_cumsum

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("v")
    )
    got = global_cumsum(d, "doc_id", "v", out_col="c", num_partitions=7)
    naive = d.withColumn(
        "c", F.sum("v").over(Window.orderBy("doc_id"))
    )
    diff = got.join(naive, "doc_id").where(
        got["c"] != naive["c"]
    )
    assert diff.count() == 0


def test_global_cumsum_exclusive_and_partition_invariant(spark, sf_dir):
    from osm_changesets_to_parquet_spark.operators.packing import global_cumsum

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("v")
    )
    a = global_cumsum(d, "doc_id", "v", out_col="c", exclusive=True, num_partitions=3)
    b = global_cumsum(d, "doc_id", "v", out_col="c", exclusive=True, num_partitions=13)
    assert {(r.doc_id, r.c) for r in a.collect()} == {
        (r.doc_id, r.c) for r in b.collect()
    }
    first = a.orderBy("doc_id").first()
    assert first.c == 0  # exclusive: first row has no preceding mass


def test_pack_into_bins_respects_chunk_rule(spark):
    from osm_changesets_to_parquet_spark.operators.packing import pack_into_bins

    d = spark.createDataFrame(
        [(i, 100) for i in range(1, 41)], "doc_id long, tok int"
    )
    out = pack_into_bins(d, 1000, "tok", order_col="doc_id").collect()
    # 40 docs x 100 tokens, budget 1000: doc i (1-based) starts at
    # (i-1)*100 -> bin (i-1)//10
    for r in out:
        assert r.bin == (r.doc_id - 1) // 10


def test_global_cumsum_single_wide_shuffle(spark, sf_dir):
    from osm_changesets_to_parquet_spark.operators.packing import global_cumsum

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("v")
    )
    plan = (
        global_cumsum(d, "doc_id", "v", num_partitions=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one full-data hash exchange (the __bucket window) plus one tiny
    # exchange that carries only map-side PARTIAL sums (Catalyst pushes
    # the totals agg below its shuffle), the offsets frame broadcasts
    # back, and no unpartitioned window ever sees the full data (only
    # the |buckets|-row offsets prefix-sum may).  The old
    # spark_partition_id spelling shuffled the full data TWICE.
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "partial_sum" in plan  # the second exchange is post-partial-agg
    assert "BroadcastExchange" in plan
    data_windows = [
        seg for seg in plan.split("Window ") if seg.split("\n")[0].count("partitionBy=[]")
    ]
    for seg in data_windows:
        assert "HashAggregate" in seg


# -- z-order layout (operators.layout) ---------------------------------------


def test_zorder_partitions_disjoint_and_local(spark, sf_dir):
    from osm_changesets_to_parquet_spark.operators.layout import zorder_repartition

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    zed = zorder_repartition(o, ["o_custkey", "o_orderkey"], bits=10, num_partitions=8)
    spans = (
        zed.withColumn("__p", F.spark_partition_id())
        .groupBy("__p")
        .agg(
            F.min("__z").alias("zlo"),
            F.max("__z").alias("zhi"),
            F.min("o_custkey").alias("clo"),
            F.max("o_custkey").alias("chi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    # partitions own disjoint z-ranges (range partitioning on __z)
    ordered = sorted(spans, key=lambda r: r.zlo)
    for a, b in zip(ordered, ordered[1:]):
        assert a.zhi <= b.zlo
    # locality: the average per-partition custkey span must be well under
    # the global span (single-column-sorted-by-orderkey would give ~full
    # span in every partition)
    glo = min(r.clo for r in spans)
    ghi = max(r.chi for r in spans)
    avg_span = sum(r.chi - r.clo for r in spans) / len(spans)
    assert avg_span < 0.8 * (ghi - glo)
    # nothing lost
    assert sum(r.n for r in spans) == o.count()


def test_compact_parquet_dir_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    from osm_changesets_to_parquet_spark.operators.layout import compact_parquet_dir

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(24).write.mode("overwrite").parquet(src)
    import os

    n_in = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_in >= 20  # genuinely fragmented
    n_out = compact_parquet_dir(spark, src, dst, target_bytes=64 * 1024 * 1024)
    assert n_out < n_in
    assert spark.read.parquet(dst).count() == docs.count()


def test_compact_with_zorder_clusters_output(spark, sf_dir, tmp_path):
    from osm_changesets_to_parquet_spark.operators.layout import compact_parquet_dir

    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "zc")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    o.repartition(16).write.mode("overwrite").parquet(src)
    compact_parquet_dir(
        spark, src, dst, target_bytes=1024, z_cols=["o_custkey", "o_orderkey"]
    )
    back = spark.read.parquet(dst)
    assert back.count() == o.count()
    assert set(back.columns) == {"o_orderkey", "o_custkey"}


def test_collapsed_clusters_equal_plain(spark, sf_dir):
    from osm_changesets_to_parquet_spark.operators.clusters import (
        canonical_docs,
        canonical_docs_collapsed,
    )
    from osm_changesets_to_parquet_spark.operators.dedup import jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    plain = canonical_docs(docs, jaccard_pairs(docs, threshold=0.6))
    fast = canonical_docs_collapsed(docs, threshold=0.6)
    assert {(r.doc_id, r.cluster_id, r.keep) for r in plain.collect()} == {
        (r.doc_id, r.cluster_id, r.keep) for r in fast.collect()
    }


def test_collapsed_clusters_short_dup_docs(spark):
    # identical docs SHORTER than the shingle width have empty shingle
    # sets: the pair graph gives them no edge, so plain clustering keeps
    # them as separate singletons — the collapse must NOT merge them
    from osm_changesets_to_parquet_spark.operators.clusters import (
        canonical_docs,
        canonical_docs_collapsed,
    )
    from osm_changesets_to_parquet_spark.operators.dedup import jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "a b"),  # < 3 tokens: no shingles
            (2, "a b"),  # identical short dup
            (3, "x y z w x y z w"),
            (4, "x y z w x y z w"),  # identical long dup (collapses)
        ],
        "doc_id long, text string",
    )
    plain = {
        (r.doc_id, r.cluster_id, r.keep)
        for r in canonical_docs(docs, jaccard_pairs(docs, threshold=0.6)).collect()
    }
    fast = {
        (r.doc_id, r.cluster_id, r.keep)
        for r in canonical_docs_collapsed(docs, threshold=0.6).collect()
    }
    assert fast == plain
    assert (2, 2, True) in fast  # short dup stays its own cluster
    assert (4, 3, False) in fast  # long dup collapses into doc 3


def test_hash_bucket_overflow_safe(spark):
    # ids >= 2^31 must stay in [0, mod) and agree with the SQL spelling
    import duckdb

    from osm_changesets_to_parquet_spark.operators.quality import (
        hash_bucket,
        sql_hash_bucket,
    )

    ids = [0, 1, 2**31 - 1, 2**31, 2**31 + 7, 4_000_000_000, 2**62]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r.b for r in df.select("doc_id", hash_bucket("doc_id", 100).alias("b")).collect()}
    du = dict(
        duckdb.sql(
            "SELECT doc_id, " + sql_hash_bucket("doc_id", 100) + " AS b "
            "FROM (SELECT unnest(["
            + ",".join(str(i) for i in ids)
            + "]) AS doc_id)"
        ).fetchall()
    )
    for i in ids:
        assert 0 <= got[i] < 100
        assert got[i] == du[i]


def test_q68b_gate_rejects_uncalibrated_fixture(spark, tmp_path):
    import pytest

    from osm_changesets_to_parquet_spark.queries import FixtureGateError, REGISTRY

    # the DEDICATED gate type is the bench contract (ADVICE r09):
    # bench.py's tier-2 catches FixtureGateError into tier2_skipped and
    # lets any plain ValueError crash loudly — so every calibration gate
    # must raise the subclass, not bare ValueError
    with pytest.raises(FixtureGateError, match="calibration-pinned"):
        REGISTRY["q68b_neardup_clusters_lsh"].fn(spark, str(tmp_path / "sf9.9"))
    for gated in (
        "a51_lsh_recall_prop",
        "q139_incremental_neardup",
        "q142_neardup_persisted_index",
        "s14_streaming_neardup",
    ):
        with pytest.raises(FixtureGateError, match="calibration-pinned|re-sweep"):
            REGISTRY[gated].fn(spark, str(tmp_path / "sf9.9"))


def test_global_cumsum_null_key_not_dropped(spark):
    from osm_changesets_to_parquet_spark.operators.packing import global_cumsum

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (None, 5), (3, 30)], "k long, v long"
    )
    out = global_cumsum(df, "k", "v", out_col="c", num_partitions=3).collect()
    assert len(out) == 4  # the NULL-key row survives (bucketed to -1)


def test_lsh_jaccard_pairs_short_docs_no_degenerate_bucket(spark):
    from osm_changesets_to_parquet_spark.operators.dedup import (
        jaccard_pairs,
        lsh_jaccard_pairs,
    )

    # many sub-n-token docs (identical all-sentinel signatures) + two
    # genuine near-dups: the short docs must produce zero pairs, and the
    # LSH path must still find the true pair
    rows = [(i, "a b") for i in range(50)]
    rows += [(100, "x y z w v u t s"), (101, "x y z w v u t q")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in lsh_jaccard_pairs(docs, 0.6).collect()}
    truth = {(r.id_a, r.id_b) for r in jaccard_pairs(docs, 0.6).collect()}
    assert got == truth
    assert all(a >= 100 for a, _ in got)


def test_q94_incremental_dedup_plan_shape(spark, sf_dir):
    # the corpus side reduces to DISTINCT hashes feeding a broadcastable
    # anti-join; no cartesian anywhere
    plan = _plan(spark, sf_dir, "q94_incremental_dedup")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q96_vocab_broadcasts(spark, sf_dir):
    # the top-K vocabulary is O(K) rows: its membership probe must reach
    # the token stream as a broadcast join, never a shuffled one
    plan = _plan(spark, sf_dir, "q96_vocab_oov")
    assert "BroadcastHashJoin" in plan


def test_q100_merge_agg_partial(spark, sf_dir):
    # both partial aggregates and the merge aggregate must take map-side
    # partials (partial_count/partial_sum before every exchange)
    plan = _plan(spark, sf_dir, "q100_incremental_agg")
    assert "partial_count" in plan or "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_check_constraints_counts_each_violation_kind(spark):
    from osm_changesets_to_parquet_spark.operators import validate as V

    df = spark.createDataFrame(
        [(1, 10.0, "O"), (1, -5.0, "O"), (2, 20.0, "X"), (3, None, None)],
        ["k", "price", "status"],
    )
    ref = spark.createDataFrame([(1,), (2,)], ["rk"])
    rep = {
        r.check_name: (r.n_violations, r["pass"])
        for r in V.check_constraints(
            df,
            row_checks=[
                V.not_null("price"),
                V.in_range("price", 0.0, 100.0),
                V.in_set("status", ["O", "F", "P"]),
            ],
            unique=["k"],
            foreign_keys=[("k", ref, "rk")],
        ).collect()
    }
    assert rep["not_null(price)"] == (1, False)
    # -5 out of range + NULL counts as violation per the null-is-bad contract
    assert rep["in_range(price,0.0,100.0)"] == (2, False)
    assert rep["in_set(status)"] == (2, False)  # 'X' + NULL
    assert rep["unique(k)"] == (1, False)  # k=1 twice
    assert rep["foreign_key(k)"] == (1, False)  # k=3 unreferenced


def test_check_constraints_row_checks_fuse_into_one_scan(spark, sf_dir):
    from osm_changesets_to_parquet_spark.operators import validate as V

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rep = V.check_constraints(
        o,
        row_checks=[
            V.not_null("o_custkey"),
            V.in_range("o_totalprice", 0.0, 100000.0),
            V.in_set("o_orderstatus", ["O", "F", "P"]),
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1


def test_check_constraints_requires_some_constraint(spark):
    import pytest as _pytest

    from osm_changesets_to_parquet_spark.operators import validate as V

    df = spark.createDataFrame([(1,)], ["k"])
    with _pytest.raises(ValueError):
        V.check_constraints(df)
