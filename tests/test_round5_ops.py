"""Round-5 operators: distributed global ntile, boilerplate phrase
burden, incremental LSH near-dup, and the auto-salt profile (the last
lives in test_skew_vectors.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from osm_changesets_to_parquet_spark.operators.dedup import (
    jaccard_pairs,
    lsh_neardup_incremental,
)
from osm_changesets_to_parquet_spark.operators.packing import (
    global_ntile,
    global_rank,
)
from osm_changesets_to_parquet_spark.operators.quality import boilerplate_burden


@pytest.mark.parametrize("n,k", [(10, 3), (23, 4), (7, 7), (5, 8), (1, 4)])
def test_global_ntile_matches_builtin(spark, n, k):
    # the closed-form NTILE arithmetic must equal Spark's builtin ntile
    # (which is itself the SQL standard) for every n/k shape: n % k != 0,
    # k > n, k == n, n == 1
    df = spark.range(n).select((F.col("id") * 7 % 100).alias("v"), "id")
    got = {
        (r.id, r.tile)
        for r in global_ntile(df, ["v", "id"], k, out_col="tile").collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        (r.id, r.tile)
        for r in df.select("id", F.ntile(k).over(w).cast("long").alias("tile")).collect()
    }
    assert got == want


def test_global_rank_composite_tiebreak(spark):
    # heavy ties on the bucketing key: rank must still be the total
    # (v, id) order because equal v values share a bucket
    df = spark.range(200).select((F.col("id") % 5).alias("v"), "id")
    got = {r.id: r.rank for r in global_rank(df, ["v", "id"], out_col="rank").collect()}
    w = Window.orderBy("v", "id")
    want = {
        r.id: r.rank
        for r in df.select("id", F.row_number().over(w).cast("long").alias("rank")).collect()
    }
    assert got == want


def test_global_ntile_rejects_bad_k(spark):
    df = spark.range(4).select(F.col("id").alias("v"), "id")
    with pytest.raises(ValueError):
        global_ntile(df, ["v", "id"], 0)


def test_boilerplate_burden_flags_shared_phrase(spark):
    # "the common footer" appears in 4 docs => boilerplate at min_docs=4;
    # doc 5 is too short for any 3-gram and must report 0/0/0.0
    rows = [
        (1, "alpha beta the common footer"),
        (2, "gamma delta the common footer"),
        (3, "epsilon zeta the common footer"),
        (4, "eta theta the common footer"),
        (5, "just two"),
        (6, "totally unrelated words here now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.n_grams, r.n_boiler, r.boiler_frac)
        for r in boilerplate_burden(df, n=3, min_docs=4).collect()
    }
    assert out[5] == (0, 0, 0.0)
    assert out[6] == (3, 0, 0.0)
    # docs 1-4: 3 distinct 3-grams each, exactly one shared by all four
    for d in (1, 2, 3, 4):
        assert out[d] == (3, 1, round(1 / 3, 6))


def test_range_lookup_exact_semantics(spark):
    from osm_changesets_to_parquet_spark.operators.intervals import range_lookup

    pts = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 99), (4, 100), (5, 250), (6, 17)], ["pid", "p"]
    )
    iv = spark.createDataFrame(
        [("a", 0, 10), ("b", 10, 100), ("c", 5, 20)],  # b/c overlap [10,20)
        ["tier", "lo", "hi"],
    )
    got = {(r.pid, r.tier) for r in range_lookup(pts, iv, "p", "lo", "hi", 7).collect()}
    # half-open [lo, hi): p=10 not in a, in b and c; p=100 outside all;
    # p=250 outside all; p=17 in b and c (overlapping intervals both match)
    assert got == {(1, "a"), (1, "c"), (2, "b"), (2, "c"), (3, "b"), (6, "b"), (6, "c")}


def test_range_lookup_plans_hash_join_not_nested_loop(spark, sf_dir):
    from osm_changesets_to_parquet_spark import queries as Q

    Q.load_all_modules()
    plan = (
        Q.REGISTRY["q140_range_lookup"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_lookup_property_matches_brute_force(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from osm_changesets_to_parquet_spark.operators.intervals import range_lookup

    @given(
        st.lists(st.integers(-50, 250), min_size=1, max_size=25),
        st.lists(
            st.tuples(st.integers(-60, 200), st.integers(1, 90)),
            min_size=1,
            max_size=12,
        ),
        st.integers(1, 40),
    )
    @settings(
        max_examples=5, deadline=None, derandomize=True,
        suppress_health_check=list(HealthCheck),
    )
    def run(points, spans, width):
        pts = spark.createDataFrame(
            [(i, p) for i, p in enumerate(points)], ["pid", "p"]
        )
        iv = spark.createDataFrame(
            [(j, lo, lo + ln) for j, (lo, ln) in enumerate(spans)],
            ["iid", "lo", "hi"],
        )
        got = {
            (r.pid, r.iid)
            for r in range_lookup(pts, iv, "p", "lo", "hi", width).collect()
        }
        want = {
            (i, j)
            for i, p in enumerate(points)
            for j, (lo, ln) in enumerate(spans)
            if lo <= p < lo + ln
        }
        assert got == want

    run()


def test_lsh_neardup_incremental_matches_cross_side_truth(spark):
    # near-identical docs across the old/new split: the incremental
    # banded path must find exactly the cross-side pairs the exact
    # jaccard_pairs truth set contains (recall 1.0 at this similarity)
    base = "spark scales shuffles with keyed aggregation over parquet data lakes"
    rows = [
        (0, base),
        (1, base + " extra"),
        (2, "an entirely different document about nothing shared at all"),
        (10, base),  # new: dup of 0/1
        (11, "an entirely different document about nothing shared at all"),  # dup of 2
        (12, "novel content no one has seen before in this corpus"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    old = df.where(F.col("doc_id") < 10)
    new = df.where(F.col("doc_id") >= 10)
    got = {
        (r.new_id, r.old_id, r.jac)
        for r in lsh_neardup_incremental(old, new, threshold=0.6).collect()
    }
    truth = {
        (max(r.id_a, r.id_b), min(r.id_a, r.id_b), r.jac)
        for r in jaccard_pairs(df, threshold=0.6).collect()
        if (r.id_a < 10) != (r.id_b < 10)
    }
    assert got == truth
    assert any(t[0] == 10 for t in got) and any(t[0] == 11 for t in got)
    assert not any(t[0] == 12 for t in got)
