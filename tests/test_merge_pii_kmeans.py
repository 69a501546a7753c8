"""Round-4 operators: snapshot_diff CDC, PII redaction, Lloyd k-means."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.operators.merge import snapshot_diff
from osm_changesets_to_parquet_spark.operators.similarity import kmeans_lloyd
from osm_changesets_to_parquet_spark.operators.text import redact_pii


def test_snapshot_diff_classifies_all_cases(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)], ["k", "p"]
    )
    new = spark.createDataFrame(
        [(2, 21.0), (3, None), (4, 40.0), (5, 50.0)], ["k", "p"]
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, "k", ["p"]).collect()
    }
    # 1 only in old; 2 changed; 3 null==null (null-safe) unchanged;
    # 4 identical; 5 only in new
    assert got == {
        1: "removed",
        2: "changed",
        3: "unchanged",
        4: "unchanged",
        5: "added",
    }


def test_snapshot_diff_multi_column_and_keys(spark):
    old = spark.createDataFrame([(1, "a", 1.0, "x")], ["k1", "k2", "p", "q"])
    new = spark.createDataFrame([(1, "a", 1.0, "y")], ["k1", "k2", "p", "q"])
    row = snapshot_diff(old, new, ["k1", "k2"], ["p", "q"]).collect()[0]
    assert row.change_type == "changed"
    assert row.old_q == "x" and row.new_q == "y" and row.old_p == row.new_p


def test_redact_pii_masks_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b-c_1@ex-a.org and d@e.io, ip 192.168.0.1, tel 555-1234"),
            (2, "no pii here at all"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in redact_pii(df).collect()}
    r1 = rows[1]
    assert (r1.n_email, r1.n_ip, r1.n_phone) == (2, 1, 1)
    assert r1.redacted == "mail <EMAIL> and <EMAIL>, ip <IP>, tel <PHONE>"
    r2 = rows[2]
    assert (r2.n_email, r2.n_ip, r2.n_phone) == (0, 0, 0)
    assert r2.redacted == "no pii here at all"


def test_kmeans_separates_blobs(spark):
    # two tight blobs far apart: after 2 iterations every point must sit
    # with its blob, whatever the seed assignment was
    rows = [(i, [0.0 + i * 0.01, 0.0]) for i in range(10)] + [
        (100 + i, [100.0 + i * 0.01, 100.0]) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    assigned, cent = kmeans_lloyd(df, k=2, iters=2)
    out = assigned.collect()
    lo = {r.cid for r in out if r.id < 100}
    hi = {r.cid for r in out if r.id >= 100}
    assert len(lo) == 1 and len(hi) == 1 and lo != hi
    assert cent.count() == 2


@pytest.mark.slow  # >8 s: full-suite gate only (pytest.ini)
def test_kmeans_kernel_equals_hof_spelling(spark, sf_dir):
    """The round-13 vectorized assign kernel (_kmeans_assign_udf) must
    produce BYTE-IDENTICAL assignments and centroids to the retained
    interpreted-HOF fold — on the real fixture AND on adversarial rows
    (ties, NULL vectors, NULL elements, length mismatches, empties)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a_new, c_new = kmeans_lloyd(emb, k=4, iters=2)
    a_old, c_old = kmeans_lloyd(emb, k=4, iters=2, use_kernel=False)
    assert a_new.orderBy("id").collect() == a_old.orderBy("id").collect()
    assert (
        c_new.orderBy("cid").collect() == c_old.orderBy("cid").collect()
    )

    adversarial = spark.createDataFrame(
        [
            (1, [0.0, 0.0]),       # seed 0
            (2, [4.0, 4.0]),       # seed 1
            (3, [2.0, 2.0]),       # exactly equidistant -> tie to lower cid
            (4, None),             # NULL vector -> cid -1
            (5, [1.0, None]),      # NULL element poisons the fold -> -1
            (6, [1.0, 2.0, 3.0]),  # length mismatch vs every centroid -> -1
            (7, [0.1, -0.2]),
        ],
        "vec_id long, embedding array<double>",
    )
    for k in (1, 2):
        g_new, _ = kmeans_lloyd(adversarial, k=k, iters=1)
        g_old, _ = kmeans_lloyd(adversarial, k=k, iters=1, use_kernel=False)
        assert (
            g_new.orderBy("id").collect() == g_old.orderBy("id").collect()
        )


def test_kmeans_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, [1.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=0, iters=1)
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=1, iters=0)


def test_kmeans_assignment_plan_has_no_data_shuffle(spark):
    # ASSIGN must be a map stage: the only exchanges in the assignment
    # subtree come from the tiny centroid build, never a repartition of
    # the data frame by anything
    rows = [(i, [float(i), 0.0]) for i in range(50)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    assigned, _ = kmeans_lloyd(df, k=2, iters=1)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(id" not in plan
    assert "Exchange hashpartitioning(v" not in plan


def test_forest_closure_deep_chain_logarithmic_rounds(spark):
    from osm_changesets_to_parquet_spark.operators.closure import forest_closure

    # a 100-deep path: chain-following would need 100 joins; pointer
    # doubling must close it in 7 rounds (2^7 = 128 >= 100)
    nodes = spark.createDataFrame([(i,) for i in range(101)], ["node"])
    edges = spark.createDataFrame([(i, i - 1) for i in range(1, 101)], ["child", "parent"])
    out = {r.node: (r.root, r.depth) for r in forest_closure(nodes, edges, rounds=7).collect()}
    assert out[0] == (0, 0)
    assert out[100] == (0, 100)
    assert out[37] == (0, 37)


def test_forest_closure_multi_root_forest(spark):
    from osm_changesets_to_parquet_spark.operators.closure import forest_closure

    nodes = spark.createDataFrame([(i,) for i in [1, 2, 10, 11, 20]], ["node"])
    edges = spark.createDataFrame(
        [(10, 1), (11, 10), (20, 2)], ["child", "parent"]
    )
    out = {r.node: (r.root, r.depth) for r in forest_closure(nodes, edges, rounds=4).collect()}
    assert out == {1: (1, 0), 2: (2, 0), 10: (1, 1), 11: (1, 2), 20: (2, 1)}


def test_forest_closure_missing_parent_treated_as_root(spark):
    from osm_changesets_to_parquet_spark.operators.closure import forest_closure

    # node 11 -> 10 -> 99, but 99 is absent from `nodes`: the walk must
    # surface (node, 99, depth) rather than silently dropping the rows
    # (the pre-fix inner join lost them on the first hop)
    nodes = spark.createDataFrame([(i,) for i in [1, 10, 11]], ["node"])
    edges = spark.createDataFrame([(10, 99), (11, 10)], ["child", "parent"])
    out = {r.node: (r.root, r.depth) for r in forest_closure(nodes, edges, rounds=4).collect()}
    assert out == {1: (1, 0), 10: (99, 1), 11: (99, 2)}


def test_forest_closure_rejects_bad_rounds(spark):
    import pytest as _pytest

    from osm_changesets_to_parquet_spark.operators.closure import forest_closure

    df = spark.createDataFrame([(1,)], ["node"])
    with _pytest.raises(ValueError):
        forest_closure(df, df.selectExpr("node AS child", "node AS parent"), rounds=0)


def test_forest_closure_tolerates_self_edges(spark):
    from osm_changesets_to_parquet_spark.operators.closure import forest_closure

    # a self-edge (child == parent) must be treated as "root", not as a
    # cycle that inflates depth every round
    nodes = spark.createDataFrame([(1,), (2,)], ["node"])
    edges = spark.createDataFrame([(1, 1), (2, 1)], ["child", "parent"])
    out = {r.node: (r.root, r.depth) for r in forest_closure(nodes, edges, rounds=3).collect()}
    assert out == {1: (1, 0), 2: (1, 1)}


def test_interval_overlap_equals_brute_force(spark):
    import random

    from osm_changesets_to_parquet_spark.operators.intervals import (
        interval_overlap_pairs,
    )

    rng = random.Random(7)
    rows = [
        (i, s, s + rng.randint(1, 40))
        for i, s in ((i, rng.randint(0, 300)) for i in range(120))
    ]
    df = spark.createDataFrame(rows, ["id", "s", "e"])
    got = {
        (r.id_a, r.id_b, r.overlap)
        for r in interval_overlap_pairs(df, "id", "s", "e", bucket_width=13).collect()
    }
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, sa, ea), (ib, sb, eb) = rows[i], rows[j]
            ov = min(ea, eb) - max(sa, sb)
            if ov > 0:
                a, b = sorted((ia, ib))
                want.add((a, b, ov))
    assert got == want and got


def test_interval_overlap_guards(spark):
    import pytest as _pytest

    from osm_changesets_to_parquet_spark.operators.intervals import (
        interval_overlap_pairs,
    )

    df = spark.createDataFrame([(1, 0, 5)], ["id", "s", "e"])
    with _pytest.raises(ValueError):
        interval_overlap_pairs(df, "id", "s", "e", bucket_width=0)
    # empty/degenerate intervals (e <= s) are dropped, touching
    # intervals ([0,5) vs [5,9)) do not overlap
    df2 = spark.createDataFrame([(1, 0, 5), (2, 5, 9), (3, 7, 7)], ["id", "s", "e"])
    assert interval_overlap_pairs(df2, "id", "s", "e", bucket_width=4).count() == 0


def test_forest_closure_raises_on_unconverged_budget(spark):
    import pytest as _pytest

    from osm_changesets_to_parquet_spark.operators.closure import forest_closure

    # a 12-deep path cannot close in 2 doubling rounds (2^2 = 4 < 12):
    # the exhausted budget must raise, never return non-root pointers
    # silently (ADVICE r13 — mirror k_core's non-convergence error)
    nodes = spark.createDataFrame([(i,) for i in range(13)], ["node"])
    edges = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 13)], ["child", "parent"]
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        forest_closure(nodes, edges, rounds=2).collect()
    # a budget of exactly ceil(log2(12)) = 4 moving rounds converges:
    # the +1 confirming round must not burn the budget (the guard fires
    # only on TRUE non-convergence)
    out = {
        r.node: (r.root, r.depth)
        for r in forest_closure(nodes, edges, rounds=4).collect()
    }
    assert out[12] == (0, 12)
