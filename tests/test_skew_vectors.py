"""Salted-join parity + k-means iterations + int8 quantization bounds."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.catalog import load_table
from osm_changesets_to_parquet_spark.operators.similarity import (
    dequantize_int8,
    ivf_build,
    normalize_vectors,
    quantize_int8,
)
from osm_changesets_to_parquet_spark.operators.skew import salted_join


def _dim(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("user_id").distinct().withColumn("grp", F.col("user_id") % 10)
    )


def test_salted_join_inner_parity(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dim = _dim(spark, sf_dir)
    plain = ev.join(dim, ["user_id"], "inner")
    salted = salted_join(ev, dim, ["user_id"], n_salts=8, how="inner")
    assert salted.columns == plain.columns
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_left_parity_with_missing_keys(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    # dimension missing half the keys => left join emits null rows
    dim = _dim(spark, sf_dir).where(F.col("user_id") % 2 == 0)
    plain = ev.join(dim, ["user_id"], "left")
    salted = salted_join(ev, dim, ["user_id"], n_salts=4, how="left")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_spreads_hot_key(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dim = _dim(spark, sf_dir)
    salted = salted_join(ev, dim, ["user_id"], n_salts=8, how="inner")
    # the physical join key must include the salt column
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_salted_join_auto_parity_and_counts(spark, sf_dir):
    from osm_changesets_to_parquet_spark.operators.skew import auto_salt_count

    # uniform profile: each key once => no salting needed
    uni = spark.range(1000).select(F.col("id").alias("k"), F.lit(1).alias("x"))
    assert auto_salt_count(uni, ["k"], num_partitions=8) == 1
    # one key owns 90% of rows => hottest key must split across tasks
    hot = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("x"),
    )
    n = auto_salt_count(hot, ["k"], num_partitions=8)
    assert n == 8  # ceil(900 / (1000/8)) = 8, clamped at parallelism
    dim = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") % 5).alias("grp"))
    plain = hot.join(dim, ["k"], "inner")
    salted = salted_join(hot, dim, ["k"], n_salts="auto", how="inner")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_rejects_bad_n_salts(spark):
    import pytest as _pytest

    df = spark.range(4).select(F.col("id").alias("k"))
    with _pytest.raises(ValueError):
        salted_join(df, df, ["k"], n_salts=0)
    with _pytest.raises(ValueError):
        salted_join(df, df, ["k"], n_salts="many")


def test_kmeans_iterations_converge(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    _, c1 = ivf_build(emb, n_cells=8, n_iters=1)
    assigned3, c3 = ivf_build(emb, n_cells=8, n_iters=3)
    assert len(c3) == 8 and len(c3[0]) == len(c1[0])
    # all vectors assigned to valid cells after multiple Lloyd steps
    assert assigned3.where((F.col("cell") < 0) | (F.col("cell") >= 8)).count() == 0
    # more iterations must not produce identical centroids to iter 1
    # unless already converged; either way the build is deterministic
    _, c3b = ivf_build(emb, n_cells=8, n_iters=3)
    assert c3 == c3b


def test_quantize_roundtrip_error_bound(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    qd = dequantize_int8(quantize_int8(emb, "embedding"), out_col="deq")
    rows = qd.select("embedding", "deq", "scale", "q").collect()
    for r in rows:
        for orig, back in zip(r.embedding, r.deq):
            assert abs(float(orig) - back) <= r.scale / 2 + 1e-9
        assert all(-127 <= int(q) <= 127 for q in r.q)


def test_normalize_unit_norm(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    nv = normalize_vectors(emb, "embedding", "nv").select("nv").collect()
    for r in nv:
        norm = math.sqrt(sum(float(x) * float(x) for x in r.nv))
        assert abs(norm - 1.0) < 1e-9 or norm == 0.0


def test_scd2_versions_and_current_flags(spark, sf_dir):
    from osm_changesets_to_parquet_spark.operators.merge import scd2_apply

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    # seed history: each user's first event as the open current version
    first = (
        ev.groupBy("user_id")
        .agg(F.min("ts_us").alias("ts_us"))
        .join(ev, ["user_id", "ts_us"])
        .dropDuplicates(["user_id"])
        .withColumn("valid_to_us", F.lit(None).cast("long"))
        .withColumn("is_current", F.lit(True))
    )
    # changes: each user's latest event
    last = (
        ev.groupBy("user_id")
        .agg(F.max("ts_us").alias("ts_us"))
        .join(ev, ["user_id", "ts_us"])
        .dropDuplicates(["user_id"])
    )
    out = scd2_apply(first, last, "user_id", "ts_us")
    per_user = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(F.col("is_current").cast("int")).alias("n_current"),
        F.sum(F.col("valid_to_us").isNull().cast("int")).alias("n_open"),
    )
    # exactly one current open version per user, all versions closed
    # by their successor
    bad = per_user.where(
        (F.col("n_current") != 1) | (F.col("n_open") != 1)
    ).count()
    assert bad == 0


def test_semdedup_within_cell_matches_brute_force(spark, sf_dir):
    from osm_changesets_to_parquet_spark.operators.similarity import (
        cosine_similarity_col,
        ivf_build,
        semdedup,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    out = {r.vec_id: r.keep for r in semdedup(emb, threshold=0.999).collect()}
    assert len(out) == emb.count()
    # brute-force reference WITHIN the same cell assignment: a vector is
    # dropped iff some cell-mate connects to an earlier min-label
    assigned, _ = ivf_build(emb, n_cells=16)
    a = assigned.select("cell", F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = assigned.select("cell", F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    sim = F.round(cosine_similarity_col(F.col("va"), F.col("vb")), 4)
    pairs = [
        (r.ia, r.ib)
        for r in a.join(b, "cell").where(F.col("ia") < F.col("ib"))
        .select("ia", "ib", sim.alias("s")).where(F.col("s") >= 0.999).collect()
    ]
    import itertools

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for x, y in pairs:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    groups = {}
    for x in list(parent):
        groups.setdefault(find(x), []).append(x)
    expect_drop = set()
    for members in groups.values():
        expect_drop.update(set(members) - {min(members)})
    got_drop = {i for i, k in out.items() if not k}
    assert got_drop == expect_drop
