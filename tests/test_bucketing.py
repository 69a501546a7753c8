"""Bucketed co-located join: the 100 TB shuffle-elimination proof.

A fact-fact join too big to broadcast normally shuffles BOTH sides on
the key.  Writing both tables bucketed (same column, same bucket count)
pre-partitions them at rest, so the join plans with ZERO exchanges —
the standard technique for repeatedly-joined 100 TB tables.  These
tests prove the engine's write path produces bucket-aligned tables and
that Catalyst actually elides the shuffles (and the sort, when the
buckets are also sorted).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.catalog import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # warehouse dir is a static conf, pointed at a temp dir in conftest
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    for name in ("orders_b", "customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        o.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        c.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable("customer_b")
    )
    yield
    for name in ("orders_b", "customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_elides_both_shuffles(spark, sf_dir, bucketed):
    ob, cb = spark.table("orders_b"), spark.table("customer_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = ob.join(cb, ob.o_custkey == cb.c_custkey).groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the join itself must consume bucketed scans directly: the only
        # allowed exchange is the post-join aggregation shuffle
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_custkey" not in plan
        assert "Exchange hashpartitioning(c_custkey" not in plan
        assert "SelectedBucketsCount" in join_part or "Bucketed: true" in join_part
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    ob, cb = spark.table("orders_b"), spark.table("customer_b")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    got = sorted(
        ob.join(cb, ob.o_custkey == cb.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    want = sorted(
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    assert got == want


def test_bucketed_groupby_elides_shuffle(spark, sf_dir, bucketed):
    # an aggregation keyed on the bucket column needs no exchange either
    ob = spark.table("orders_b")
    agg = ob.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(o_custkey" not in plan


def test_q111_query_is_idempotent_across_calls(spark, sf_dir):
    # regression: the first spelling used managed tables — the warehouse
    # dir outlived the in-memory catalog, so a SECOND session hit
    # LOCATION_ALREADY_EXISTS.  The external-path spelling must be
    # re-runnable (the driver and sweeps call query fns repeatedly).
    from osm_changesets_to_parquet_spark.queries import queries

    fn = queries()["q111_bucketed_join"]
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b and a
