#!/usr/bin/env python
"""Interleaved A/B of the three fan_out call sites VERDICT r13 flagged
(q17_range_join, q38_token_freq, q40_tfidf).

Both arms of each pair are built EXPLICITLY in this script (no
monkeypatching — the r13 lesson: consumers bind fan_out at import
time), executed with the noop sink, and the arms ALTERNATE inside one
session so a contention wave hits both equally.  Reports min + median
per arm plus bracketing range-sum anchors.

Usage: python tools/ab_fanout_r14.py [rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from osm_changesets_to_parquet_spark.catalog import fan_out, load_table  # noqa: E402
from osm_changesets_to_parquet_spark.session import get_spark  # noqa: E402


def q17_df(spark, sf_dir, fan: bool):
    ev = load_table(spark, sf_dir, "events")
    e1 = (fan_out(ev, "event_id") if fan else ev).select(
        "user_id", "event_type", F.col("ts_us").alias("t1")
    )
    e2 = ev.select(F.col("user_id").alias("u2"), F.col("ts_us").alias("t2"))
    return (
        e1.join(
            e2,
            (e1.user_id == e2.u2) & (e2.t2 > e1.t1) & (e2.t2 <= e1.t1 + 300_000_000),
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("event_type")
    )


def _tokens(docs, keep):
    return docs.select(
        *keep, F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    )


def q38_df(spark, sf_dir, fan: bool):
    docs = load_table(spark, sf_dir, "documents")
    src = fan_out(docs, "doc_id") if fan else docs
    t = _tokens(src, [])
    return (
        t.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(20)
    )


def q40_df(spark, sf_dir, fan: bool):
    docs = load_table(spark, sf_dir, "documents")
    src = fan_out(docs, "doc_id") if fan else docs
    t = _tokens(src, ["doc_id", "lang"])
    tf = t.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = t.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(F.col("score").desc(), F.col("token").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 5)
        .select("lang", "token", "score")
        .orderBy("lang", F.col("score").desc(), "token")
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    nshuf = bench._size_aware_shuffle_partitions(sf_dir, cpus)
    spark = get_spark(
        "ab-fanout-r14", extra_conf={"spark.sql.shuffle.partitions": str(nshuf)}
    )
    spark.sparkContext.setLogLevel("ERROR")

    builders = {"q17": q17_df, "q38": q38_df, "q40": q40_df}
    # warm-up both arms of everything
    for name, b in builders.items():
        for fan in (True, False):
            b(spark, sf_dir, fan).write.format("noop").mode("overwrite").save()

    a_pre = bench._measure_anchor(spark)
    results: dict[str, dict[bool, list[float]]] = {
        n: {True: [], False: []} for n in builders
    }
    for r in range(rounds):
        for name, b in builders.items():
            for fan in (True, False):
                spark.sparkContext.setJobDescription(
                    f"ab {name} fan={fan} round={r}"
                )
                t0 = time.perf_counter()
                b(spark, sf_dir, fan).write.format("noop").mode("overwrite").save()
                results[name][fan].append(time.perf_counter() - t0)
    a_post = bench._measure_anchor(spark)

    print(f"anchors pre={a_pre:.3f} post={a_post:.3f} (clean max 0.087)")
    for name in builders:
        for fan in (True, False):
            xs = results[name][fan]
            print(
                f"{name} fan={fan}: min {min(xs):.3f} med {statistics.median(xs):.3f}"
                f"  all {[round(x, 3) for x in xs]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
