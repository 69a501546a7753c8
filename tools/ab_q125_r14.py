#!/usr/bin/env python
"""Interleaved A/B of q125 jaccard_prefix_pairs VERIFICATION spellings:

  arm "inrow"  — per-candidate in-row size(array_intersect(ha, hb))
                 (the r14 respell, the q308/q218 discipline)
  arm "explode" — the r13 spelling: fan candidates over side-a's
                 shingles, equi-join side-b's, groupBy count

Both arms are built EXPLICITLY here (no monkeypatching); arms alternate
inside one session so a contention wave hits both equally.  Bracketing
range-sum anchors are printed.

Usage: python tools/ab_q125_r14.py [rounds]
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
from pyspark.sql.window import Window  # noqa: E402

import bench  # noqa: E402
from osm_changesets_to_parquet_spark.catalog import load_table  # noqa: E402
from osm_changesets_to_parquet_spark.operators.dedup import shingles  # noqa: E402
from osm_changesets_to_parquet_spark.operators.iterutils import (  # noqa: E402
    truncate_lineage,
)
from osm_changesets_to_parquet_spark.session import get_spark  # noqa: E402

THRESHOLD = 0.6
N = 3


def _common(docs):
    sets = truncate_lineage(
        shingles(docs, "text", N).select(
            F.col("doc_id").alias("id"),
            F.array_distinct("shingle_hashes").alias("hs"),
        )
    )
    ex = sets.select("id", F.explode("hs").alias("h"))
    t_gen = max(0.0, THRESHOLD - 0.001)
    freq = ex.groupBy("h").agg(F.count(F.lit(1)).alias("f"))
    w = Window.partitionBy("id").orderBy("f", "h")
    pos = ex.join(freq, "h").select("id", "h", F.row_number().over(w).alias("r"))
    sizes = sets.select("id", F.size("hs").cast("long").alias("sz"))
    pref = (
        pos.join(sizes, "id")
        .where(F.col("r") <= F.col("sz") - F.ceil(F.lit(t_gen) * F.col("sz")) + F.lit(1))
        .select("id", "h")
    )
    cand = (
        pref.select(F.col("id").alias("id_a"), "h")
        .join(pref.select(F.col("id").alias("id_b"), "h"), "h")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return sets, ex, sizes, cand


def build_inrow(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sets, _ex, _sizes, cand = _common(docs)
    sa = sets.select(F.col("id").alias("id_a"), F.col("hs").alias("ha"))
    sb = sets.select(F.col("id").alias("id_b"), F.col("hs").alias("hb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ha", "hb")).cast("long").alias("ni"),
            F.size("ha").cast("long").alias("na"),
            F.size("hb").cast("long").alias("nb"),
        )
        .withColumn("jac", F.round(F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni")), 4))
        .where(F.col("jac") >= F.lit(THRESHOLD))
        .select("id_a", "id_b", "jac")
        .orderBy("id_a", "id_b")
    )


def build_explode(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    _sets, ex, sizes, cand = _common(docs)
    inter = (
        cand.join(ex.select(F.col("id").alias("id_a"), "h"), "id_a")
        .join(ex.select(F.col("id").alias("id_b"), "h"), ["id_b", "h"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jac", F.round(F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni")), 4))
        .where(F.col("jac") >= F.lit(THRESHOLD))
        .select("id_a", "id_b", "jac")
        .orderBy("id_a", "id_b")
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    nshuf = bench._size_aware_shuffle_partitions(sf_dir, cpus)
    spark = get_spark("ab-q125-r14", extra_conf={"spark.sql.shuffle.partitions": str(nshuf)})
    spark.sparkContext.setLogLevel("ERROR")

    builders = {"inrow": build_inrow, "explode": build_explode}
    for name, b in builders.items():
        b(spark, sf_dir).write.format("noop").mode("overwrite").save()

    a_pre = bench._measure_anchor(spark)
    results = {n: [] for n in builders}
    for r in range(rounds):
        for name, b in builders.items():
            spark.sparkContext.setJobDescription(f"ab q125 {name} round={r}")
            t0 = time.perf_counter()
            b(spark, sf_dir).write.format("noop").mode("overwrite").save()
            results[name].append(time.perf_counter() - t0)
    a_post = bench._measure_anchor(spark)

    print(f"anchors pre={a_pre:.3f} post={a_post:.3f}")
    for name, xs in results.items():
        print(
            f"{name}: min={min(xs):.3f} med={statistics.median(xs):.3f} "
            f"all={[round(x, 3) for x in xs]}"
        )


if __name__ == "__main__":
    main()
