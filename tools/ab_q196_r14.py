#!/usr/bin/env python
"""Interleaved A/B of q196's conditional-aggregate pass with and
without a fan_out of the events scan (the per-row work is ~32x10
integer ops — the heavy-per-row case where the exchange can pay).

Usage: python tools/ab_q196_r14.py [rounds]
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
from osm_changesets_to_parquet_spark.operators.quality import ID_FOLD, KNUTH  # noqa: E402
from osm_changesets_to_parquet_spark.queries.analytics_metrics import (  # noqa: E402
    _Q196_CDF,
    _Q196_R,
)
from osm_changesets_to_parquet_spark.session import get_spark  # noqa: E402


def build(spark, sf_dir, fan: bool):
    ev = load_table(spark, sf_dir, "events")
    if fan:
        ev = fan_out(ev, "event_id")
    e = ev.select(
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    hb = (F.col("event_id") % F.lit(ID_FOLD)) * F.lit(KNUTH)

    def _wt(r: int):
        h = ((hb + F.lit(r * 9973)) % F.lit(ID_FOLD)) % F.lit(10000)
        w = None
        for t in _Q196_CDF:
            c = (h >= F.lit(t)).cast("int")
            w = c if w is None else w + c
        return w

    aggs = []
    for r in range(1, _Q196_R + 1):
        w = _wt(r)
        aggs.append(F.sum(w * F.col("cents")).alias(f"s{r}"))
        aggs.append(F.sum(w).alias(f"w{r}"))
    aggs.append(F.sum("cents").alias("sc"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    one = e.agg(*aggs)
    rep_means = F.array(
        *[
            F.col(f"s{r}") / F.col(f"w{r}").cast("double") / F.lit(100.0)
            for r in range(1, _Q196_R + 1)
        ]
    )
    rep = one.select(
        F.round(F.col("sc") / F.col("n").cast("double") / F.lit(100.0), 6).alias(
            "mean_value"
        ),
        F.explode(rep_means).alias("rep_mean"),
    )
    return (
        rep.groupBy("mean_value")
        .agg(F.round(F.stddev("rep_mean"), 6).alias("bootstrap_se"))
        .select(
            F.lit(_Q196_R).cast("long").alias("n_replicates"),
            "mean_value",
            "bootstrap_se",
        )
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    nshuf = bench._size_aware_shuffle_partitions(sf_dir, cpus)
    spark = get_spark("ab-q196-r14", extra_conf={"spark.sql.shuffle.partitions": str(nshuf)})
    spark.sparkContext.setLogLevel("ERROR")

    for fan in (True, False):
        build(spark, sf_dir, fan).write.format("noop").mode("overwrite").save()

    a_pre = bench._measure_anchor(spark)
    results = {True: [], False: []}
    for r in range(rounds):
        for fan in (True, False):
            spark.sparkContext.setJobDescription(f"ab q196 fan={fan} round={r}")
            t0 = time.perf_counter()
            build(spark, sf_dir, fan).write.format("noop").mode("overwrite").save()
            results[fan].append(time.perf_counter() - t0)
    a_post = bench._measure_anchor(spark)

    print(f"anchors pre={a_pre:.3f} post={a_post:.3f}")
    for fan, xs in results.items():
        print(
            f"fan={fan}: min={min(xs):.3f} med={statistics.median(xs):.3f} "
            f"all={[round(x, 3) for x in xs]}"
        )


if __name__ == "__main__":
    main()
