#!/usr/bin/env python
"""Interleaved A/B of q272 greedy-set-cover covered-set spellings:

  arm "derive"  — covered re-derived per round from the checkpointed
                  dg (picked docs' grams), broadcast to the anti join
  arm "chain"   — the r13 spelling: covered = distinct-union chain,
                  truncate_lineage per round

Arms alternate inside one session; bracketing anchors printed.
Usage: python tools/ab_q272_r14.py [rounds]
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
from osm_changesets_to_parquet_spark.catalog import load_table  # noqa: E402
from osm_changesets_to_parquet_spark.operators.iterutils import (  # noqa: E402
    truncate_lineage,
)
from osm_changesets_to_parquet_spark.session import get_spark  # noqa: E402

K = 5


def _dg(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    dg = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(split(text, ' ')) - 1), "
                    "i -> concat(split(text, ' ')[i - 1], ' ', "
                    "split(text, ' ')[i]))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    return truncate_lineage(dg)


def run_derive(spark, sf_dir):
    dg = _dg(spark, sf_dir)
    universe = dg.select("g").distinct().count()
    picked, rows, cum = [], [], 0
    for r in range(1, K + 1):
        cand = dg
        if picked:
            covered = F.broadcast(dg.where(F.col("doc_id").isin(picked)).select("g"))
            cand = cand.where(~F.col("doc_id").isin(picked)).join(covered, "g", "anti")
        top = (
            cand.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("new_g"))
            .orderBy(F.col("new_g").desc(), "doc_id")
            .limit(1)
            .collect()
        )
        if not top:
            break
        doc_id, new_g = int(top[0].doc_id), int(top[0].new_g)
        picked.append(doc_id)
        cum += new_g
        rows.append((r, doc_id, new_g, round(cum / universe, 4)))
    return rows


def run_chain(spark, sf_dir):
    dg = _dg(spark, sf_dir)
    universe = dg.select("g").distinct().count()
    covered, picked, rows, cum = None, [], [], 0
    for r in range(1, K + 1):
        cand = dg
        if picked:
            cand = cand.where(~F.col("doc_id").isin(picked))
        if covered is not None:
            cand = cand.join(covered, "g", "anti")
        top = (
            cand.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("new_g"))
            .orderBy(F.col("new_g").desc(), "doc_id")
            .limit(1)
            .collect()
        )
        if not top:
            break
        doc_id, new_g = int(top[0].doc_id), int(top[0].new_g)
        picked.append(doc_id)
        cum += new_g
        rows.append((r, doc_id, new_g, round(cum / universe, 4)))
        new_cov = dg.where(F.col("doc_id") == doc_id).select("g")
        covered = new_cov if covered is None else covered.unionByName(new_cov).distinct()
        covered = truncate_lineage(covered)
    return rows


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    nshuf = bench._size_aware_shuffle_partitions(sf_dir, cpus)
    spark = get_spark("ab-q272-r14", extra_conf={"spark.sql.shuffle.partitions": str(nshuf)})
    spark.sparkContext.setLogLevel("ERROR")

    arms = {"derive": run_derive, "chain": run_chain}
    outs = {}
    for name, fn in arms.items():
        outs[name] = fn(spark, sf_dir)
    assert outs["derive"] == outs["chain"], (outs["derive"], outs["chain"])
    print("arm outputs identical:", outs["derive"])

    a_pre = bench._measure_anchor(spark)
    results = {n: [] for n in arms}
    for r in range(rounds):
        for name, fn in arms.items():
            spark.sparkContext.setJobDescription(f"ab q272 {name} round={r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir)
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
