#!/usr/bin/env python
"""Time a named set of registry queries (cold + warm min-of-3, noop
sink) with bracketing range-sum anchors.  For the r14 heavies
(q323/q308/s6/s16/s19 etc.) before/after each change.

Usage: python tools/profile_r14.py name [name ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402
from osm_changesets_to_parquet_spark import queries as Q  # noqa: E402
from osm_changesets_to_parquet_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_r14.py name [name ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    nshuf = bench._size_aware_shuffle_partitions(sf_dir, cpus)
    spark = get_spark(
        "profile-r14", extra_conf={"spark.sql.shuffle.partitions": str(nshuf)}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = Q.queries()
    # touch the tables once so cold numbers measure the query, not
    # footer IO
    from osm_changesets_to_parquet_spark.catalog import load_all

    for df in load_all(spark, sf_dir).values():
        df.count()

    a_pre = bench._measure_anchor(spark)
    print(f"anchor pre={a_pre:.3f} (clean max 0.087)", flush=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"profile {name} cold")
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        warms = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"profile {name} warm{i}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            warms.append(time.perf_counter() - t0)
        print(
            f"{name}: cold {cold:.3f}  warm-min {min(warms):.3f}"
            f"  warms {[round(x, 3) for x in warms]}",
            flush=True,
        )
    a_post = bench._measure_anchor(spark)
    print(f"anchor post={a_post:.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
