#!/usr/bin/env python
"""Capture .explain("formatted") output for declared queries.

Usage:
  python tools/capture_plans.py <suffix> [name ...]

Writes plans/r13/<name>_<suffix>.txt for each query name (default: the
tier-1 bench set).  Runs at $SPARK_GRAFT_SF_DIR (default sf0.1) with the
same size-aware shuffle-partition rule bench.py uses, so the captured
plans are the plans the bench actually executes.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from osm_changesets_to_parquet_spark import queries as Q  # noqa: E402
from osm_changesets_to_parquet_spark.session import get_spark  # noqa: E402


def explain_formatted(df) -> str:
    jdf = df._jdf
    return jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    nshuf = bench._size_aware_shuffle_partitions(sf_dir, cpus)
    names = sys.argv[2:] or bench.BENCH_QUERIES
    out_dir = Path(REPO) / "plans" / os.environ.get("SPARK_GRAFT_PLANS_DIR", "r14")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(
        "plan-capture", extra_conf={"spark.sql.shuffle.partitions": str(nshuf)}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = Q.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = explain_formatted(df)
        except Exception as e:  # streaming jobs EXECUTE on build; record that
            txt = f"<plan capture failed: {type(e).__name__}: {e}>"
        (out_dir / f"{name}_{suffix}.txt").write_text(txt + "\n")
        print(f"captured {name} ({len(txt)} chars)", file=sys.stderr, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
