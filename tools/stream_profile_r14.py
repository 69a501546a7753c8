#!/usr/bin/env python
"""Per-micro-batch durationMs breakdown for the streaming heavies
(s6/s16/s19...): attaches a StreamingQueryListener, runs the named
streaming queries once, and prints each batch's durationMs +
stateOperators summary.

Usage: python tools/stream_profile_r14.py s6_stateful_running_agg ...
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

import bench  # noqa: E402
from osm_changesets_to_parquet_spark import queries as Q  # noqa: E402
from osm_changesets_to_parquet_spark.session import get_spark  # noqa: E402


class ProgressDump(StreamingQueryListener):
    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        d = json.loads(p.json)
        so = d.get("stateOperators") or []
        parts = [
            "{}: updates={}ms commit={}ms rows={}".format(
                s.get("operatorName", "?"),
                s.get("allUpdatesTimeMs"),
                s.get("commitTimeMs"),
                s.get("numRowsTotal"),
            )
            for s in so
        ]
        print(
            "  batch {}: rows={} durationMs={} state=[{}]".format(
                d.get("batchId"), d.get("numInputRows"),
                d.get("durationMs"), ", ".join(parts)
            ),
            flush=True,
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    nshuf = bench._size_aware_shuffle_partitions(sf_dir, cpus)
    spark = get_spark(
        "stream-profile-r14", extra_conf={"spark.sql.shuffle.partitions": str(nshuf)}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(ProgressDump())
    qs = Q.queries()
    for name in names:
        for run in ("cold", "warm"):
            print(f"{name} [{run}]:", flush=True)
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            print(f"{name} [{run}] total {time.perf_counter() - t0:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
