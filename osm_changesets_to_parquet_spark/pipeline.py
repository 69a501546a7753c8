"""CLI pipeline: the reference's entry point + orchestration, Spark-first.

Mirrors the Rust CLI's flags (reference src/main.rs:20-38):
  --input --output --batch-size --continue-on-error
plus the production workflow's incremental trigger (reference
.github/workflows/process-changesets-r2.yml:35-65: skip the run when the
source's Last-Modified matches the committed watermark file) as
--watermark-file / --source-last-modified.

Note the reference's workflow has a naming defect (writes
`changesets-changesets.parquet`, uploads `changesets-latest.parquet`,
process-changesets-r2.yml:116 vs :122) — one consistent --output here.

Usage:
  python -m osm_changesets_to_parquet_spark.pipeline \
      --input changesets-latest.osm.bz2 --output changesets.parquet
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="OSM changeset XML -> Parquet (Spark)")
    p.add_argument("--input", required=True, help="changeset XML path (.xml or .bz2)")
    p.add_argument("--output", required=True, help="output parquet path")
    p.add_argument(
        "--batch-size",
        type=int,
        default=100_000,
        help="max records per output file (reference --batch-size analog)",
    )
    p.add_argument(
        "--continue-on-error",
        action="store_true",
        help="salvage parseable rows instead of aborting on malformed XML",
    )
    p.add_argument(
        "--partition-by-day",
        action="store_true",
        help="partition output by created_at day (partition-pruned queries)",
    )
    p.add_argument(
        "--watermark-file",
        default=None,
        help="skip conversion when --source-last-modified matches this file's content",
    )
    p.add_argument("--source-last-modified", default=None)
    p.add_argument("--master", default=None, help="spark master (default local[N])")
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = build_parser().parse_args(argv)

    # incremental trigger (port of the workflow's Last-Modified check)
    if args.watermark_file and args.source_last_modified:
        wm = Path(args.watermark_file)
        if wm.exists() and wm.read_text().strip() == args.source_last_modified.strip():
            print(
                json.dumps({"status": "skipped", "reason": "source unchanged"}),
                file=sys.stderr,
            )
            return 0

    from osm_changesets_to_parquet_spark.session import get_spark
    from osm_changesets_to_parquet_spark.sources.changesets import convert

    own_session = spark is None
    if own_session:
        spark = get_spark("changesets-to-parquet", master=args.master)
    t0 = time.perf_counter()
    rows = convert(
        spark,
        args.input,
        args.output,
        batch_size=args.batch_size,
        continue_on_error=args.continue_on_error,
        partition_by_day=args.partition_by_day,
    )
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {"status": "ok", "rows": rows, "seconds": round(dt, 3), "output": args.output}
        )
    )
    if args.watermark_file and args.source_last_modified:
        Path(args.watermark_file).write_text(args.source_last_modified.strip() + "\n")
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
