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
import datetime
import json
import sys
import time
from pathlib import Path


def write_index(
    output_path: str,
    rows: int,
    source_last_modified: str | None = None,
    public_url_base: str | None = None,
    generated_at: str | None = None,
) -> dict:
    """Publish-step metadata: an ``index.json`` next to the output.

    Vendor-neutral analog of the reference workflow's index generation
    (.github/workflows/process-changesets-r2.yml:176-222: head-object
    size, public URL, suggested DuckDB query, 1h cache TTL) — same
    fields, no cloud-vendor API: sizes come from the filesystem, the URL
    base is caller-supplied (an S3/R2/HTTP prefix in production).
    """
    out = Path(output_path)
    files = sorted(p for p in out.rglob("*") if p.is_file()) if out.is_dir() else [out]
    total = sum(p.stat().st_size for p in files)
    name = out.name
    url = f"{public_url_base.rstrip('/')}/{name}" if public_url_base else str(out)
    index = {
        "dataset": name,
        "url": url,
        "size_bytes": total,
        "n_files": len(files),
        "rows": rows,
        "source_last_modified": source_last_modified,
        "generated_at": generated_at
        or datetime.datetime.now(datetime.timezone.utc).isoformat(),
        # the reference advertises exactly this usage (yml:207)
        "example_query": f"SELECT COUNT(*) FROM '{url}'",
    }
    index_path = out.parent / "index.json"
    index_path.write_text(json.dumps(index, indent=2) + "\n")
    return index


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
    p.add_argument(
        "--publish-index",
        action="store_true",
        help="write index.json (size/url/rows metadata) next to the output",
    )
    p.add_argument(
        "--public-url-base",
        default=None,
        help="URL prefix recorded in index.json (e.g. an object-store public base)",
    )
    p.add_argument(
        "--single-file",
        action="store_true",
        help="publish --output as ONE .parquet file (the reference's exact "
        "artifact, src/main.rs:416-425) instead of a parquet directory",
    )
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

    # flag validation happens BEFORE any SparkSession exists, so a usage
    # error can't leak a running JVM (ADVICE r07)
    if args.single_file and args.partition_by_day:
        raise SystemExit("--single-file and --partition-by-day are exclusive")

    from osm_changesets_to_parquet_spark.session import get_spark
    from osm_changesets_to_parquet_spark.sources.changesets import convert

    own_session = spark is None
    if own_session:
        spark = get_spark("changesets-to-parquet", master=args.master)
    t0 = time.perf_counter()
    try:
        convert_out = (
            args.output + ".__dir" if args.single_file else args.output
        )
        rows = convert(
            spark,
            args.input,
            convert_out,
            batch_size=args.batch_size,
            continue_on_error=args.continue_on_error,
            partition_by_day=args.partition_by_day,
        )
        if args.single_file:
            # the reference writes exactly ONE file (src/main.rs:416-425);
            # publish the directory as that artifact and drop the scratch
            from osm_changesets_to_parquet_spark.operators.layout import (
                publish_single_file,
            )

            publish_single_file(spark, convert_out, args.output)
            jvm = spark._jvm
            jdir = jvm.org.apache.hadoop.fs.Path(convert_out)
            jdir.getFileSystem(spark._jsc.hadoopConfiguration()).delete(jdir, True)
    except BaseException:
        # a convert/publish/cleanup failure must not strand an
        # own_session JVM either (ADVICE r07); success-path stop stays
        # at the end so the index write can use the live session's fs
        if own_session:
            spark.stop()
        raise
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {"status": "ok", "rows": rows, "seconds": round(dt, 3), "output": args.output}
        )
    )
    if args.publish_index:
        write_index(
            args.output,
            rows,
            source_last_modified=args.source_last_modified,
            public_url_base=args.public_url_base,
        )
    if args.watermark_file and args.source_last_modified:
        Path(args.watermark_file).write_text(args.source_last_modified.strip() + "\n")
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
