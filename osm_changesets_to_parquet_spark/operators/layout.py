"""Data-layout operators: Z-order (Morton) clustering for multi-column
scan locality.

Why this matters at 100 TB: min/max zone maps (parquet row-group stats,
file-level pruning) only prune on columns the data is *sorted* by.  A
single-column sort gives perfect pruning on one predicate column and
none on the second; interleaving the bits of both columns (the Z-order
curve) gives bounded min/max ranges on BOTH columns in every file, so
2-D predicates prune everywhere.  This is the same trick Delta/Iceberg
`OPTIMIZE ZORDER BY` applies; here it is spelled as plain DataFrame
expressions + ``repartitionByRange`` so any parquet sink gets it.

Everything is deterministic integer arithmetic (scale to a fixed bit
budget, interleave, range-partition on the z-value), so the layout is
reproducible and ORACLE-CHECKABLE — ``zvalue_sql`` emits the identical
arithmetic as ANSI SQL from the same constants.

Scale shape: one stats pass (min/max per column — an O(cols) scalar
aggregate), one range exchange on the z-value, then a local sort inside
each partition.  No global single-task sort: ``repartitionByRange``
samples boundaries and every partition sorts independently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave_terms(cols: list[str], bits: int) -> list[tuple[str, int, int]]:
    """(col, source_bit, target_bit) triples for the Morton interleave."""
    n = len(cols)
    return [
        (c, b, b * n + i)
        for b in range(bits)
        for i, c in enumerate(cols)
    ]


def _check_bit_budget(cols: list[str], bits: int) -> None:
    # target bit indices reach len(cols)*bits - 1; past 61 the summed
    # z-value can overflow into the long sign bit, silently producing
    # negative z-values and a non-monotone range partitioning.
    if len(cols) * bits > 62:
        raise ValueError(
            f"z-order bit budget overflow: {len(cols)} cols x {bits} bits "
            "> 62 usable long bits — lower bits or cluster fewer columns"
        )


def zvalue(scaled_cols: list[str], bits: int = 10) -> Column:
    """Morton z-value of pre-scaled integer columns (each in [0, 2^bits)).

    A sum of ((col >> b) & 1) << target shifted single-bit terms —
    pure JVM integer expressions, fully codegen'd, no Python.
    """
    _check_bit_budget(scaled_cols, bits)
    terms = [
        (F.shiftright(F.col(c).cast("long"), b).bitwiseAND(F.lit(1))
         * F.lit(1 << tgt))
        for c, b, tgt in _interleave_terms(scaled_cols, bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zvalue_sql(scaled_cols: list[str], bits: int = 10) -> str:
    """The identical interleave as an ANSI-SQL expression (oracle side)."""
    _check_bit_budget(scaled_cols, bits)
    parts = [
        f"(((CAST({c} AS BIGINT) >> {b}) & 1) * {1 << tgt})"
        for c, b, tgt in _interleave_terms(scaled_cols, bits)
    ]
    return " + ".join(parts)


def scale_to_bits(col: Column, cmin: Column, cmax: Column, bits: int = 10) -> Column:
    """Min-max scale a numeric column onto the [0, 2^bits) integer grid.

    floor((v - min) * 2^bits / (max - min + 1)) — the +1 keeps the max
    value inside the grid; single IEEE double divide + floor, identical
    in any engine.
    """
    span = (cmax - cmin + F.lit(1)).cast("double")
    return F.floor((col - cmin).cast("double") * F.lit(1 << bits) / span).cast(
        "long"
    )


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    bits: int = 10,
    num_partitions: int | None = None,
    z_col: str = "__z",
) -> DataFrame:
    """Cluster rows by the Z-order curve over ``cols``.

    Adds the z-value, range-partitions on it (each output partition owns
    a contiguous z-range => bounded min/max on every input column), and
    sorts within partitions so row-group stats are tight too.  Write the
    result with any parquet sink to get prunable files.
    """
    stats = df.agg(
        *[f for c in cols for f in (F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}"))]
    )
    scaled_names = [f"__s_{c}" for c in cols]
    withz = (
        df.crossJoin(F.broadcast(stats))
        .select(
            "*",
            *[
                scale_to_bits(
                    F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits
                ).alias(f"__s_{c}")
                for c in cols
            ],
        )
        .withColumn(z_col, zvalue(scaled_names, bits))
        .drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols], *scaled_names)
    )
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return withz.repartitionByRange(parts, F.col(z_col)).sortWithinPartitions(z_col)


def parquet_dir_stats(spark, path: str) -> tuple[int, int]:
    """(total_bytes, file_count) of the ``*.parquet`` files under
    ``path``, listed recursively through the Hadoop FileSystem API —
    works against any configured scheme (file://, hdfs://, s3a://),
    unlike a local ``os.walk``, so the compaction sizing below is
    object-store-ready.  The listing is driver-side but O(files), the
    same metadata the parquet scan itself must enumerate.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    total = count = 0
    while it.hasNext():
        status = it.next()
        if status.getPath().getName().endswith(".parquet"):
            total += status.getLen()
            count += 1
    return total, count


def compact_parquet_dir(
    spark,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    z_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_bytes`` each; returns the output file count.

    The small-files problem is the steady-state failure mode of
    continuous ingest (every micro-batch writes a file; a year of
    5-minute batches is 100k files whose footer reads dominate scan
    time).  Sizing: output file count = ceil(input bytes / target),
    measured via :func:`parquet_dir_stats` (Hadoop FS listing, any
    scheme).  ``coalesce`` (narrow, no shuffle) merges partitions when
    shrinking; pass ``z_cols`` to Z-order-cluster during the rewrite
    instead (one range exchange — compaction and layout in a single
    pass).
    """
    import math

    total, _ = parquet_dir_stats(spark, src_dir)
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src_dir)
    if z_cols:
        out = zorder_repartition(df, z_cols, num_partitions=n_out).drop("__z")
    else:
        out = df.coalesce(n_out)
    out.write.mode("overwrite").parquet(dst_dir)
    return parquet_dir_stats(spark, dst_dir)[1]


def publish_single_file(spark, src_dir: str, dest_file: str) -> int:
    """Publish a parquet directory as ONE ``.parquet`` FILE at
    ``dest_file`` — the reference's exact output artifact
    (src/main.rs:416-425 writes a single file; Spark writes a
    directory, which a DuckDB-over-HTTP consumer of the published
    file would notice).  Returns the published byte size.

    Mechanics: ``coalesce(1)`` rewrite into a scratch dir next to the
    destination (narrow, no shuffle — one task streams every input
    file), then a Hadoop-FileSystem rename of the lone part file onto
    ``dest_file`` (atomic on HDFS/posix; last-hop copy on stores
    without native rename) and scratch cleanup.  All paths go through
    the FileSystem API, so any configured scheme works.  A single
    file is by construction a single-task read — this is a PUBLISH
    artifact for small-to-medium outputs (the planet changeset file
    is ~10 GB), not a layout for cluster-parallel scans; keep the
    directory form for those.
    """
    jvm = spark._jvm
    scratch = dest_file + ".__single_file_tmp"
    spark.read.parquet(src_dir).coalesce(1).write.mode("overwrite").parquet(
        scratch, compression="snappy"
    )
    jscratch = jvm.org.apache.hadoop.fs.Path(scratch)
    fs = jscratch.getFileSystem(spark._jsc.hadoopConfiguration())
    parts = [
        f
        for f in fs.listStatus(jscratch)
        if f.getPath().getName().endswith(".parquet")
    ]
    assert len(parts) == 1, f"coalesce(1) produced {len(parts)} files"
    size = parts[0].getLen()
    jdest = jvm.org.apache.hadoop.fs.Path(dest_file)
    fs.delete(jdest, False)
    if not fs.rename(parts[0].getPath(), jdest):
        raise OSError(f"rename to {dest_file} failed")
    fs.delete(jscratch, True)
    return size


# ---------------------------------------------------------------------------
# File-level data skipping (manifest of per-file min/max, Iceberg-style)
# ---------------------------------------------------------------------------
# Partition dirs prune at directory granularity (q154's __pb buckets);
# table formats add the FILE level: a manifest of per-file column
# min/max lets a range predicate skip whole files inside a partition.
# On plain parquet the same mechanic is two pieces: a range-clustered
# write (so files cover disjoint key ranges) and a manifest parquet
# consulted before the scan.


def manifest_write(df, key_col: str, path: str, n_files: int) -> None:
    """Range-cluster ``df`` by ``key_col`` into ~``n_files`` files and
    write a sibling ``<path>_manifest`` of per-file (file, min, max).

    ``repartitionByRange`` gives files with DISJOINT key ranges — the
    property that makes min/max skipping effective; an unclustered
    write has every file spanning the whole domain and the manifest
    prunes nothing (the Z-order module's linear-clustering lesson, 1-D
    case).  The manifest is built from one column-pruned re-scan
    grouped by ``input_file_name`` — O(files) rows.
    """
    (
        df.repartitionByRange(n_files, F.col(key_col))
        .sortWithinPartitions(key_col)
        .write.mode("overwrite")
        .parquet(path)
    )
    spark = df.sparkSession
    (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(key_col).alias("key_min"),
            F.max(key_col).alias("key_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path + "_manifest")
    )


def manifest_pruned_read(spark, path: str, key_col: str, lo, hi):
    """Scan only the files whose [min, max] intersects ``[lo, hi)``,
    per the manifest; returns (df, files_read, files_total).

    The manifest collect is O(files) tiny rows — the table-format
    planning step, not a data collect.  The residual predicate is
    re-applied in-row (files straddling a bound contain rows outside
    the range), so the result is exact regardless of clustering.
    """
    m = spark.read.parquet(path + "_manifest")
    keep = [
        r.file
        for r in m.where(
            (F.col("key_max") >= F.lit(lo)) & (F.col("key_min") < F.lit(hi))
        ).collect()
    ]
    total = m.count()
    df = (
        spark.read.parquet(*keep)
        if keep
        else spark.read.parquet(path).limit(0)
    )
    return (
        df.where((F.col(key_col) >= F.lit(lo)) & (F.col(key_col) < F.lit(hi))),
        len(keep),
        total,
    )


def manifest_write_zordered(
    df, cols: list[str], path: str, n_files: int, bits: int = 10
) -> None:
    """Z-order-cluster ``df`` on ``cols`` into ~``n_files`` files and
    write a manifest of per-file min/max FOR EVERY clustering column.

    This is where Z-order pays off measurably: a linear (1-D) ordering
    gives tight file bounds on the leading column only, so a box
    predicate on the second column prunes nothing; each file owning a
    CONTIGUOUS Z-RANGE bounds every interleaved dimension at once, and
    the same min/max manifest then skips files for multi-dimensional
    boxes (q98 proves tight cells; this operator turns them into
    skipped I/O).
    """
    clustered = zorder_repartition(df, cols, bits=bits, num_partitions=n_files).drop(
        "__z"
    )
    clustered.write.mode("overwrite").parquet(path)
    spark = df.sparkSession
    aggs = [
        f
        for c in cols
        for f in (F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max"))
    ]
    (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(*aggs, F.count(F.lit(1)).alias("n_rows"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path + "_manifest")
    )


def manifest_pruned_read_box(spark, path: str, bounds: dict):
    """Scan only files whose per-column [min, max] intersects EVERY
    ``bounds[col] = (lo, hi)`` half-open box side; the residual
    predicate re-applies in-row.  Returns (df, files_read, files_total).
    """
    m = spark.read.parquet(path + "_manifest")
    cond = F.lit(True)
    for c, (lo, hi) in bounds.items():
        cond = cond & (F.col(f"{c}_max") >= F.lit(lo)) & (F.col(f"{c}_min") < F.lit(hi))
    keep = [r.file for r in m.where(cond).collect()]
    total = m.count()
    df = spark.read.parquet(*keep) if keep else spark.read.parquet(path).limit(0)
    res = F.lit(True)
    for c, (lo, hi) in bounds.items():
        res = res & (F.col(c) >= F.lit(lo)) & (F.col(c) < F.lit(hi))
    return df.where(res), len(keep), total
