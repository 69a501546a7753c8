"""Table catalog for the driver-provided synthetic star schema.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet each under
``/root/testdata/sf{0.001,0.01,0.1}``.

Scale notes:
- Loads are plain ``spark.read.parquet`` — schema comes from the files
  (no inference pass), predicate pushdown and column pruning flow into
  the scan for free.
- ``events.ts``: ``load_table`` normalizes BOTH timestamp encodings a
  fixture generation may carry.  TIMESTAMP(NANOS) parquet (unreadable
  by Spark's vectorized reader) loads via
  ``spark.sql.legacy.parquet.nanosAsLong`` as epoch-nanos long and is
  truncated to micros; the current driver fixtures are INT64
  TIMESTAMP(MICROS, isAdjustedToUTC=false) (verified via
  parquet_schema in round 10, ADVICE r09), for which nanosAsLong is a
  no-op and the NTZ column is cast to instant TIMESTAMP under the
  UTC-pinned session tz.  Either way the queries get a TimestampType
  ``ts`` plus ``ts_us`` (epoch micros, long); every time comparison in
  the declared queries is over integer ``ts_us`` so Spark and the
  DuckDB oracle can never disagree on a boundary (SURVEY.md §2.B
  determinism rule 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table, normalizing the events timestamp."""
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) parquet + nanosAsLong: epoch-nanos long ->
            # micros timestamp; keep integer micros too.
            df = df.withColumn("ts_us", F.expr("ts div 1000")).withColumn(
                "ts", F.timestamp_micros(F.col("ts_us"))
            )
        else:
            # TIMESTAMP(MICROS) parquet arrives as TIMESTAMP_NTZ (naive)
            # or TIMESTAMP depending on isAdjustedToUTC.  Session tz is
            # pinned UTC, so casting NTZ -> TIMESTAMP preserves the
            # instant; unix_micros then gives the shared integer domain.
            if ts_type == "timestamp_ntz":
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            df = df.withColumn("ts_us", F.unix_micros("ts"))
        return df
    return spark.read.parquet(path)


def fan_out(df: DataFrame, by: str | None = None) -> DataFrame:
    """Spread a narrow scan across the session's cores before EXPENSIVE
    per-row work (guide §2.5: unsplittable input -> repartition right
    after the read).

    Spark parallelizes a scan by file splits; a parquet file is further
    splittable only at row-group boundaries.  The driver fixtures are
    one file x ONE row group per table, so every scan stage is exactly
    one task and any per-row compute fused into it (n-gram builds,
    hash kernels, explodes feeding partial aggregates) runs on 1 of N
    cores.  Measured at sf0.1: the q136 gram build drops 2.66 -> 0.72 s
    when fanned to 32 partitions.

    Scale-adaptive, not a local[32] constant: the target is
    ``defaultParallelism`` (the session's core count — shrinks with the
    driver's low-core bench runs) and the repartition is SKIPPED when
    the frame already has at least half that many partitions, which is
    every real multi-file/multi-row-group table at cluster scale — so
    the exchange exists exactly where the input is unsplittable and
    the work would otherwise serialize.  Callers pass ``by`` (an id
    column) for a deterministic hash partitioning; round-robin
    otherwise (deterministic via Spark's sort-before-repartition).

    Only call where per-row work dominates the scan: for cheap
    codegen'd scans the exchange costs more than the serial stage.
    """
    spark = df.sparkSession
    want = spark.sparkContext.defaultParallelism
    have = df.rdd.getNumPartitions()
    if 2 * have >= want:
        return df
    return df.repartition(want, F.col(by)) if by else df.repartition(want)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the spark.sql surface)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
