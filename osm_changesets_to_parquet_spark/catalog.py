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


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the spark.sql surface)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
