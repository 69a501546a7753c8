"""OSM changeset XML -> DataFrame -> Parquet (the reference's pipeline,
Spark-first).

Reference behavior being reproduced (all in /root/reference/src/main.rs):
- streaming SAX scan over (optionally multi-stream bzip2) XML
  (:286-367, :431-440) -> Spark's built-in XML source; bz2 decode is
  Hadoop's BZip2Codec, which is *splittable*, so what the reference
  decodes single-threaded parallelizes across executors for free.
- 12 recognized attributes, everything else dropped (:207-221) ->
  explicit input schema (schema application = projection pushdown).
- ``description`` = value of the last <tag k="comment"> child (:240-247
  assignment semantics: last one wins).
- defaults for absent attributes: id=0, open=false, num_changes=0,
  comments_count=0; the other 9 columns null (:40-55).
- ``open`` is ``value == "true"`` — any other string is false (:211).
- fail-fast vs continue-on-error (:344-363) -> FAILFAST vs PERMISSIVE
  mode with corrupt-record filtering (salvage the parseable rows).

Scale design (100 TB planet-dump class inputs):
- The XML scan is distributed: Spark splits the file (bz2 blocks are
  split points) and each task SAX-parses its slice — the reference's
  1 MiB buffered single pass becomes N parallel passes.
- ``maxRecordsPerFile`` plays the reference's --batch-size role
  (:32-33) for output sizing; partition the output by day of
  ``created_at`` for partition-pruned downstream queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.schemas import (
    CHANGESET_SCHEMA,
    CHANGESET_XML_SCHEMA,
)


def read_changesets_xml(
    spark: SparkSession,
    path: str,
    continue_on_error: bool = False,
) -> DataFrame:
    """Read a changeset XML dump into the declared 13-column schema."""
    mode = "PERMISSIVE" if continue_on_error else "FAILFAST"
    raw = (
        spark.read.format("xml")
        .option("rowTag", "changeset")
        # keep attribute values verbatim: quick_xml trims *text* nodes, not
        # attributes (src/main.rs:296-299 trim_text vs :240-247 stores v
        # as-is) — Spark's default ignoreSurroundingSpaces=true would turn
        # <tag k="comment" v=" "/> into '' instead of ' '
        .option("ignoreSurroundingSpaces", "false")
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(CHANGESET_XML_SCHEMA)
        .load(path)
    )
    if continue_on_error:
        raw = raw.where(F.col("_corrupt_record").isNull())
    return _project(raw)


def _project(raw: DataFrame) -> DataFrame:
    """Attribute columns -> the reference's 13-column output schema."""
    # last <tag k="comment"> wins (src/main.rs:240-247); try_element_at:
    # ANSI mode errors on element_at(-1) over the empty (no-comment) array
    last_comment = F.try_element_at(
        F.filter(F.col("tag"), lambda t: t["_k"] == F.lit("comment")), F.lit(-1)
    )["_v"]
    out = raw.select(
        F.coalesce(F.col("_id"), F.lit(0).cast("long")).alias("id"),
        F.col("_created_at").alias("created_at"),
        F.col("_closed_at").alias("closed_at"),
        F.coalesce(F.col("_open") == "true", F.lit(False)).alias("open"),
        F.col("_user").alias("user"),
        F.col("_uid").alias("uid"),
        F.col("_min_lat").alias("min_lat"),
        F.col("_min_lon").alias("min_lon"),
        F.col("_max_lat").alias("max_lat"),
        F.col("_max_lon").alias("max_lon"),
        F.coalesce(F.col("_num_changes"), F.lit(0).cast("long")).alias("num_changes"),
        F.coalesce(F.col("_comments_count"), F.lit(0).cast("long")).alias(
            "comments_count"
        ),
        last_comment.alias("description"),
    )
    return out


def convert(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    batch_size: int = 100_000,
    continue_on_error: bool = False,
    partition_by_day: bool = False,
) -> int:
    """Full conversion: XML (possibly .bz2) -> Snappy Parquet.

    ``batch_size`` maps to ``maxRecordsPerFile`` (the reference flushes an
    Arrow RecordBatch every batch_size rows, src/main.rs:307-327; here it
    bounds output file size instead — the Spark-native meaning).
    Returns the row count (the reference prints the same, :453).
    """
    from pyspark.sql import Observation

    df = read_changesets_xml(spark, input_path, continue_on_error)
    obs = Observation("conversion")
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    if partition_by_day:
        observed = observed.withColumn(
            "created_day", F.to_date(F.col("created_at"))
        )
    writer = observed.write.mode("overwrite").option(
        "maxRecordsPerFile", max(batch_size, 1)
    )
    if partition_by_day:
        writer = writer.partitionBy("created_day")
    writer.parquet(output_path, compression="snappy")
    # row count from the write's own scan (src/main.rs:453 prints the same
    # total) — no second read of the output at planet scale.
    return int(obs.get["rows"])


def validate_schema(df: DataFrame) -> None:
    """Assert the output matches the declared schema (names + types)."""
    expected = [(f.name, f.dataType.simpleString()) for f in CHANGESET_SCHEMA.fields]
    actual = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    if expected != actual:
        raise ValueError(f"schema drift: expected {expected}, got {actual}")
