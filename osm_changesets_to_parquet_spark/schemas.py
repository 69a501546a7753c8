"""Declared schemas (never inferred — inference would scan 100 TB twice
and can drift between runs).

CHANGESET_SCHEMA mirrors the reference's fixed 13-column Arrow schema
(reference: src/main.rs:384-408) with the type decisions from SURVEY §1.2:
- Arrow Timestamp(ms, naive) -> TimestampType with session TZ pinned UTC
  (values are RFC3339 parsed to UTC instants, src/main.rs:193-197)
- Arrow UInt32 -> LongType (Spark has no unsigned; long is lossless and
  Spark reads Parquet UINT32 as long anyway)

CHANGESET_XML_SCHEMA is the *input* schema handed to the XML reader:
only the 12 recognized attributes + the <tag> children, so unknown
attributes/subtrees are dropped by schema application exactly like the
reference's parser drop (src/main.rs:220, :269) — and the XML scan
never materializes them.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CHANGESET_SCHEMA = StructType(
    [
        StructField("id", LongType(), nullable=False),
        StructField("created_at", TimestampType(), nullable=True),
        StructField("closed_at", TimestampType(), nullable=True),
        StructField("open", BooleanType(), nullable=False),
        StructField("user", StringType(), nullable=True),
        StructField("uid", LongType(), nullable=True),
        StructField("min_lat", DoubleType(), nullable=True),
        StructField("min_lon", DoubleType(), nullable=True),
        StructField("max_lat", DoubleType(), nullable=True),
        StructField("max_lon", DoubleType(), nullable=True),
        StructField("num_changes", LongType(), nullable=False),
        StructField("comments_count", LongType(), nullable=False),
        StructField("description", StringType(), nullable=True),
    ]
)

_TAG = StructType(
    [StructField("_k", StringType()), StructField("_v", StringType())]
)

CHANGESET_XML_SCHEMA = StructType(
    [
        StructField("_id", LongType()),
        StructField("_created_at", TimestampType()),
        StructField("_closed_at", TimestampType()),
        StructField("_open", StringType()),
        StructField("_user", StringType()),
        StructField("_uid", LongType()),
        StructField("_min_lat", DoubleType()),
        StructField("_min_lon", DoubleType()),
        StructField("_max_lat", DoubleType()),
        StructField("_max_lon", DoubleType()),
        StructField("_num_changes", LongType()),
        StructField("_comments_count", LongType()),
        StructField("tag", ArrayType(_TAG)),
        StructField("_corrupt_record", StringType()),
    ]
)
