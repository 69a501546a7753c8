"""Multimodal-column queries M47-M50 (north star surface; the reference
has no media handling — its analog is the opaque-payload Parquet contract,
reference: src/main.rs:384-408).

The decode step is a DETERMINISTIC STUB (sha256-derived pixel strip, see
operators/multimodal.py) precisely so the whole mapInPandas plumbing —
schema, Arrow batches, 1:N fan-out — is hash-matched against a pure-SQL
DuckDB oracle: byte i of the fake decode is
``CAST('0x' || substring(sha256(text), 2i+1, 2) AS INT)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.catalog import load_table
from osm_changesets_to_parquet_spark.operators.multimodal import (
    attach_payload,
    decode_image_features,
    resize_images,
    sample_audio_frames,
)
from osm_changesets_to_parquet_spark.queries import register

_BYTE = "CAST('0x' || substring(sha256(text), 2*{i} + 1, 2) AS INT)"


def _docs_with_payload(spark: SparkSession, sf_dir: str, modality: str = "image") -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return attach_payload(docs, "text", modality)


@register(
    "m47_multimodal_meta",
    """
    SELECT doc_id, 'image' AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha
    FROM documents WHERE text IS NOT NULL ORDER BY doc_id
    """,
    doc="opaque binary payload + typed metadata struct; JVM-side hash/length",
    tables=("documents",),
)
def m47(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs_with_payload(spark, sf_dir)
    return df.select(
        "doc_id",
        F.col("media_meta.modality").alias("modality"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.lower(F.sha2(F.col("payload"), 256)).alias("sha"),
    ).orderBy("doc_id")


@register(
    "m48_image_decode_features",
    f"""
    SELECT d.doc_id,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
           ROUND(AVG({_BYTE.format(i='t.i')}), 4) AS mean_px,
           CAST(MAX({_BYTE.format(i='t.i')}) AS BIGINT) AS max_px,
           CAST(MIN(CASE WHEN t.i = 0 THEN {_BYTE.format(i='t.i')} END) AS BIGINT) AS px0
    FROM documents d CROSS JOIN range(32) t(i)
    WHERE d.text IS NOT NULL
    GROUP BY d.doc_id, d.text
    ORDER BY d.doc_id
    """,
    doc="stubbed image decode via Arrow mapInPandas; per-image pixel stats",
    tables=("documents",),
)
def m48(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = decode_image_features(_docs_with_payload(spark, sf_dir))
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round("mean_px", 4).alias("mean_px"),
        "max_px",
        F.element_at("pixels", 1).alias("px0"),
    ).orderBy("doc_id")


@register(
    "m49_audio_frame_sample",
    f"""
    SELECT d.doc_id, CAST(f.i AS INT) AS frame_id,
           ROUND(AVG({_BYTE.format(i='(8*f.i + j.j)')}), 4) AS frame_mean
    FROM documents d CROSS JOIN range(4) f(i) CROSS JOIN range(8) j(j)
    WHERE d.text IS NOT NULL
    GROUP BY d.doc_id, f.i
    ORDER BY d.doc_id, frame_id
    """,
    doc="audio/video frame sampling: 1:N row fan-out inside mapInPandas",
    tables=("documents",),
)
def m49(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_audio_frames(_docs_with_payload(spark, sf_dir, "audio"), 8, 8)
    return frames.select(
        "doc_id", "frame_id", F.round("frame_mean", 4).alias("frame_mean")
    ).orderBy("doc_id", "frame_id")


@register(
    "m50_image_resize",
    f"""
    SELECT d.doc_id, CAST(4 AS INT) AS width, CAST(2 AS INT) AS height,
           CAST(SUM({_BYTE.format(i='(4*j.j)')}) AS BIGINT) AS px_sum
    FROM documents d CROSS JOIN range(8) j(j)
    WHERE d.text IS NOT NULL
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """,
    doc="resize stub: nearest-neighbor re-sample of the decoded strip",
    tables=("documents",),
)
def m50(spark: SparkSession, sf_dir: str) -> DataFrame:
    resized = resize_images(_docs_with_payload(spark, sf_dir), width=4, height=2)
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.aggregate("pixels", F.lit(0).cast("long"), lambda a, x: a + x).alias("px_sum"),
    ).orderBy("doc_id")


@register(
    "m51_media_dedup",
    """
    SELECT sha256(text) AS sha, MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents WHERE text IS NOT NULL
    GROUP BY 1 HAVING COUNT(*) > 1
    ORDER BY keep_id
    """,
    doc=(
        "exact dedup over the opaque binary payload: group on "
        "sha256(payload) so the shuffle carries a 32-byte digest per "
        "row regardless of media size — the q34 discipline applied to "
        "the multimodal column; duplicate groups keep the min doc_id"
    ),
    tables=("documents",),
)
def m51(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs_with_payload(spark, sf_dir)
    return (
        df.groupBy(F.lower(F.sha2(F.col("payload"), 256)).alias("sha"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .where(F.col("n_copies") > 1)
        .orderBy("keep_id")
    )
