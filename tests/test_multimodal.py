"""Multimodal operator contracts: schema, batch shape, determinism.

The decode is a deterministic stub (sha256 strip) — these tests pin the
Spark-side plumbing a real codec would drop into: payload/metadata
schema, Arrow mapInPandas batch contract, 1:N frame fan-out.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.catalog import load_table
from osm_changesets_to_parquet_spark.operators.multimodal import (
    MEDIA_META,
    attach_payload,
    decode_image_features,
    resize_images,
    sample_audio_frames,
)


def _docs(spark, sf_dir, n=20):
    return load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull()).limit(n)


def test_attach_payload_schema(spark, sf_dir):
    df = attach_payload(_docs(spark, sf_dir))
    assert df.schema["payload"].dataType.typeName() == "binary"
    built = df.schema["media_meta"].dataType
    assert [(f.name, f.dataType) for f in built.fields] == [
        (f.name, f.dataType) for f in MEDIA_META.fields
    ]
    row = df.select("text", "payload").first()
    assert bytes(row.payload) == row.text.encode("utf-8")


def test_decode_matches_reference_hash(spark, sf_dir):
    df = attach_payload(_docs(spark, sf_dir))
    feats = {r.doc_id: r for r in decode_image_features(df).collect()}
    for r in df.select("doc_id", "text").collect():
        digest = hashlib.sha256(r.text.encode("utf-8")).digest()
        f = feats[r.doc_id]
        assert f.pixels == list(digest)
        assert f.n_bytes == len(r.text.encode("utf-8"))
        assert f.max_px == max(digest)
        assert abs(f.mean_px - sum(digest) / 32) < 1e-12


def test_resize_dims_and_determinism(spark, sf_dir):
    df = attach_payload(_docs(spark, sf_dir))
    out = resize_images(df, width=4, height=2)
    rows = out.collect()
    assert all(len(r.pixels) == 8 for r in rows)
    again = {r.doc_id: r.pixels for r in resize_images(df, width=4, height=2).collect()}
    assert all(again[r.doc_id] == r.pixels for r in rows)


def test_audio_frame_fanout(spark, sf_dir):
    df = attach_payload(_docs(spark, sf_dir), modality="audio")
    n_docs = df.count()
    frames = sample_audio_frames(df, frame_len=8, hop=8)
    # 32-sample strip, frame 8 / hop 8 => exactly 4 frames per doc
    assert frames.count() == 4 * n_docs
    per_doc = frames.groupBy("doc_id").agg(F.collect_set("frame_id").alias("f")).collect()
    assert all(sorted(r.f) == [0, 1, 2, 3] for r in per_doc)


def test_decode_plan_prunes_columns(spark, sf_dir):
    """The parquet scan under the decode must read only doc_id+text (the
    payload inputs), not the full documents schema."""
    df = attach_payload(load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull()))
    plan = decode_image_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "lang" not in plan and "source" not in plan
