"""Multimodal (image/audio/video) column handling for training-data
pipelines at 100 TB scale.

Design (north star, /root/repo/BASELINE.json:6 — the reference itself has
no binary columns; its analog is the "opaque payload + typed metadata"
shape of its Parquet contract, reference: src/main.rs:384-408):

- Media payloads are **opaque ``binary`` columns** plus a typed metadata
  struct (``media_meta``).  Spark never interprets the bytes JVM-side;
  all byte-level work happens in Arrow-batched ``mapInPandas`` UDFs so
  the payload crosses to Python once per batch, zero-copy via Arrow.
- Decode/resize/frame-sample are **stubbed deterministically**: the real
  codecs (Pillow/librosa/ffmpeg) are not in this container.  The stub
  derives a fixed-size "pixel/sample" array from the payload's SHA-256
  digest — deterministic, schema-faithful, and reproducible in ANSI SQL
  (DuckDB ``sha256``), so even the stubbed decode path is hash-matched
  by the oracle harness.  Swapping in a real codec changes ONE marked
  function per modality; every schema, partition, and batch contract
  stays.
- Scale: ``mapInPandas`` is embarrassingly parallel (no shuffle); batch
  size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so
  a partition of 100 MB images never materializes as one pandas frame.
  Feature outputs are small fixed-width vectors — write-side cost is
  negligible next to payload IO, which stays columnar (Parquet reads
  prune the payload column unless the UDF actually needs it).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

# Typed metadata for an opaque media payload.  Width/height/channels for
# images; sample_rate/n_samples for audio; fps/n_frames for video.  One
# struct for all modalities keeps a single table schema for mixed corpora.
MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("max_px", T.LongType()),
        T.StructField("pixels", T.ArrayType(T.LongType())),
    ]
)

AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("frame_mean", T.DoubleType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", modality: str = "image") -> DataFrame:
    """Derive a deterministic opaque payload + metadata from a text column.

    Stands in for reading real media files: the driver testdata carries no
    binary columns, so the payload is the UTF-8 bytes of ``text_col`` —
    reproducible in DuckDB as ``encode(text)`` for oracle checks.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    n = F.octet_length(payload)
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit("raw").alias("format"),
            n.cast("int").alias("width"),
            F.lit(1).alias("height"),
            F.lit(1).alias("channels"),
            F.lit(16000).alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ),
    )


def _stub_decode_pixels(payload: bytes) -> bytes:
    """STUB DECODE — deterministic fake for the missing image codec.

    Real implementation would be ``PIL.Image.open(io.BytesIO(payload))``;
    this container has no codec libs, so the "decoded image" is the 32
    bytes of sha256(payload) interpreted as a 32-pixel grayscale strip.
    Deterministic and SQL-reproducible (DuckDB ``sha256``), so the whole
    mapInPandas path is oracle-checkable end to end.
    """
    return hashlib.sha256(payload).digest()


def decode_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode payloads and emit per-image pixel features via mapInPandas.

    The batch contract: each input pandas frame holds ``id_col`` and
    ``payload``; output is one row per image with the decoded pixel strip
    and summary stats.  Column pruning means Parquet only reads the two
    needed columns even though the table is wider.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            pixels = [
                np.frombuffer(_stub_decode_pixels(bytes(p)), dtype=np.uint8)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "mean_px": [float(np.mean(px)) for px in pixels],
                    "max_px": [int(np.max(px)) for px in pixels],
                    "pixels": [px.astype("int64").tolist() for px in pixels],
                }
            )

    return df.select(F.col(id_col), "payload").mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, id_col: str = "doc_id") -> DataFrame:
    """Resize stub: real codecs absent, so this re-samples the decoded
    32-pixel strip to ``width*height`` by nearest-neighbor index math —
    the exact mapInPandas/batch/schema shape a real resize would use."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("pixels", T.ArrayType(T.LongType())),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        n_out = width * height
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                px = np.frombuffer(_stub_decode_pixels(bytes(p)), dtype=np.uint8)
                idx = (np.arange(n_out) * len(px)) // n_out
                out.append(px[idx].astype("int64").tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "pixels": out,
                }
            )

    return df.select(F.col(id_col), "payload").mapInPandas(run, out_schema)


def sample_audio_frames(
    df: DataFrame, frame_len: int = 8, hop: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Frame-sample an "audio" payload: split the decoded sample strip
    into fixed-length frames (frame_len) every ``hop`` samples and emit
    one row per frame with its mean amplitude.  1:N row fan-out inside
    mapInPandas — the video frame-sampling shape as well."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, fids, means = [], [], []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                samples = np.frombuffer(_stub_decode_pixels(bytes(p)), dtype=np.uint8)
                for f, start in enumerate(range(0, len(samples) - frame_len + 1, hop)):
                    ids.append(int(doc_id))
                    fids.append(f)
                    means.append(float(np.mean(samples[start : start + frame_len])))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_id": fids, "frame_mean": means}
            ).astype({"doc_id": "int64", "frame_id": "int32", "frame_mean": "float64"})

    return df.select(F.col(id_col), "payload").mapInPandas(run, AUDIO_FRAME_SCHEMA)


def cdc_chunks(
    df: DataFrame,
    window: int = 8,
    modulus: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking over opaque binary payloads — the
    rsync/LBFS technique for deduplicating LARGE binaries where
    fixed-offset chunking breaks on a single inserted byte: a chunk
    boundary falls AFTER byte i whenever the rolling sum of the last
    ``window`` bytes is divisible by ``modulus``, so boundaries move
    WITH the content and an insertion only perturbs its own chunk.

    This is the purist constraint-free variant (every qualifying
    position cuts; expected chunk length = ``modulus``); production
    adds min/max chunk bounds, which makes cut selection sequential —
    a bounded per-doc walk in this same mapInPandas, or the recursive
    oracle spelling (q263's pattern).  The rolling sum is the WEAK
    layer of rsync's signature; swap a Rabin fingerprint for real
    adversarial inputs.

    One Arrow-batched pass over (id, payload); output one row per
    chunk (id, chunk string) — ASCII payloads decode losslessly, so
    the SQL oracle can reproduce every boundary via ascii()+windowed
    sums.  Dedup statistics downstream group on the chunk key.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, chunks = [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                data = bytes(payload)
                cuts = set()
                s = 0
                for i in range(1, len(data) + 1):
                    s += data[i - 1]
                    if i > window:
                        s -= data[i - 1 - window]
                    if i >= window and s % modulus == 0:
                        cuts.add(i)
                cuts.add(len(data))
                prev = 0
                for cut in sorted(cuts):
                    if cut > prev:
                        ids.append(int(doc_id))
                        chunks.append(data[prev:cut].decode("utf-8"))
                        prev = cut
            yield pd.DataFrame({id_col: ids, "chunk": chunks}).astype(
                {id_col: "int64"}
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("chunk", T.StringType()),
        ]
    )
    return df.select(F.col(id_col), "payload").mapInPandas(run, schema)
