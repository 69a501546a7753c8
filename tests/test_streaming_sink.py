"""Streaming file-sink end-to-end: replay -> parquet sink -> read back.

The S-family queries capture state via foreachBatch; this test proves
the *production* sink path — append-mode parquet with a checkpoint —
delivers exactly-once file output equal to the batch aggregate.
"""

from __future__ import annotations

import pytest

import tempfile

from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.catalog import load_table
from osm_changesets_to_parquet_spark.streaming.jobs import (
    _read_stream,
    prepare_replay_dir,
)


@pytest.mark.slow  # >8 s: full-suite gate only (pytest.ini)
def test_streaming_parquet_sink_exactly_once(spark, sf_dir):
    replay = prepare_replay_dir(spark, sf_dir, late=False)
    out = tempfile.mkdtemp(prefix="stream_sink_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")

    ev = _read_stream(spark, replay)
    # append-mode windowed aggregate: only watermark-closed windows land
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.unix_micros("w.start").alias("ws"), "event_type", "cnt")
    )
    q = (
        agg.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", out)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.ws, r.event_type): r.cnt for r in spark.read.parquet(out).collect()
    }
    batch = load_table(spark, sf_dir, "events")
    want_df = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.unix_micros("w.start").alias("ws"), "event_type", "cnt")
    )
    want = {(r.ws, r.event_type): r.cnt for r in want_df.collect()}

    # append mode withholds windows the final watermark hasn't closed —
    # everything emitted must match the batch result exactly, and the
    # only missing keys may be from the last open hour
    max_ws = max(ws for ws, _ in want)
    for k, v in got.items():
        assert want[k] == v, k
    missing = {k for k in want if k not in got}
    assert all(ws >= max_ws - 3_600_000_000 for ws, _ in missing), missing
    assert len(got) >= len(want) - 2 * 5  # at most the tail windows absent
