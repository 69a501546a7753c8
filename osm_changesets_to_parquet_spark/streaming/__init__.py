"""Structured Streaming jobs (SURVEY §2.B S-queries).

S1-S3's window logic lives in ``queries.windows_streaming`` (batch and
streaming share the same ``F.window``/``session_window`` API — that is
the point of declaring them there); this package adds the
streaming-only semantics: watermarks + late-data drops (S4), streaming
dedup (S5), and custom stateful processing (S6), all driven by a
deterministic file-source replay of the events table.
"""

from osm_changesets_to_parquet_spark.streaming.jobs import (  # noqa: F401
    prepare_replay_dir,
    run_s4_watermark_tumbling,
    run_s5_streaming_dedup,
    run_s6_stateful_running_agg,
    run_s7_stream_stream_join,
    run_s9_session_window,
    run_s10_stream_merge,
    run_s11_left_outer_join,
    run_s12_python_stream_source,
    run_s13_partitioned_stream_source,
    run_s14_streaming_neardup,
    run_s15_streaming_quality_router,
    run_s16_streaming_transitions,
    run_s17_full_outer_join,
    run_s18_streaming_cms,
    run_s19_streaming_conversions,
    run_s20_python_stream_sink,
    run_s21_streaming_topk,
    run_s22_streaming_anomaly,
    run_s23_crash_recovery,
    run_s24_stream_pit,
    run_s25_streaming_quantile_sketch,
    run_s26_backfill_cutover,
)
