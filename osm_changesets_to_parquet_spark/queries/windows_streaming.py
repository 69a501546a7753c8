"""Event-time window queries S1-S3 (SURVEY.md §2.B) in their batch form.

The same ``F.window`` / sessionization logic runs under Structured
Streaming in :mod:`osm_changesets_to_parquet_spark.streaming` (S4-S6);
these batch forms are the oracle-checkable half — Spark's windowing API
is identical across batch and streaming, which is exactly why we declare
them here.

All window identities are integer epoch arithmetic (micros/seconds) so
the DuckDB oracle (ns timestamps) and Spark (µs) can never disagree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.catalog import load_table
from osm_changesets_to_parquet_spark.queries import register

US_PER_HOUR = 3_600_000_000
US_PER_15MIN = 900_000_000


@register(
    "s1_tumbling_window",
    f"""
    SELECT epoch_us(ts) // {US_PER_HOUR} AS hour_id,
           event_type,
           COUNT(*) AS cnt,
           ROUND(SUM(value), 2) AS sum_val
    FROM events
    GROUP BY 1, 2 ORDER BY hour_id, event_type
    """,
    doc=(
        "tumbling 1h windows via F.window (the streaming-identical operator); "
        "window start mapped to an integer hour id for the oracle"
    ),
    tables=("events",),
)
def s1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_val"))
        .select(
            (F.unix_micros(F.col("w.start")) / US_PER_HOUR).cast("long").alias("hour_id"),
            "event_type",
            "cnt",
            "sum_val",
        )
        .orderBy("hour_id", "event_type")
    )


@register(
    "s2_sliding_window",
    f"""
    SELECT ((epoch_us(ts) // {US_PER_15MIN}) - g.i) * 900 AS win_start_s,
           event_type,
           COUNT(*) AS cnt,
           ROUND(SUM(value), 2) AS sum_val
    FROM events CROSS JOIN range(4) g(i)
    GROUP BY 1, 2 ORDER BY win_start_s, event_type
    """,
    doc=(
        "sliding 1h/15min windows via F.window; every event lands in exactly 4 "
        "windows — the oracle enumerates them arithmetically"
    ),
    tables=("events",),
)
def s2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_val"))
        .select(
            (F.unix_micros(F.col("w.start")) / 1_000_000).cast("long").alias("win_start_s"),
            "event_type",
            "cnt",
            "sum_val",
        )
        .orderBy("win_start_s", "event_type")
    )


@register(
    "s3_session_window",
    """
    WITH flagged AS (
      SELECT user_id, event_id, epoch_us(ts) AS t_us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                  >= 1800000000 THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), sessions AS (
      SELECT user_id, t_us,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM flagged
    ), per_session AS (
      SELECT user_id, sess_id, COUNT(*) AS n_events,
             (MAX(t_us) - MIN(t_us)) / 1000000.0 AS dur_s
      FROM sessions GROUP BY user_id, sess_id
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           ROUND(AVG(dur_s), 1) AS avg_dur_s
    FROM per_session GROUP BY user_id ORDER BY user_id
    """,
    doc=(
        "session windows, 30-min gap, per user — gaps-and-islands spelling "
        "(identical semantics to session_window: a gap of exactly 30min starts "
        "a new session). The streaming module uses session_window proper."
    ),
    tables=("events",),
)
def s3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.sessions import sessionize

    ev = load_table(spark, sf_dir, "events")
    per_session = sessionize(
        ev, user_col="user_id", time_col="ts_us", order_tiebreak="event_id", gap_us=1_800_000_000
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.avg("dur_s"), 1).alias("avg_dur_s"),
        )
        .orderBy("user_id")
    )
