"""Sessionization (gaps-and-islands) — batch analog of ``session_window``.

Semantics match Spark's ``session_window(ts, gap)``: a session is a
maximal run of per-user events where consecutive gaps are < ``gap_us``;
an event exactly ``gap_us`` after its predecessor starts a new session
(session windows are start-inclusive / end-exclusive).

Scale: one shuffle on the user key, two window passes (lag + running
sum), one aggregation — all keyed by (user, session), so state is
bounded per user and AQE handles skewed users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user_col: str,
    time_col: str,
    gap_us: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Return one row per (user, session): start/end micros, n_events, dur_s."""
    order = [time_col] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    flagged = df.withColumn(
        "__new_sess",
        F.when(
            F.col(time_col) - F.lag(time_col).over(w) >= F.lit(gap_us), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered = flagged.withColumn("__sess_id", F.sum("__new_sess").over(wrun))
    return (
        numbered.groupBy(user_col, "__sess_id")
        .agg(
            F.min(time_col).alias("start_us"),
            F.max(time_col).alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
            ((F.max(time_col) - F.min(time_col)) / F.lit(1_000_000.0)).alias("dur_s"),
        )
        .withColumnRenamed("__sess_id", "sess_id")
    )
