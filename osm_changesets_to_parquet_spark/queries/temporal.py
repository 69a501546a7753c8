"""Round-8 temporal-modeling queries: SCD2 dimension build, point-in-
time (as-of) enrichment, and interval-union coverage (q299-q301).

The production shapes behind them: a warehouse dimension built from a
CDC change log (SCD2 validity intervals), leakage-free feature lookup
("what was the user's plan WHEN the purchase happened" — the
feature-store as-of join), and utilization/billing from overlapping
activity intervals (union length, not sum of lengths).

House rules (SURVEY §2.B determinism discipline): all time arithmetic
is integer epoch micros (``ts_us``); monetary/duration values go
through exact integer cents before any sum; every result has a total
order; column names alias identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.catalog import load_table
from osm_changesets_to_parquet_spark.queries import register

# ---------------------------------------------------------------------------
# q299: SCD2 dimension build from a change log
# ---------------------------------------------------------------------------

_Q299_SQL = """
WITH chg AS (
  SELECT user_id, event_id,
         epoch_us(ts) AS t,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS attr
  FROM events WHERE event_type = 'signup'
)
SELECT user_id, event_id AS change_id, attr,
       CAST(t AS BIGINT) AS valid_from_us,
       CAST(LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
            AS BIGINT) AS valid_to_us,
       CASE WHEN LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
            IS NULL THEN TRUE ELSE FALSE END AS is_current
FROM chg ORDER BY user_id, valid_from_us, change_id
"""


@register(
    "q299_scd2_intervals",
    _Q299_SQL,
    doc=(
        "SCD2 (slowly-changing-dimension type 2) build from a CDC "
        "change log: each user's 'signup' events carry a plan "
        "attribute (props.k); one LEAD window per user turns the log "
        "into half-open validity intervals [valid_from, valid_to) "
        "with the open current version flagged — the standard "
        "warehouse dimension-build, one shuffle on the dimension key, "
        "per-key window state bounded by that key's change count "
        "(never the table); ties broken by (ts, event_id) so the "
        "interval chain is deterministic"
    ),
    tables=("events",),
)
def q299(spark: SparkSession, sf_dir: str) -> DataFrame:
    chg = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("event_id").alias("change_id"),
            F.col("ts_us").alias("t"),
            F.get_json_object("props", "$.k").cast("long").alias("attr"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("t", "change_id")
    nxt = F.lead("t").over(w)
    return chg.select(
        "user_id",
        "change_id",
        "attr",
        F.col("t").cast("long").alias("valid_from_us"),
        nxt.cast("long").alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from_us", "change_id")


# ---------------------------------------------------------------------------
# q300: point-in-time (as-of) enrichment — the feature-store join
# ---------------------------------------------------------------------------

_Q300_SQL = """
WITH chg AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS attr
  FROM events WHERE event_type = 'signup'
),
pur AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
ranked AS (
  SELECT p.event_id, p.user_id, p.t, p.cents, c.attr,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY c.t DESC, c.event_id DESC) AS rn
  FROM pur p JOIN chg c ON c.user_id = p.user_id AND c.t <= p.t
)
SELECT event_id, user_id, CAST(t AS BIGINT) AS ts_us, attr,
       CAST(cents AS BIGINT) AS cents
FROM ranked WHERE rn = 1 ORDER BY event_id
"""


@register(
    "q300_pit_enrich",
    _Q300_SQL,
    doc=(
        "point-in-time enrichment (the feature-store as-of join, "
        "leakage-free by construction): every purchase is tagged with "
        "the plan attribute that was ACTIVE at its timestamp — never "
        "a later one.  Spark-first spelling: union the change log and "
        "the fact stream on the entity key and forward-fill the "
        "attribute with one last(ignorenulls) running window ordered "
        "(ts, kind, id) — changes sort before same-instant facts — so "
        "the whole join is ONE shuffle on the entity key and per-key "
        "linear state, not a per-fact subquery scan (that full "
        "fact x preceding-changes expansion is exactly the oracle's "
        "cost); facts before any change are dropped on both sides"
    ),
    tables=("events",),
)
def q300(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    chg = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("eid"),
        F.col("ts_us").alias("t"),
        F.lit(0).alias("kind"),
        F.get_json_object("props", "$.k").cast("long").alias("attr"),
        F.lit(None).cast("long").alias("cents"),
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("eid"),
        F.col("ts_us").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("attr"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind", "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = chg.unionByName(pur).withColumn(
        "active_attr", F.last("attr", ignorenulls=True).over(w)
    )
    return (
        filled.where((F.col("kind") == 1) & F.col("active_attr").isNotNull())
        .select(
            F.col("eid").alias("event_id"),
            "user_id",
            F.col("t").cast("long").alias("ts_us"),
            F.col("active_attr").alias("attr"),
            F.col("cents").cast("long").alias("cents"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# q301: interval-union coverage (sweep line via running max-end)
# ---------------------------------------------------------------------------

# each event opens an activity interval whose length is value MINUTES,
# exactly: integer cents x 600_000 us (0.01 min); intervals overlap
# freely inside a user's day, so covered time != sum of lengths
_Q301_US_PER_CENT = 600_000

_Q301_SQL = f"""
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
         epoch_us(ts)
           + CAST(ROUND(value * 100) AS BIGINT) * {_Q301_US_PER_CENT} AS e
  FROM events
),
flagged AS (
  SELECT user_id, event_id, s, e,
         CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) IS NULL
                   OR s > MAX(e) OVER (PARTITION BY user_id
                                       ORDER BY s, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS island
  FROM flagged
),
merged AS (
  SELECT user_id, island, MAX(e) - MIN(s) AS covered
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(covered) AS BIGINT) AS covered_us
FROM merged GROUP BY user_id ORDER BY user_id
"""


@register(
    "q301_interval_coverage",
    _Q301_SQL,
    doc=(
        "interval-UNION coverage per user (utilization/billing: total "
        "time covered by >=1 activity interval, where intervals "
        "overlap freely so the answer is not the sum of lengths): the "
        "classic sweep line as two windows — running MAX(end) over "
        "strictly-preceding rows flags island starts (touching "
        "endpoints merge: new island iff start > running end), a "
        "running SUM numbers the islands, one keyed aggregate per "
        "island then per user.  All integer micros (durations from "
        "exact cents), one shuffle on user_id, per-key linear state — "
        "the same scaling contract as sessionization but over "
        "VARIABLE-length, overlap-heavy intervals (a 30-min gap "
        "sessionize cannot express 40-minute overlapping spans)"
    ),
    tables=("events",),
)
def q301(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts_us").alias("s"),
        (
            F.col("ts_us")
            + F.round(F.col("value") * 100).cast("long")
            * F.lit(_Q301_US_PER_CENT)
        ).alias("e"),
    )
    prev_max_end = F.max("e").over(
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            prev_max_end.isNull() | (F.col("s") > prev_max_end), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            Window.partitionBy("user_id")
            .orderBy("s", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    merged = islands.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("covered")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("covered").cast("long").alias("covered_us"),
        )
        .orderBy("user_id")
    )
