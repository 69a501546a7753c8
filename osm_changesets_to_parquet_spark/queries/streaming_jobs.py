"""Streaming-only queries S4-S6 (SURVEY §2.B G-mode — here strengthened
to H-mode): each runs a REAL Structured Streaming query (file-source
replay, availableNow trigger, deterministic micro-batches) and returns
its final state; because the replay is deterministic, the final state is
expressible in plain SQL over the events table, so even the streaming
semantics are hash-matched against DuckDB:

- s4 on-time: watermark drops nothing when arrival order == event order
  => final == batch tumbling counts.
- s4 late: the 5 re-ordered rows arrive after the watermark passed their
  event time => dropped => final == batch counts excluding exactly them.
- s5: re-delivered duplicates removed within the watermark => final ==
  batch counts.
- s6: custom stateful running aggregate converges to the batch
  per-user aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from osm_changesets_to_parquet_spark.queries import FixtureGateError, register
from osm_changesets_to_parquet_spark.streaming import (
    run_s4_watermark_tumbling,
    run_s5_streaming_dedup,
    run_s6_stateful_running_agg,
    run_s7_stream_stream_join,
)
from osm_changesets_to_parquet_spark.streaming.jobs import N_LATE_ROWS


@register(
    "s4a_watermark_ontime",
    """
    SELECT epoch_us(ts) // 3600000000 AS hour_id, event_type, COUNT(*) AS cnt
    FROM events GROUP BY 1, 2 ORDER BY hour_id, event_type
    """,
    doc="streaming tumbling agg + 10min watermark, in-order replay: no drops",
    tables=("events",),
)
def s4a(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_s4_watermark_tumbling(spark, sf_dir, late=False)


@register(
    "s4b_watermark_late_drops",
    f"""
    WITH ordered AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY epoch_us(ts), event_id) - 1 AS rn
      FROM events
    ), k AS (SELECT CAST(FLOOR(0.4 * COUNT(*)) AS BIGINT) AS k FROM events)
    SELECT epoch_us(ts) // 3600000000 AS hour_id, event_type, COUNT(*) AS cnt
    FROM ordered, k
    WHERE rn < k.k OR rn >= k.k + {N_LATE_ROWS}
    GROUP BY 1, 2 ORDER BY hour_id, event_type
    """,
    doc=(
        "late-data replay: 5 rows re-delivered after the 10min watermark "
        "passed their event time are dropped — the oracle excludes exactly "
        "those rows"
    ),
    tables=("events",),
)
def s4b(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_s4_watermark_tumbling(spark, sf_dir, late=True)


@register(
    "s5_streaming_dedup",
    """
    SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY 1 ORDER BY event_type
    """,
    doc="dropDuplicatesWithinWatermark removes a re-delivered early batch",
    tables=("events",),
)
def s5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_s5_streaming_dedup(spark, sf_dir)


@register(
    "s6_stateful_running_agg",
    """
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc=(
        "applyInPandasWithState per-user running aggregate with timeout "
        "converges to the batch aggregate"
    ),
    tables=("events",),
)
def s6(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_s6_stateful_running_agg(spark, sf_dir)


@register(
    "s7_stream_stream_join",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND epoch_us(p.ts) > epoch_us(c.ts)
     AND epoch_us(p.ts) <= epoch_us(c.ts) + 300000000
    ORDER BY click_id, purchase_id
    """,
    doc=(
        "stream-stream interval join (purchases to preceding 5-minute "
        "clicks) with watermark-bounded state: the appended streaming "
        "output equals the batch interval join exactly"
    ),
    tables=("events",),
)
def s7(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_s7_stream_stream_join(spark, sf_dir)


@register(
    "s8_stream_static_join",
    """
    SELECT c.c_nationkey, e.event_type, COUNT(*) AS cnt
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2 ORDER BY c_nationkey, event_type
    """,
    doc=(
        "stream-static enrichment join: the customer dimension is "
        "re-planned into every micro-batch as a broadcast hash join — "
        "stateless, append-mode, the stream side never shuffles; the "
        "appended output equals the batch join exactly"
    ),
    tables=("events", "customer"),
)
def s8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming.jobs import (
        run_s8_stream_static_enrich,
    )

    return run_s8_stream_static_enrich(spark, sf_dir)


@register(
    "s9_session_window_stream",
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
    ), per AS (
      SELECT user_id, MIN(t_us) AS start_us, MAX(t_us) AS last_us,
             COUNT(*) AS n_events
      FROM sessions GROUP BY user_id, sess_id
    ), wm AS (SELECT MAX(epoch_us(ts)) - 600000000 AS w FROM events)
    SELECT user_id, start_us, n_events
    FROM per, wm
    WHERE last_us + 1800000000 <= w
    ORDER BY user_id, start_us
    """,
    doc=(
        "session_window PROPER under Structured Streaming (30-min gap, "
        "10-min watermark, APPEND mode — sessions emit once, when the "
        "watermark passes their window end): hash-matches the batch "
        "gaps-and-islands sessions minus the still-open tail the final "
        "watermark (max ts - 10min) has not finalized — so the append/"
        "finalization semantics are themselves part of the hash"
    ),
    tables=("events",),
)
def s9(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming import run_s9_session_window

    return run_s9_session_window(spark, sf_dir)


@register(
    "s10_stream_merge_upsert",
    """
    SELECT user_id,
           event_id AS last_event_id,
           CAST(epoch_us(ts) AS BIGINT) AS last_ts_us,
           value AS last_value
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC
      ) AS rn FROM events
    ) WHERE rn = 1 ORDER BY user_id
    """,
    doc=(
        "streaming CDC apply: foreachBatch MERGEs each micro-batch into "
        "a versioned parquet base table (per-batch latest per key -> "
        "anti-join + union upsert -> base version N+1, idempotent under "
        "batch replay); the final table must equal the global "
        "latest-row-per-user over the whole stream — the oracle"
    ),
    tables=("events",),
)
def s10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming import run_s10_stream_merge

    return run_s10_stream_merge(spark, sf_dir)


@register(
    "s11_left_outer_stream_join",
    """
    WITH c AS (
      SELECT event_id AS click_id, user_id, epoch_us(ts) AS cus
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pus
      FROM events WHERE event_type = 'purchase'
    ),
    wm AS (
      -- the GLOBAL watermark is the MIN of the two per-stream
      -- watermarks (each stream only sees its own event type), minus
      -- the 10-minute delay
      SELECT LEAST(MAX(epoch_us(ts)) FILTER (WHERE event_type = 'click'),
                   MAX(epoch_us(ts)) FILTER (WHERE event_type = 'purchase'))
             - 600000000 AS w
      FROM events
    ),
    matched AS (
      SELECT c.click_id, p.purchase_id, c.user_id
      FROM c JOIN p ON p.user_id = c.user_id
       AND pus > cus AND pus <= cus + 300000000
    ),
    unmatched AS (
      SELECT c.click_id, CAST(NULL AS BIGINT) AS purchase_id, c.user_id
      FROM c, wm
      WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.click_id = c.click_id)
        AND cus + 300000000 < wm.w
    )
    SELECT click_id, purchase_id, user_id FROM matched
    UNION ALL
    SELECT click_id, purchase_id, user_id FROM unmatched
    ORDER BY click_id, purchase_id
    """,
    doc=(
        "LEFT OUTER stream-stream join (the funnel/abandonment shape): "
        "matched rows emit on match exactly like s7; an unmatched click "
        "emits (click_id, NULL) only when the watermark passes its join-"
        "window end and evicts its state, so unmatched clicks whose "
        "window end reaches the final resting watermark are never "
        "emitted — and because each side's watermark tracks only its "
        "OWN event type, the global watermark is the MIN of the two "
        "(Spark's multiple-watermark policy). The oracle encodes "
        "exactly that, making the outer-eviction semantics part of "
        "the hash (s9 discipline)"
    ),
    tables=("events",),
)
def s11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming import run_s11_left_outer_join

    return run_s11_left_outer_join(spark, sf_dir)


@register(
    "s12_python_stream_source",
    """
    SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY 1 ORDER BY event_type
    """,
    doc=(
        "replay through the PYTHON STREAMING data source "
        "(SimpleDataSourceStreamReader, the streaming half of the "
        "Spark 4 Python DataSource API — cs11 is the batch half): one "
        "chunk per micro-batch via chunk-index offsets, update-mode "
        "per-type counts; the converged state must equal the batch "
        "aggregate"
    ),
    tables=("events",),
)
def s12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming import (
        run_s12_python_stream_source,
    )

    return run_s12_python_stream_source(spark, sf_dir)


@register(
    "s13_partitioned_stream_source",
    """
    SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY 1 ORDER BY event_type
    """,
    doc=(
        "replay through the PARTITION-PLANNED Python streaming source "
        "(DataSourceStreamReader — the firehose path the simple s12 "
        "reader documents): the driver plans one InputPartition per "
        "chunk row group from parquet FOOTERS; executors read the row "
        "data, so no row ever transits the driver; same update-mode "
        "counts converging to the batch aggregate"
    ),
    tables=("events",),
)
def s13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming import (
        run_s13_partitioned_stream_source,
    )

    return run_s13_partitioned_stream_source(spark, sf_dir)


def _s14_sql() -> str:
    from osm_changesets_to_parquet_spark.queries.dedup_sim import (
        _SQL_SHINGLE_HASHES,
        _SQL_TOK,
    )
    from osm_changesets_to_parquet_spark.streaming.jobs import N_DOC_CHUNKS

    return f"""
WITH ch AS (SELECT doc_id, NTILE({N_DOC_CHUNKS}) OVER (ORDER BY doc_id) AS c FROM documents),
tok AS ({_SQL_TOK}),
sh AS (SELECT doc_id, list_distinct({_SQL_SHINGLE_HASHES}) AS hs FROM tok),
ex AS (SELECT doc_id, unnest(hs) AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ex GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS new_id, b.doc_id AS old_id, COUNT(*) AS n_inter
  FROM ex a JOIN ex b ON a.h = b.h
  JOIN ch ca ON ca.doc_id = a.doc_id
  JOIN ch cb ON cb.doc_id = b.doc_id
  WHERE ca.c > cb.c
  GROUP BY 1, 2
)
SELECT new_id, old_id,
       ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) AS jac
FROM inter
JOIN sizes sa ON sa.doc_id = new_id
JOIN sizes sb ON sb.doc_id = old_id
WHERE ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.6
ORDER BY new_id, old_id
"""


@register(
    "s14_streaming_neardup",
    _s14_sql(),
    doc=(
        "STREAMING near-dup ingestion: documents replay in 4 NTILE "
        "chunks; each micro-batch probes the banded-signature index "
        "accumulated from every earlier batch (the q142 persisted-index "
        "probe) then appends its own bands under an idempotent __bid=N "
        "label — exactly-once index growth on at-least-once "
        "foreachBatch.  Emitted pairs = cross-batch near-dups "
        "(chunk(new) > chunk(old)), exact in-row Jaccard >= 0.6; "
        "oracle is the brute-force cross-chunk Jaccard (q139's "
        "calibration discipline — banding recall 1.0 is a pair-level "
        "property of these fixtures, independent of the split)"
    ),
    tables=("documents",),
)
def s14(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from osm_changesets_to_parquet_spark.queries.dedup_sim import (
        _Q68B_CALIBRATED_SFS,
    )
    from osm_changesets_to_parquet_spark.streaming import (
        run_s14_streaming_neardup,
    )

    base = os.path.basename(os.path.normpath(sf_dir))
    if base not in _Q68B_CALIBRATED_SFS:
        raise FixtureGateError(
            f"s14_streaming_neardup is calibration-pinned (verified at "
            f"{sorted(_Q68B_CALIBRATED_SFS)}); fixture {base!r} needs an LSH "
            "recall re-sweep before the exact oracle is meaningful"
        )
    return run_s14_streaming_neardup(spark, sf_dir)


@register(
    "s15_streaming_quality_router",
    r"""
    WITH scored AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             ROUND(length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g'))
               / GREATEST(length(text), 1), 6) AS punct_ratio
      FROM documents
    )
    SELECT CASE WHEN n_tokens >= 40 AND punct_ratio <= 0.05
                THEN 'accept' ELSE 'quarantine' END AS disposition,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM scored GROUP BY 1 ORDER BY disposition
    """,
    doc=(
        "streaming quality ROUTER (continuous-curation front door): the "
        "documents replay streams through the t42 scorer and each "
        "micro-batch is written ONCE, dynamically partitioned by "
        "disposition (accept vs quarantine) under an idempotent __bid=N "
        "dir — a partitionBy fan-out, not one job per sink; routing is "
        "a pure per-row predicate so the batch oracle replays it "
        "exactly (streaming/jobs.py run_s15_streaming_quality_router)"
    ),
    tables=("documents",),
)
def s15(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming import (
        run_s15_streaming_quality_router,
    )

    return run_s15_streaming_quality_router(spark, sf_dir)


_S16_SQL = """
WITH o AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
  FROM events
),
t AS (
  SELECT src, event_type AS dst, COUNT(*) AS cnt
  FROM o WHERE src IS NOT NULL GROUP BY 1, 2
)
SELECT src, dst, CAST(cnt AS BIGINT) AS cnt,
       ROUND(cnt / CAST(SUM(cnt) OVER (PARTITION BY src) AS DOUBLE), 6) AS prob
FROM t ORDER BY src, dst
"""


@register(
    "s16_streaming_transitions",
    _S16_SQL,
    doc=(
        "STREAMING first-order transition matrix (q156's streaming "
        "twin): per-user LAST-EVENT state via applyInPandasWithState — "
        "one tuple per user, bounded by population not stream length; "
        "each micro-batch chains its (ts_us, event_id)-sorted rows "
        "onto the stored last event and emits per-batch (src,dst) "
        "counts, reduced distributedly across batches.  The replay "
        "fixture arrives in event-time order, so the converged matrix "
        "equals the batch oracle exactly "
        "(streaming/jobs.py run_s16_streaming_transitions)"
    ),
    tables=("events",),
)
def s16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming import (
        run_s16_streaming_transitions,
    )

    return run_s16_streaming_transitions(spark, sf_dir)


_S17_SQL = """
WITH c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS cus
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pus
  FROM events WHERE event_type = 'purchase'
),
wm AS (
  SELECT LEAST(MAX(epoch_us(ts)) FILTER (WHERE event_type = 'click'),
               MAX(epoch_us(ts)) FILTER (WHERE event_type = 'purchase'))
         - 600000000 AS w
  FROM events
),
matched AS (
  SELECT c.click_id, p.purchase_id, c.user_id
  FROM c JOIN p ON p.user_id = c.user_id
   AND pus > cus AND pus <= cus + 300000000
),
unmatched_c AS (
  SELECT c.click_id, CAST(NULL AS BIGINT) AS purchase_id, c.user_id
  FROM c, wm
  WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.click_id = c.click_id)
    AND cus + 300000000 < wm.w
),
unmatched_p AS (
  SELECT CAST(NULL AS BIGINT) AS click_id, p.purchase_id, p.user_id
  FROM p, wm
  WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.purchase_id = p.purchase_id)
    AND pus < wm.w
)
SELECT click_id, purchase_id, user_id FROM matched
UNION ALL
SELECT click_id, purchase_id, user_id FROM unmatched_c
UNION ALL
SELECT click_id, purchase_id, user_id FROM unmatched_p
ORDER BY click_id, purchase_id
"""


@register(
    "s17_full_outer_stream_join",
    _S17_SQL,
    doc=(
        "FULL OUTER stream-stream join — the s7/s11 interval join "
        "completed on both sides: unmatched clicks emit (id, NULL) "
        "when the min-of-per-stream watermarks passes click_ts + 5min "
        "(their join-window end), unmatched purchases emit (NULL, id) "
        "when it passes purchase_ts (the last click time that could "
        "still match); rows whose bound reaches the resting watermark "
        "stay live and never emit.  The oracle encodes BOTH eviction "
        "bounds, making the two-sided outer semantics part of the hash "
        "(streaming/jobs.py run_s17_full_outer_join)"
    ),
    tables=("events",),
)
def s17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming import run_s17_full_outer_join

    return run_s17_full_outer_join(spark, sf_dir)


def _s18_sql() -> str:
    from osm_changesets_to_parquet_spark.queries.sketches import _Q80_SQL

    return _Q80_SQL


@register(
    "s18_streaming_cms",
    _s18_sql(),
    doc=(
        "STREAMING Count-Min sketch maintenance (q80's continuous "
        "twin): the document replay's tokens fold into the 4x1024 "
        "counter table through an update-mode streaming aggregation — "
        "the sketch IS the state, bounded at depth x width rows for "
        "any stream length; counter addition commutes with micro-"
        "batching, so the final streamed counters equal the batch "
        "sketch EXACTLY and the top-20 estimates hash-match q80's "
        "batch SQL oracle verbatim"
    ),
    tables=("documents",),
)
def s18(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming import run_s18_streaming_cms

    return run_s18_streaming_cms(spark, sf_dir)


@register(
    "s19_streaming_conversions",
    """
    WITH ev AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
    ),
    m AS (
      SELECT p.user_id, p.event_id, p.us,
             (SELECT v.us FROM ev v
               WHERE v.user_id = p.user_id AND v.event_type = 'view'
                 AND (v.us, v.event_id) < (p.us, p.event_id)
               ORDER BY v.us DESC, v.event_id DESC LIMIT 1) AS vus
      FROM ev p WHERE p.event_type = 'purchase'
    )
    SELECT user_id, event_id AS purchase_event_id,
           CAST(us - vus AS BIGINT) AS gap_us
    FROM m WHERE vus IS NOT NULL AND us - vus <= 3600000000
    ORDER BY purchase_event_id
    """,
    doc=(
        "STREAMING pattern detection (the CEP / MATCH_RECOGNIZE "
        "shape): purchase within 1h of the user's most recent view "
        "emits a conversion as it happens — keyed state is ONE "
        "timestamp per user, bounded by the population, where the "
        "equivalent interval stream-join buffers a full window of "
        "rows; oracle is the as-of correlated subquery over the same "
        "(ts, event_id) total order"
    ),
    tables=("events",),
)
def s19(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming import (
        run_s19_streaming_conversions,
    )

    return run_s19_streaming_conversions(spark, sf_dir)


@register(
    "s20_python_stream_sink",
    """
    SELECT event_type, COUNT(*) AS cnt,
           ROUND(SUM(value), 2) AS sum_value,
           MIN(event_id) AS min_id, MAX(event_id) AS max_id
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc=(
        "STREAMING WRITE through the Python DataSource API — the "
        "fourth quadrant (cs11 batch read / s13 stream read / cs12 "
        "batch write): the events replay streams into executor-written "
        "parquet chunks; each epoch's driver commit atomically "
        "publishes _MANIFEST-{batchId}.json, and the read-back honors "
        "ONLY manifests — torn epochs invisible, lossless end-to-end "
        "vs the same aggregate over the source table"
    ),
    tables=("events",),
)
def s20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming import (
        run_s20_python_stream_sink,
    )

    return run_s20_python_stream_sink(spark, sf_dir)


@register(
    "s21_streaming_topk",
    """
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY user_id
    ORDER BY cnt DESC, user_id LIMIT 10
    """,
    doc=(
        "STREAMING global top-k (q24's continuous twin): per-user "
        "counts accumulate through an update-mode streaming "
        "aggregation whose state is one counter per user — bounded by "
        "the key population, not the stream length; counter addition "
        "commutes with micro-batching, so the streamed counts equal "
        "the batch counts EXACTLY and the final "
        "max-__bid-per-key + TakeOrdered(k) hash-matches the batch "
        "top-10 oracle (streaming/jobs.py run_s21_streaming_topk)"
    ),
    tables=("events",),
)
def s21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming import run_s21_streaming_topk

    return run_s21_streaming_topk(spark, sf_dir)


# ---------------------------------------------------------------------------
# s22: streaming anomaly flags against PRIOR-batch moments (round 7)
# ---------------------------------------------------------------------------

_S22_SQL = """
WITH e AS (
  SELECT event_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events
),
idx AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (ORDER BY ts_us, event_id) - 1 AS rn,
         COUNT(*) OVER () AS n
  FROM e
),
ch AS (
  SELECT event_type, v,
         rn // CAST(CEIL(n * 1.0 / 5) AS BIGINT) AS chunk
  FROM idx
),
roll AS (
  SELECT event_type, chunk,
         CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(v) AS BIGINT) AS s1,
         CAST(SUM(v * v) AS BIGINT) AS s2
  FROM ch GROUP BY 1, 2
),
prior AS (
  SELECT event_type, chunk,
         CAST(COALESCE(SUM(c) OVER w, 0) AS BIGINT) AS pn,
         CAST(COALESCE(SUM(s1) OVER w, 0) AS BIGINT) AS ps1,
         CAST(COALESCE(SUM(s2) OVER w, 0) AS BIGINT) AS ps2,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY chunk) AS seq
  FROM roll
  WINDOW w AS (PARTITION BY event_type ORDER BY chunk
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT c.event_type,
       CAST(p.seq AS BIGINT) AS batch_seq,
       CAST(COUNT(*) AS BIGINT) AS n_batch,
       CAST(SUM(CASE WHEN p.pn >= 30
                  AND CAST(c.v * p.pn - p.ps1 AS HUGEINT)
                      * CAST(c.v * p.pn - p.ps1 AS HUGEINT)
                      * (p.pn - 1)
                    > 4 * CAST(p.pn AS HUGEINT)
                      * (CAST(p.pn AS HUGEINT) * p.ps2
                         - CAST(p.ps1 AS HUGEINT) * p.ps1)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM ch c JOIN prior p ON p.event_type = c.event_type AND p.chunk = c.chunk
GROUP BY c.event_type, p.seq
ORDER BY c.event_type, batch_seq
"""


@register(
    "s22_streaming_anomaly",
    _S22_SQL,
    doc=(
        "STREAMING anomaly screening (q221's continuous twin, with "
        "the defining online-detector twist no other s-job exercises: "
        "each batch is judged against the state BEFORE the batch "
        "updates it, so an anomaly cannot mask itself by inflating "
        "the variance it is scored against): per-type "
        "applyInPandasWithState carrying (batches, n, s1, s2) cents "
        "power sums; the z^2>4 flag is the division-free inequality "
        "(v*n-s1)^2*(n-1) > 4n(n*s2-s1^2), evaluated in "
        "arbitrary-precision Python ints engine-side and HUGEINT "
        "oracle-side — exact at any scale; the oracle reconstructs "
        "the 5-chunk replay via the (ts_us,event_id) global order "
        "and an exclusive cumulative window "
        "(streaming/jobs.py run_s22_streaming_anomaly)"
    ),
    tables=("events",),
)
def s22(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming import (
        run_s22_streaming_anomaly,
    )

    return run_s22_streaming_anomaly(spark, sf_dir)


# ---------------------------------------------------------------------------
# s23: checkpoint crash-recovery witness (round 8)
# ---------------------------------------------------------------------------


@register(
    "s23_stream_crash_recovery",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents,
           TRUE AS recovered
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc=(
        "STREAMING crash recovery (exactly-once ACROSS RESTARTS): a "
        "checkpointed update-mode per-type aggregation is killed "
        "mid-replay by an injected failure placed BETWEEN the sink's "
        "physical write and the checkpoint commit (the worst spot: "
        "offsets uncommitted, output already on disk), restarted from "
        "the same checkpoint, and the recovered final state "
        "hash-matches the uninterrupted batch aggregate — state rolls "
        "back to the last committed store version and the replayed "
        "batch is absorbed by the sink's overwrite-by-batch-id "
        "idempotency (streaming/jobs.py run_s23_crash_recovery); "
        "integer-cents sums keep the equality bit-exact"
    ),
    tables=("events",),
)
def s23(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming import (
        run_s23_crash_recovery,
    )

    return run_s23_crash_recovery(spark, sf_dir)


# ---------------------------------------------------------------------------
# s24: streaming point-in-time enrichment (round 8)
# ---------------------------------------------------------------------------


@register(
    "s24_stream_pit_enrich",
    """
    WITH chg AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             CAST(ROUND(value * 100) AS BIGINT) AS attr
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
    """,
    doc=(
        "STREAMING point-in-time enrichment (q300's online twin — the "
        "feature-store materialization path): per-user state holds the "
        "latest signup's cents-attribute; each micro-batch's purchases "
        "are tagged with the attribute active at their EVENT time, "
        "applying rows in (ts, kind, id) order with signups before "
        "same-instant purchases — leakage-free online, and because "
        "forward-fill commutes with event-time-ordered micro-batching "
        "the streamed result hash-matches the batch as-of oracle "
        "exactly (streaming/jobs.py run_s24_stream_pit); state is "
        "three scalars per user, bounded by the entity population"
    ),
    tables=("events",),
)
def s24(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming import run_s24_stream_pit

    return run_s24_stream_pit(spark, sf_dir)


# ---------------------------------------------------------------------------
# s25: streaming mergeable quantile sketch + error audit (round 8)
# ---------------------------------------------------------------------------

_S25_SQL = """
WITH v AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
hist AS (
  SELECT LEAST(c // 64, 1023) AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM v GROUP BY 1
),
hcum AS (
  SELECT bin, SUM(cnt) OVER (ORDER BY bin
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum
  FROM hist
),
vcum AS (
  SELECT c, SUM(cnt) OVER (ORDER BY c
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cum
  FROM (SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY c)
),
q AS (SELECT UNNEST(ARRAY[5000, 9000, 9900]) AS q_bp),
r AS (
  SELECT q_bp, CAST(CEIL(q_bp * st.n / 10000.0) AS BIGINT) AS rk
  FROM q, st
),
approx AS (
  SELECT r.q_bp, MIN(CASE WHEN h.cum >= r.rk THEN h.bin END) AS bin
  FROM r, hcum h GROUP BY r.q_bp
),
exact AS (
  SELECT r.q_bp, MIN(CASE WHEN x.cum >= r.rk THEN x.c END) AS exact_cents
  FROM r, vcum x GROUP BY r.q_bp
)
SELECT a.q_bp,
       CAST(e.exact_cents AS BIGINT) AS exact_cents,
       CAST(a.bin * 64 AS BIGINT) AS approx_lo_cents,
       CAST(e.exact_cents - a.bin * 64 AS BIGINT) AS err_cents,
       e.exact_cents >= a.bin * 64 AND e.exact_cents < (a.bin + 2) * 64
         AS within_bound
FROM approx a JOIN exact e ON e.q_bp = a.q_bp
ORDER BY a.q_bp
"""


@register(
    "s25_stream_quantile_sketch",
    _S25_SQL,
    doc=(
        "STREAMING mergeable quantile sketch (q312's continuous twin): "
        "micro-batches fold into a fixed 1024-bin equi-width histogram "
        "through an update-mode streaming aggregation — state bounded "
        "at 1024 counters forever, the defining mergeable-summary "
        "property — with the bin domain pinned A PRIORI ([0, 65536) "
        "cents, 64/bin; a stream cannot size bins from min/max the "
        "way batch q312 does).  Counter addition commutes with "
        "micro-batching, so the streamed histogram equals the batch "
        "one exactly; P50/P90/P99 read-offs are audited against exact "
        "value-domain ranks (range-bucketed global cumsum) with the "
        "one-bin-width bound (streaming/jobs.py "
        "run_s25_streaming_quantile_sketch)"
    ),
    tables=("events",),
)
def s25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming import (
        run_s25_streaming_quantile_sketch,
    )

    return run_s25_streaming_quantile_sketch(spark, sf_dir)


# ---------------------------------------------------------------------------
# s26: lambda-architecture backfill/cutover reconciliation (round 8)
# ---------------------------------------------------------------------------

_S26_CUT = 1_705_276_800_000_000  # 2024-01-15T00:00:00Z

_S26_SQL = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS t,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_type,
       CAST(SUM(CASE WHEN t <= {_S26_CUT} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_batch,
       CAST(SUM(CASE WHEN t > {_S26_CUT} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stream,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS value_cents
FROM e GROUP BY event_type ORDER BY event_type
"""


@register(
    "s26_backfill_cutover",
    _S26_SQL,
    doc=(
        "lambda-architecture backfill/cutover reconciliation: a batch "
        "backfill aggregates history at-or-before the 2024-01-15 "
        "cutover, an availableNow STREAM aggregates strictly after it "
        "(the time filter pushed into the streaming source), and the "
        "serving table merges the two integer-(count, cents) partials "
        "per key — the mergeable-aggregate contract (q100/q154's "
        "batch-increment property) applied across the batch/stream "
        "seam.  The oracle is the pure whole-table aggregate, so the "
        "witnessed property is the boundary rule every migration gets "
        "wrong once: <=/> partitions EXACTLY (inclusive-inclusive "
        "double-counts the boundary, exclusive-exclusive drops it — "
        "either hash-mismatches); streaming/jobs.py "
        "run_s26_backfill_cutover"
    ),
    tables=("events",),
)
def s26(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.streaming import (
        run_s26_backfill_cutover,
    )

    return run_s26_backfill_cutover(spark, sf_dir)
