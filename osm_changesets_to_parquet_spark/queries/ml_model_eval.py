"""ML-eval family module: classifier evaluation and deterministic model
fitting — operating points, calibration, CV, stumps/IRLS/EM/AdaBoost.

Split from queries/ml_eval.py (round 9, VERDICT r08 item 7) along the
family seams with ZERO behavior change — every block below is the
verbatim registration it had there; only the module boundary moved.

The reference engine (/root/reference/src/main.rs — a 456-line
XML->parquet converter) has no analytics surface; these queries extend
the engine the way a training-data/eval pipeline needs (SURVEY §2.C).
This module holds ONE family of that surface (the round-9 split of
the old era-grouped queries/ml_eval.py; siblings: ml_stat_tests,
ml_experiments, ml_model_eval, ml_timeseries, ml_corpus).  Common shape:
everything is spelled as shuffles over SMALL rollups (contingency
cells, threshold grids, sufficient statistics, vocabulary counts),
never per-row global sorts — and the handful of inherently-sequential
recurrences (Holt, token bucket) run per-key inside one applyInPandas
with recursive-CTE oracles.

House determinism rules (SURVEY §2.B):
- rank statistics are computed from CONTINGENCY COUNTS with integer
  doubled-ranks (2*rank is an exact BIGINT even for .5 average
  ranks), so every engine sums the same integers in any order;
- continuous values are quantized to integer cents BEFORE power sums
  (double summation is order-dependent across engines; integer
  summation is not);
- ln()-derived quantities are ROUND()ed at 6 dp before composition
  (the q129 discipline) and argmax comparisons get extra slack (4 dp)
  plus a total-order tie-break.
"""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.catalog import load_table
from osm_changesets_to_parquet_spark.operators.nbayes import naive_bayes_predict
from osm_changesets_to_parquet_spark.operators.quality import (
    hash_bucket,
    sql_hash_bucket,
)
from osm_changesets_to_parquet_spark.queries import register

# ---------------------------------------------------------------------------
# q233: operating-point sweep (precision/recall/F1 per threshold)
# ---------------------------------------------------------------------------

_Q233_THRESHOLDS = (1, 5, 10, 20, 50, 100, 200)

_Q233_SQL = f"""
WITH t(thr) AS (
  SELECT * FROM (VALUES {", ".join(f"({t})" for t in _Q233_THRESHOLDS)}) v(thr)
),
base AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos, value
  FROM events
)
SELECT CAST(thr AS BIGINT) AS thr,
       CAST(SUM(CASE WHEN pos = 1 AND value >= thr THEN 1 ELSE 0 END)
            AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN pos = 0 AND value >= thr THEN 1 ELSE 0 END)
            AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN pos = 1 AND value < thr THEN 1 ELSE 0 END)
            AS BIGINT) AS fn,
       ROUND(SUM(CASE WHEN pos = 1 AND value >= thr THEN 1 ELSE 0 END) * 1.0
             / NULLIF(SUM(CASE WHEN value >= thr THEN 1 ELSE 0 END), 0),
             6) AS precision_,
       ROUND(SUM(CASE WHEN pos = 1 AND value >= thr THEN 1 ELSE 0 END) * 1.0
             / NULLIF(SUM(pos), 0), 6) AS recall_,
       ROUND(2.0 * SUM(CASE WHEN pos = 1 AND value >= thr THEN 1 ELSE 0 END)
             / NULLIF(2 * SUM(CASE WHEN pos = 1 AND value >= thr THEN 1 ELSE 0
                              END)
                      + SUM(CASE WHEN pos = 0 AND value >= thr THEN 1 ELSE 0
                            END)
                      + SUM(CASE WHEN pos = 1 AND value < thr THEN 1 ELSE 0
                            END), 0), 6) AS f1
FROM base CROSS JOIN t
GROUP BY thr ORDER BY thr
"""


@register(
    "q233_threshold_sweep",
    _Q233_SQL,
    doc=(
        "classifier operating-point sweep (is the event a purchase, "
        "scored by its value): TP/FP/FN + precision/recall/F1 at 7 "
        "thresholds in ONE scan — each threshold is a pair of "
        "conditional sums in a single aggregate (map-side combined to "
        "one 14-column row), then the 1-row frame is unpivoted with "
        "stack(); the oracle's VALUES-cross-join rescans per "
        "threshold, the engine never does"
    ),
    tables=("events",),
)
def q233(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pos = F.col("event_type") == "purchase"
    aggs = []
    for t in _Q233_THRESHOLDS:
        hit = F.col("value") >= t
        aggs.append(
            F.sum(F.when(pos & hit, 1).otherwise(0)).alias(f"tp_{t}")
        )
        aggs.append(
            F.sum(F.when(~pos & hit, 1).otherwise(0)).alias(f"fp_{t}")
        )
        aggs.append(
            F.sum(F.when(pos & ~hit, 1).otherwise(0)).alias(f"fn_{t}")
        )
    one = ev.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({t} AS BIGINT), tp_{t}, fp_{t}, fn_{t}"
        for t in _Q233_THRESHOLDS
    )
    rows = one.selectExpr(
        f"stack({len(_Q233_THRESHOLDS)}, {stack_args}) AS (thr, tp, fp, fn)"
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return (
        rows.select(
            "thr",
            "tp",
            "fp",
            "fn",
            F.round(tp * 1.0 / F.nullif(tp + fp, F.lit(0)), 6).alias(
                "precision_"
            ),
            F.round(tp * 1.0 / F.nullif(tp + fn, F.lit(0)), 6).alias(
                "recall_"
            ),
            F.round(
                2.0 * tp / F.nullif(2 * tp + fp + fn, F.lit(0)), 6
            ).alias("f1"),
        )
        .orderBy("thr")
    )


# ---------------------------------------------------------------------------
# q235: multinomial naive Bayes (train on 80% split, confuse on 20%)
# ---------------------------------------------------------------------------

_Q235_TRAIN_PCT = 80

_Q235_SQL = f"""
WITH train AS (
  SELECT doc_id, lang, text FROM documents
  WHERE {sql_hash_bucket("doc_id", 100)} < {_Q235_TRAIN_PCT}
),
test AS (
  SELECT doc_id, lang, text FROM documents
  WHERE {sql_hash_bucket("doc_id", 100)} >= {_Q235_TRAIN_PCT}
),
ttok AS (
  SELECT t.doc_id, t.lang, u.w
  FROM train t, UNNEST(string_split(t.text, ' ')) AS u(w)
),
c AS (
  SELECT w, lang, CAST(COUNT(*) AS BIGINT) AS c FROM ttok GROUP BY w, lang
),
nl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_l FROM c GROUP BY lang),
vocab AS (SELECT DISTINCT w FROM c),
v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
prior AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS d_l FROM train GROUP BY lang
),
ptot AS (SELECT CAST(SUM(d_l) AS BIGINT) AS d FROM prior),
langs AS (
  SELECT p.lang,
         ROUND(LN(CAST(p.d_l AS DOUBLE) / ptot.d), 6) AS prior_ln,
         ROUND(LN(CAST(nl.n_l AS DOUBLE) + v.v), 6) AS denom_ln
  FROM prior p CROSS JOIN ptot CROSS JOIN v
  JOIN nl ON nl.lang = p.lang
),
stok AS (
  SELECT t.doc_id, t.lang AS true_lang, u.w
  FROM test t, UNNEST(string_split(t.text, ' ')) AS u(w)
),
iv AS (
  SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_iv
  FROM stok s WHERE EXISTS (SELECT 1 FROM vocab vb WHERE vb.w = s.w)
  GROUP BY s.doc_id
),
matched AS (
  SELECT s.doc_id, c.lang, ROUND(SUM(LN(CAST(c.c + 1 AS DOUBLE))), 6)
           AS sum_ln
  FROM stok s JOIN c ON c.w = s.w
  GROUP BY s.doc_id, c.lang
),
scored AS (
  SELECT d.doc_id, d.true_lang, l.lang,
         l.prior_ln + COALESCE(m.sum_ln, 0)
           - COALESCE(i.n_iv, 0) * l.denom_ln AS score
  FROM (SELECT doc_id, lang AS true_lang FROM test) d
  CROSS JOIN langs l
  LEFT JOIN matched m ON m.doc_id = d.doc_id AND m.lang = l.lang
  LEFT JOIN iv i ON i.doc_id = d.doc_id
),
pred AS (
  SELECT doc_id, true_lang, lang AS pred_lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY ROUND(score, 4) DESC, lang) AS rk
  FROM scored
)
SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM pred WHERE rk = 1
GROUP BY true_lang, pred_lang
ORDER BY true_lang, pred_lang
"""


@register(
    "q235_naive_bayes",
    _Q235_SQL,
    doc=(
        "multinomial naive Bayes language classifier trained on the "
        "deterministic 80% id-hash split and confused on the held-out "
        "20%: Laplace-smoothed per-(token,lang) counts keyed by token "
        "(vocabulary-sized shuffle), and the ln(c+1)-ln(N_l+V) "
        "factoring means only MATCHED (token,lang) pairs ever join — "
        "zero-count tokens contribute ln(1)=0 so the vocab x langs "
        "cross product is never materialized; ln-derived scalars are "
        "rounded at 6 dp before composition and the per-doc argmax "
        "orders by ROUND(score,4) with a lang tie-break (the q129 "
        "libm discipline); output is the |langs|^2 confusion matrix "
        "— NOTE the fixture's text is label-free (uniform random "
        "tokens), so fixture accuracy sits at the prior by "
        "construction: the contract here is the exact smoothed-model "
        "arithmetic (pinned against a Counter reimplementation and "
        "a planted-vocabulary synthetic corpus in tests)"
    ),
    tables=("documents",),
)
def q235(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket("doc_id", 100)
    train = docs.where(bucket < _Q235_TRAIN_PCT)
    test = docs.where(bucket >= _Q235_TRAIN_PCT)
    pred = naive_bayes_predict(train, test)
    return (
        pred.select(
            F.col("true_label").alias("true_lang"),
            F.col("pred_label").alias("pred_lang"),
        )
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# q239: calibration bins + Brier score for a pseudo-probability
# ---------------------------------------------------------------------------

_Q239_SQL = """
WITH scored AS (
  SELECT CAST(FLOOR(value * 10000 / (value + 50)) AS BIGINT) AS s_bp,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
)
SELECT CAST(FLOOR(s_bp / 1000.0) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(s_bp) AS DOUBLE) / (COUNT(*) * 10000.0), 6)
         AS mean_pred,
       ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS frac_pos,
       ROUND(CAST(SUM((s_bp - 10000 * y) * (s_bp - 10000 * y)) AS DOUBLE)
             / (COUNT(*) * 100000000.0), 6) AS brier
FROM scored GROUP BY 1 ORDER BY 1
"""


@register(
    "q239_calibration_bins",
    _Q239_SQL,
    doc=(
        "reliability diagram + per-bin Brier score for the "
        "value-derived pseudo-probability s = v/(v+50) of an event "
        "being a purchase: the score is quantized to integer BASIS "
        "POINTS at the scan (FLOOR of a deterministic double), so "
        "every downstream sum — mean prediction, positive rate, and "
        "the Brier (s_bp - 10000y)^2 — is exact order-independent "
        "integer arithmetic; one scan, |bins| output rows"
    ),
    tables=("events",),
)
def q239(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.floor(
            F.col("value") * 10000 / (F.col("value") + 50)
        ).cast("long").alias("s_bp"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    err = F.col("s_bp") - 10000 * F.col("y")
    return (
        scored.groupBy(
            F.floor(F.col("s_bp") / 1000.0).cast("long").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum("s_bp").cast("double") / (F.count(F.lit(1)) * 10000.0), 6
            ).alias("mean_pred"),
            F.round(
                F.sum("y").cast("double") / F.count(F.lit(1)), 6
            ).alias("frac_pos"),
            F.round(
                F.sum(err * err).cast("double")
                / (F.count(F.lit(1)) * 100000000.0),
                6,
            ).alias("brier"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q246: split-conformal prediction intervals (per-type, integer-exact)
# ---------------------------------------------------------------------------

_Q246_ALPHA_PCT = 10  # target 90% coverage

_Q246_SQL = f"""
WITH e AS (
  SELECT event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS v,
         {sql_hash_bucket("event_id", 100)} AS b
  FROM events
),
model AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_t,
         CAST(SUM(v) AS BIGINT) AS s1
  FROM e WHERE b < 60 GROUP BY event_type
),
cal AS (
  SELECT e.event_type, ABS(e.v * m.n_t - m.s1) AS resid, m.n_t, m.s1
  FROM e JOIN model m ON m.event_type = e.event_type
  WHERE e.b >= 60 AND e.b < 80
),
qidx AS (
  SELECT event_type, n_t, s1,
         CAST(COUNT(*) AS BIGINT) AS n_cal,
         ((COUNT(*) + 1) * (100 - {_Q246_ALPHA_PCT}) + 99) // 100 AS k
  FROM cal GROUP BY event_type, n_t, s1
),
qhat AS (
  SELECT c.event_type, q.n_cal, q.n_t, q.s1, c.resid AS qh
  FROM (
    SELECT event_type, resid,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY resid) AS rn
    FROM cal
  ) c JOIN qidx q ON q.event_type = c.event_type AND c.rn = q.k
),
test AS (
  SELECT e.event_type,
         CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN ABS(e.v * h.n_t - h.s1) <= h.qh
                       THEN 1 ELSE 0 END) AS BIGINT) AS covered
  FROM e JOIN qhat h ON h.event_type = e.event_type
  WHERE e.b >= 80 GROUP BY e.event_type
)
SELECT h.event_type, h.n_cal, t.n_test,
       ROUND(CAST(h.qh AS DOUBLE) / h.n_t / 100, 4) AS qhat_value,
       ROUND(CAST(t.covered AS DOUBLE) / t.n_test, 4) AS coverage
FROM qhat h JOIN test t ON t.event_type = h.event_type
ORDER BY h.event_type
"""


@register(
    "q246_conformal_interval",
    _Q246_SQL,
    doc=(
        "split-conformal prediction intervals per type (model = "
        "train-split mean, nonconformity = |value - mean|): the "
        "60/20/20 hash split is the q70 discipline; residuals are "
        "SCALED to |v*n_t - s1| so every comparison is EXACT integer "
        "arithmetic (the per-type scale factor is order-preserving), "
        "q-hat is the ceil((n+1)(1-alpha))-th order statistic via a "
        "per-type rank window (bounded by the calibration split; "
        "respell through packing.global_rank if one type outgrows an "
        "executor), and held-out coverage must land near 1-alpha — "
        "the conformal guarantee (Vovk; Angelopoulos & Bates 2023)"
    ),
    tables=("events",),
)
def q246(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v"),
        hash_bucket("event_id", 100).alias("b"),
    )
    model = (
        e.where(F.col("b") < 60)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_t"), F.sum("v").alias("s1"))
    )
    cal = (
        e.where((F.col("b") >= 60) & (F.col("b") < 80))
        .join(F.broadcast(model), "event_type")
        .select(
            "event_type",
            F.abs(F.col("v") * F.col("n_t") - F.col("s1")).alias("resid"),
            "n_t",
            "s1",
        )
    )
    qidx = cal.groupBy("event_type", "n_t", "s1").agg(
        F.count(F.lit(1)).alias("n_cal"),
    ).withColumn(
        "k",
        F.expr(f"((n_cal + 1) * (100 - {_Q246_ALPHA_PCT}) + 99) div 100"),
    )
    w = Window.partitionBy("event_type").orderBy("resid")
    ranked = cal.select(
        F.col("event_type").alias("et_r"),
        "resid",
        F.row_number().over(w).alias("rn"),
    )
    qhat = ranked.join(
        F.broadcast(qidx),
        (F.col("et_r") == F.col("event_type")) & (F.col("rn") == F.col("k")),
    ).select(
        "event_type",
        "n_cal",
        "n_t",
        "s1",
        F.col("resid").alias("qh"),
    )
    test = (
        e.where(F.col("b") >= 80)
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("v") * F.col("n_t") - F.col("s1"))
                    <= F.col("qh"),
                    1,
                ).otherwise(0)
            ).alias("covered"),
        )
    )
    return (
        qhat.join(test, "event_type")
        .select(
            "event_type",
            "n_cal",
            "n_test",
            F.round(F.col("qh").cast("double") / F.col("n_t") / 100, 4).alias(
                "qhat_value"
            ),
            F.round(
                F.col("covered").cast("double") / F.col("n_test"), 4
            ).alias("coverage"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q251: leave-one-out target encoding (the leakage-safe spelling)
# ---------------------------------------------------------------------------

_Q251_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
              AS BIGINT) AS dow,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events
),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_t,
         CAST(SUM(v) AS BIGINT) AS s_t
  FROM e GROUP BY event_type
),
enc AS (
  SELECT e.dow,
         CAST(s.s_t - e.v AS DOUBLE) / (s.n_t - 1) AS loo,
         e.v
  FROM e JOIN stats s ON s.event_type = e.event_type
)
SELECT dow,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(loo) / 100, 4) AS mean_loo,
       ROUND(MIN(loo) / 100, 4) AS min_loo,
       ROUND(MAX(loo) / 100, 4) AS max_loo
FROM enc GROUP BY dow ORDER BY dow
"""


@register(
    "q251_target_encoding_loo",
    _Q251_SQL,
    doc=(
        "leave-one-out target encoding of event_type by mean value "
        "(the leakage-safe categorical featurization: each row's "
        "encoding (s_t - v)/(n_t - 1) EXCLUDES its own target, so "
        "the feature never memorizes the row): per-type (n, s) "
        "integer sums broadcast back onto the scan — one rollup + "
        "one map-side join, the encoded column never shuffles; "
        "reported as per-dow distribution of the encodings "
        "(cross-grouping shows the encoding varies only through "
        "composition, the no-leakage signature)"
    ),
    tables=("events",),
)
def q251(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        (
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            % 7
        ).cast("long").alias("dow"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_t"), F.sum("v").alias("s_t")
    )
    loo = (F.col("s_t") - F.col("v")).cast("double") / (F.col("n_t") - 1)
    enc = e.join(F.broadcast(stats), "event_type").select(
        "dow", loo.alias("loo")
    )
    return (
        enc.groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("loo") / 100, 4).alias("mean_loo"),
            F.round(F.min("loo") / 100, 4).alias("min_loo"),
            F.round(F.max("loo") / 100, 4).alias("max_loo"),
        )
        .orderBy("dow")
    )


# ---------------------------------------------------------------------------
# q252: k-fold cross-validation in ONE pass (no k training passes)
# ---------------------------------------------------------------------------

_Q252_FOLDS = 5

_Q252_SQL = f"""
WITH e AS (
  SELECT event_type,
         {sql_hash_bucket("event_id", _Q252_FOLDS)} AS fold,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events
),
per_fold AS (
  SELECT event_type, fold,
         CAST(COUNT(*) AS BIGINT) AS n_f,
         CAST(SUM(v) AS BIGINT) AS s_f
  FROM e GROUP BY event_type, fold
),
per_type AS (
  SELECT event_type,
         CAST(SUM(n_f) AS BIGINT) AS n_t,
         CAST(SUM(s_f) AS BIGINT) AS s_t
  FROM per_fold GROUP BY event_type
),
err AS (
  SELECT e.event_type, e.fold,
         ABS(e.v * (t.n_t - f.n_f) - (t.s_t - f.s_f)) AS num,
         t.n_t - f.n_f AS denom
  FROM e
  JOIN per_fold f ON f.event_type = e.event_type AND f.fold = e.fold
  JOIN per_type t ON t.event_type = e.event_type
)
SELECT event_type, CAST(fold AS BIGINT) AS fold,
       CAST(COUNT(*) AS BIGINT) AS n_fold,
       ROUND(CAST(SUM(num) AS DOUBLE) / ANY_VALUE(denom) / COUNT(*) / 100, 4)
         AS mae
FROM err GROUP BY event_type, fold ORDER BY event_type, fold
"""


@register(
    "q252_kfold_cv",
    _Q252_SQL,
    doc=(
        f"{_Q252_FOLDS}-fold cross-validation of the per-type mean "
        "predictor in ONE data pass: held-out fold f's model is "
        "(s_t - s_f)/(n_t - n_f) — train-on-the-other-folds by "
        "SUBTRACTION from the total sums, never k re-scans (the "
        "scale point: k-fold CV of any sufficient-statistic model is "
        "one rollup + one broadcast join); absolute errors are "
        "scaled to |v*(n_t-n_f) - (s_t-s_f)| so every sum is exact "
        "integer arithmetic, divided once per (type, fold) cell"
    ),
    tables=("events",),
)
def q252(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        hash_bucket("event_id", _Q252_FOLDS).alias("fold"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    per_fold = e.groupBy("event_type", "fold").agg(
        F.count(F.lit(1)).alias("n_f"), F.sum("v").alias("s_f")
    )
    per_type = per_fold.groupBy("event_type").agg(
        F.sum("n_f").alias("n_t"), F.sum("s_f").alias("s_t")
    )
    err = (
        e.join(F.broadcast(per_fold), ["event_type", "fold"])
        .join(F.broadcast(per_type), "event_type")
        .select(
            "event_type",
            "fold",
            F.abs(
                F.col("v") * (F.col("n_t") - F.col("n_f"))
                - (F.col("s_t") - F.col("s_f"))
            ).alias("num"),
            (F.col("n_t") - F.col("n_f")).alias("denom"),
        )
    )
    return (
        err.groupBy("event_type", F.col("fold").cast("long").alias("fold"))
        .agg(
            F.count(F.lit(1)).alias("n_fold"),
            F.round(
                F.sum("num").cast("double")
                / F.first("denom")
                / F.count(F.lit(1))
                / 100,
                4,
            ).alias("mae"),
        )
        .orderBy("event_type", "fold")
    )


# ---------------------------------------------------------------------------
# q253: learning curve (nested hash subsets, fixed held-out test)
# ---------------------------------------------------------------------------

_Q253_SIZES = (10, 20, 40, 80)

_Q253_SQL = f"""
WITH e AS (
  SELECT event_type,
         {sql_hash_bucket("event_id", 100)} AS b,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events
),
sizes(p) AS (
  SELECT * FROM (VALUES {", ".join(f"({p})" for p in _Q253_SIZES)}) v(p)
),
train AS (
  SELECT s.p, e.event_type,
         CAST(COUNT(*) AS BIGINT) AS n_p,
         CAST(SUM(e.v) AS BIGINT) AS s_p
  FROM e CROSS JOIN sizes s WHERE e.b < s.p
  GROUP BY s.p, e.event_type
),
test_err AS (
  SELECT t.p, e.event_type,
         CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(ABS(e.v * t.n_p - t.s_p)) AS BIGINT) AS num,
         ANY_VALUE(t.n_p) AS n_p
  FROM e JOIN train t ON t.event_type = e.event_type
  WHERE e.b >= 80
  GROUP BY t.p, e.event_type
)
SELECT event_type, CAST(p AS BIGINT) AS train_pct, n_p AS n_train, n_test,
       ROUND(CAST(num AS DOUBLE) / n_p / n_test / 100, 4) AS mae
FROM test_err ORDER BY event_type, train_pct
"""


@register(
    "q253_learning_curve",
    _Q253_SQL,
    doc=(
        "learning curve of the per-type mean predictor: NESTED "
        "deterministic train subsets (bucket < 10/20/40/80 — each is "
        "a superset of the last, the sample-efficiency diagnostic's "
        "requirement) against one fixed held-out test (bucket >= "
        "80); per-size sufficient statistics from one conditional "
        "rollup, test errors scaled to |v*n_p - s_p| integers, one "
        "division per (type, size) cell — 4 curves, 2 scans, no "
        "per-size re-training pass"
    ),
    tables=("events",),
)
def q253(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        hash_bucket("event_id", 100).alias("b"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    sizes = spark.createDataFrame([(p,) for p in _Q253_SIZES], "p LONG")
    train = (
        e.crossJoin(F.broadcast(sizes))
        .where(F.col("b") < F.col("p"))
        .groupBy("p", "event_type")
        .agg(F.count(F.lit(1)).alias("n_p"), F.sum("v").alias("s_p"))
    )
    test_err = (
        e.where(F.col("b") >= 80)
        .join(F.broadcast(train), "event_type")
        .groupBy("p", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.abs(F.col("v") * F.col("n_p") - F.col("s_p"))
            ).alias("num"),
            F.first("n_p").alias("n_p"),
        )
    )
    return test_err.select(
        "event_type",
        F.col("p").alias("train_pct"),
        F.col("n_p").alias("n_train"),
        "n_test",
        F.round(
            F.col("num").cast("double") / F.col("n_p") / F.col("n_test") / 100,
            4,
        ).alias("mae"),
    ).orderBy("event_type", "train_pct")


# ---------------------------------------------------------------------------
# q269: weight-of-evidence bins + information value (scorecard classic)
# ---------------------------------------------------------------------------

_Q269_BINS = 10

_Q269_SQL = f"""
WITH base AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
binned AS (
  SELECT NTILE({_Q269_BINS}) OVER (ORDER BY v, y DESC) AS bin, y
  FROM base
),
cell AS (
  SELECT bin,
         CAST(SUM(y) AS BIGINT) AS pos,
         CAST(SUM(1 - y) AS BIGINT) AS neg
  FROM binned GROUP BY bin
),
tot AS (
  SELECT CAST(SUM(pos) AS BIGINT) AS tp, CAST(SUM(neg) AS BIGINT) AS tn
  FROM cell
)
SELECT CAST(bin AS BIGINT) AS bin, pos, neg,
       ROUND(LN((CAST(pos AS DOUBLE) / tp) / (CAST(neg AS DOUBLE) / tn)), 6)
         AS woe,
       ROUND((CAST(pos AS DOUBLE) / tp - CAST(neg AS DOUBLE) / tn)
             * LN((CAST(pos AS DOUBLE) / tp) / (CAST(neg AS DOUBLE) / tn)),
             6) AS iv_term
FROM cell CROSS JOIN tot
ORDER BY bin
"""


@register(
    "q269_woe_iv",
    _Q269_SQL,
    doc=(
        f"weight-of-evidence binning + information value ({_Q269_BINS} "
        "equal-frequency bins of value vs the purchase label — the "
        "credit-scorecard feature-strength classic complementing q214 "
        "chi2 and q188 MI): the NTILE order is made TOTAL by the "
        "(v, y DESC) tie-break (cents collide across rows, and an "
        "untied NTILE would split ties engine-arbitrarily), per-bin "
        "(pos, neg) are exact integer counts, WoE/IV are one ln per "
        "bin rounded 6dp; IV = sum of iv_term — near 0 here because "
        "the fixture's value is label-independent, which is the "
        "honest null"
    ),
    tables=("events",),
)
def q269(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    # global NTILE over the full table: the one corpus-sized window in
    # this query — respell via packing.global_rank + integer bin
    # arithmetic at 100 TB (q137's documented path); kept direct here
    # to witness NTILE itself
    w = Window.orderBy(F.col("v"), F.col("y").desc())
    binned = base.select(F.ntile(_Q269_BINS).over(w).alias("bin"), "y")
    cell = binned.groupBy("bin").agg(
        F.sum("y").alias("pos"),
        F.sum(1 - F.col("y")).alias("neg"),
    )
    tot = cell.agg(
        F.sum("pos").alias("tp"), F.sum("neg").alias("tn")
    )
    pr = F.col("pos").cast("double") / F.col("tp")
    nr = F.col("neg").cast("double") / F.col("tn")
    woe = F.log(pr / nr)
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("long").alias("bin"),
            "pos",
            "neg",
            F.round(woe, 6).alias("woe"),
            F.round((pr - nr) * woe, 6).alias("iv_term"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q279: future-engagement AUC (temporal label/score split)
# ---------------------------------------------------------------------------

_Q279_HEAVY = 16  # label: >= 16 events in the final week (~median)

_Q279_SQL = f"""
WITH e AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d
  FROM events
),
h AS (SELECT CAST(MAX(d) AS BIGINT) AS max_d FROM e),
per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN d <= h.max_d - 14 THEN 1 ELSE 0 END) AS BIGINT)
           AS early,
         CASE WHEN SUM(CASE WHEN d > h.max_d - 7 THEN 1 ELSE 0 END)
                   >= {_Q279_HEAVY} THEN 1 ELSE 0 END AS heavy
  FROM e CROSS JOIN h GROUP BY user_id
),
s AS (
  SELECT early AS score, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(heavy) AS BIGINT) AS pos
  FROM per_user GROUP BY early
),
c AS (
  SELECT score, cnt, pos,
         COALESCE(SUM(cnt) OVER (
           ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS below
  FROM s
),
t AS (
  SELECT SUM(pos * (below + (cnt + 1) / 2.0)) AS rank_sum,
         CAST(SUM(pos) AS BIGINT) AS npos,
         CAST(SUM(cnt - pos) AS BIGINT) AS nneg
  FROM c
)
SELECT npos AS n_heavy, nneg AS n_light,
       ROUND((rank_sum - CAST(npos AS DOUBLE) * (npos + 1) / 2.0)
             / (CAST(npos AS DOUBLE) * nneg), 6) AS auc
FROM t
"""


@register(
    "q279_engagement_auc",
    _Q279_SQL,
    doc=(
        "future-engagement prediction eval with a TEMPORAL split (the "
        "label-leakage trap this query demonstrates avoiding: score = "
        "activity up to day max-14, label = heavy usage in the LAST "
        "week — disjoint windows, so the score cannot contain its own "
        "label; a recency score against a recency label would fake "
        "AUC ~1 — and on this always-active fixture a churn label has "
        "NO negatives at any scale, which is why the target is the "
        "heavy/light median split): q172's tie-aware rank-sum AUC "
        "over the |distinct scores| rollup"
    ),
    tables=("events",),
)
def q279(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).cast("long").alias("d"),
    )
    h = e.agg(F.max("d").alias("max_d"))
    per_user = (
        e.crossJoin(F.broadcast(h))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("d") <= F.col("max_d") - 14, 1).otherwise(0)
            ).alias("early"),
            F.when(
                F.sum(
                    F.when(F.col("d") > F.col("max_d") - 7, 1).otherwise(0)
                )
                >= _Q279_HEAVY,
                1,
            ).otherwise(0).alias("heavy"),
        )
    )
    s = per_user.groupBy(F.col("early").alias("score")).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("heavy").alias("pos")
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    c = s.withColumn("below", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
    t = c.agg(
        F.sum(
            F.col("pos") * (F.col("below") + (F.col("cnt") + 1) / 2.0)
        ).alias("rank_sum"),
        F.sum("pos").alias("npos"),
        F.sum(F.col("cnt") - F.col("pos")).alias("nneg"),
    )
    return t.select(
        F.col("npos").alias("n_heavy"),
        F.col("nneg").alias("n_light"),
        F.round(
            (
                F.col("rank_sum")
                - F.col("npos").cast("double") * (F.col("npos") + 1) / 2.0
            )
            / (F.col("npos").cast("double") * F.col("nneg")),
            6,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# q280: cost-sensitive threshold choice (decision-theoretic q233)
# ---------------------------------------------------------------------------

_Q280_V_TP = 5
_Q280_C_FP = 1
_Q280_C_FN = 2

_Q280_SQL = f"""
WITH t(thr) AS (
  SELECT * FROM (VALUES {", ".join(f"({t})" for t in _Q233_THRESHOLDS)}) v(thr)
),
base AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos, value
  FROM events
),
m AS (
  SELECT CAST(thr AS BIGINT) AS thr,
         CAST(SUM(CASE WHEN pos = 1 AND value >= thr THEN 1 ELSE 0 END)
              AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN pos = 0 AND value >= thr THEN 1 ELSE 0 END)
              AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN pos = 1 AND value < thr THEN 1 ELSE 0 END)
              AS BIGINT) AS fn
  FROM base CROSS JOIN t GROUP BY thr
)
SELECT thr, tp, fp, fn,
       CAST({_Q280_V_TP} * tp - {_Q280_C_FP} * fp - {_Q280_C_FN} * fn
            AS BIGINT) AS profit,
       ({_Q280_V_TP} * tp - {_Q280_C_FP} * fp - {_Q280_C_FN} * fn) =
         MAX({_Q280_V_TP} * tp - {_Q280_C_FP} * fp - {_Q280_C_FN} * fn)
           OVER () AS is_best
FROM m ORDER BY thr
"""


@register(
    "q280_cost_threshold",
    _Q280_SQL,
    doc=(
        "cost-sensitive threshold choice — q233's sweep made "
        f"decision-theoretic: profit(t) = {_Q280_V_TP}·TP − "
        f"{_Q280_C_FP}·FP − {_Q280_C_FN}·FN with an asymmetric cost "
        "matrix (a missed purchase costs twice a false alert), "
        "argmax flagged over the |thresholds|-row frame; exact "
        "integer profit arithmetic — the operating point a business "
        "actually deploys is rarely max-F1"
    ),
    tables=("events",),
)
def q280(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pos = F.col("event_type") == "purchase"
    aggs = []
    for t in _Q233_THRESHOLDS:
        hit = F.col("value") >= t
        aggs.append(F.sum(F.when(pos & hit, 1).otherwise(0)).alias(f"tp_{t}"))
        aggs.append(F.sum(F.when(~pos & hit, 1).otherwise(0)).alias(f"fp_{t}"))
        aggs.append(F.sum(F.when(pos & ~hit, 1).otherwise(0)).alias(f"fn_{t}"))
    one = ev.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({t} AS BIGINT), tp_{t}, fp_{t}, fn_{t}"
        for t in _Q233_THRESHOLDS
    )
    rows = one.selectExpr(
        f"stack({len(_Q233_THRESHOLDS)}, {stack_args}) AS (thr, tp, fp, fn)"
    )
    profit = (
        _Q280_V_TP * F.col("tp")
        - _Q280_C_FP * F.col("fp")
        - _Q280_C_FN * F.col("fn")
    )
    whole = Window.partitionBy().orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        rows.withColumn("profit", profit.cast("long"))
        .withColumn("is_best", F.col("profit") == F.max("profit").over(whole))
        .orderBy("thr")
    )


# ---------------------------------------------------------------------------
# q287: subgroup metric gap (per-group AUC disparity)
# ---------------------------------------------------------------------------

_Q287_SQL = f"""
WITH e AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d
  FROM events
),
h AS (SELECT CAST(MAX(d) AS BIGINT) AS max_d FROM e),
per_user AS (
  SELECT user_id, {sql_hash_bucket("user_id", 2)} AS grp,
         CAST(SUM(CASE WHEN d <= h.max_d - 14 THEN 1 ELSE 0 END) AS BIGINT)
           AS early,
         CASE WHEN SUM(CASE WHEN d > h.max_d - 7 THEN 1 ELSE 0 END)
                   >= {_Q279_HEAVY} THEN 1 ELSE 0 END AS heavy
  FROM e CROSS JOIN h GROUP BY user_id
),
s AS (
  SELECT grp, early AS score, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(heavy) AS BIGINT) AS pos
  FROM per_user GROUP BY grp, early
),
c AS (
  SELECT grp, score, cnt, pos,
         COALESCE(SUM(cnt) OVER (PARTITION BY grp ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM s
),
t AS (
  SELECT grp,
         SUM(pos * (below + (cnt + 1) / 2.0)) AS rank_sum,
         CAST(SUM(pos) AS BIGINT) AS npos,
         CAST(SUM(cnt - pos) AS BIGINT) AS nneg
  FROM c GROUP BY grp
),
aucs AS (
  SELECT grp, npos, nneg,
         (rank_sum - CAST(npos AS DOUBLE) * (npos + 1) / 2.0)
           / NULLIF(CAST(npos AS DOUBLE) * nneg, 0) AS auc
  FROM t
)
SELECT a1.npos + a1.nneg AS n_group1, a0.npos + a0.nneg AS n_group0,
       ROUND(a1.auc, 6) AS auc_group1,
       ROUND(a0.auc, 6) AS auc_group0,
       ROUND(ABS(a1.auc - a0.auc), 6) AS auc_gap
FROM aucs a1 JOIN aucs a0 ON a1.grp = 1 AND a0.grp = 0
"""


@register(
    "q287_subgroup_auc_gap",
    _Q287_SQL,
    doc=(
        "subgroup metric disparity — the fairness-style audit of "
        "q279's engagement model: the SAME temporal-split AUC "
        "computed per user-hash subgroup, reporting both AUCs and "
        "the absolute gap (a model can look fine on average while "
        "failing one segment); the rank-sum machinery partitions by "
        "group, everything else is the q279 spelling; hash subgroups "
        "are exchangeable so the honest gap here is small subgroup "
        "NOISE — the machinery is what real protected attributes "
        "would plug into"
    ),
    tables=("events",),
)
def q287(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).cast("long").alias("d"),
    )
    h = e.agg(F.max("d").alias("max_d"))
    per_user = (
        e.crossJoin(F.broadcast(h))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("d") <= F.col("max_d") - 14, 1).otherwise(0)
            ).alias("early"),
            F.when(
                F.sum(
                    F.when(F.col("d") > F.col("max_d") - 7, 1).otherwise(0)
                )
                >= _Q279_HEAVY,
                1,
            ).otherwise(0).alias("heavy"),
        )
        .withColumn("grp", hash_bucket("user_id", 2))
    )
    s = per_user.groupBy("grp", F.col("early").alias("score")).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("heavy").alias("pos")
    )
    w = Window.partitionBy("grp").orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = s.withColumn("below", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
    t = c.groupBy("grp").agg(
        F.sum(
            F.col("pos") * (F.col("below") + (F.col("cnt") + 1) / 2.0)
        ).alias("rank_sum"),
        F.sum("pos").alias("npos"),
        F.sum(F.col("cnt") - F.col("pos")).alias("nneg"),
    )
    auc = (
        F.col("rank_sum")
        - F.col("npos").cast("double") * (F.col("npos") + 1) / 2.0
    ) / F.nullif(F.col("npos").cast("double") * F.col("nneg"), F.lit(0.0))
    # a subgroup with an empty class has no defined AUC — NULL, not a
    # crash (hit at sf0.001 where a 7-user group can lack positives)
    aucs = t.select("grp", "npos", "nneg", auc.alias("auc"))
    a1 = aucs.where(F.col("grp") == 1).select(
        (F.col("npos") + F.col("nneg")).alias("n_group1"),
        F.col("auc").alias("auc1"),
    )
    a0 = aucs.where(F.col("grp") == 0).select(
        (F.col("npos") + F.col("nneg")).alias("n_group0"),
        F.col("auc").alias("auc0"),
    )
    return a1.crossJoin(a0).select(
        "n_group1",
        "n_group0",
        F.round("auc1", 6).alias("auc_group1"),
        F.round("auc0", 6).alias("auc_group0"),
        F.round(F.abs(F.col("auc1") - F.col("auc0")), 6).alias("auc_gap"),
    )


# ---------------------------------------------------------------------------
# q302: Murphy decomposition of the Brier score (round 8)
# ---------------------------------------------------------------------------

# Murphy (1973): for a DISCRETE forecast system (each event forecast =
# its bin's mean prediction), Brier = REL - RES + UNC exactly.  Inputs
# are q239's basis-point pseudo-probability s = v/(v+50) (integer bp at
# the scan) and y = is-purchase; per-bin sufficient statistics are
# exact integers (n_k, S_k = sum s, Y_k = sum y), the 10-bin rollup
# composes them in doubles with IDENTICAL expression trees both
# engines, and every output is ROUND(.,6).
_Q302_SQL = """
WITH scored AS (
  SELECT CAST(FLOOR(value * 10000 / (value + 50)) AS BIGINT) AS s_bp,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
bins AS (
  SELECT CAST(FLOOR(s_bp / 1000.0) AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_k,
         CAST(SUM(s_bp) AS BIGINT) AS s_k,
         CAST(SUM(y) AS BIGINT) AS y_k,
         CAST(SUM((s_bp - 10000 * y) * (s_bp - 10000 * y)) AS BIGINT) AS sq_k
  FROM scored GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_k) AS BIGINT) AS n, CAST(SUM(y_k) AS BIGINT) AS y
  FROM bins
)
SELECT ROUND(SUM((CAST(s_k AS DOUBLE) - 10000.0 * y_k)
                 * (CAST(s_k AS DOUBLE) - 10000.0 * y_k) / n_k)
             / (tot.n * 100000000.0), 6) AS rel,
       ROUND(SUM((CAST(y_k AS DOUBLE) * tot.n - CAST(n_k AS DOUBLE) * tot.y)
                 * (CAST(y_k AS DOUBLE) * tot.n - CAST(n_k AS DOUBLE) * tot.y)
                 / n_k)
             / (CAST(tot.n AS DOUBLE) * tot.n * tot.n), 6) AS res,
       ROUND(CAST(tot.y AS DOUBLE) / tot.n
             * (1.0 - CAST(tot.y AS DOUBLE) / tot.n), 6) AS unc,
       ROUND(SUM(CAST(sq_k AS DOUBLE)) / (tot.n * 100000000.0), 6)
         AS brier_raw
FROM bins, tot
GROUP BY tot.n, tot.y
"""


@register(
    "q302_brier_decomposition",
    _Q302_SQL,
    doc=(
        "Murphy (1973) decomposition of the Brier score for the "
        "value-derived purchase forecast, over q239's decile bins: "
        "reliability (calibration gap), resolution (how far bin base "
        "rates spread from the prior), and uncertainty (the prior's "
        "own variance) — the standard forecast-quality triptych; for "
        "the binned forecast system rel - res + unc IS the binned "
        "Brier identically (pinned to 1e-12 in "
        "tests/test_round8_ops.py), and brier_raw (unbinned) is "
        "reported beside it.  One scan, one 10-row bin rollup, one "
        "1-row total frame joined back — O(bins) after the scan"
    ),
    tables=("events",),
)
def q302(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.floor(F.col("value") * 10000 / (F.col("value") + 50))
        .cast("long")
        .alias("s_bp"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    sq = (F.col("s_bp") - 10000 * F.col("y")) * (
        F.col("s_bp") - 10000 * F.col("y")
    )
    from osm_changesets_to_parquet_spark.operators.iterutils import (
        truncate_lineage,
    )

    # the bin frame feeds BOTH the total frame and the final rollup —
    # materialize the 10 rows once or the events scan runs twice (the
    # round-7 multi-consumer recompute lesson, applied at design time)
    bins = truncate_lineage(
        scored.groupBy(
            F.floor(F.col("s_bp") / 1000.0).cast("long").alias("bin")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_k"),
            F.sum("s_bp").cast("long").alias("s_k"),
            F.sum("y").cast("long").alias("y_k"),
            F.sum(sq).cast("long").alias("sq_k"),
        )
    )
    tot = bins.agg(
        F.sum("n_k").cast("long").alias("n"),
        F.sum("y_k").cast("long").alias("y"),
    )
    a = F.col("s_k").cast("double") - 10000.0 * F.col("y_k")
    b = F.col("y_k").cast("double") * F.col("n") - F.col("n_k").cast(
        "double"
    ) * F.col("y")
    return (
        bins.crossJoin(F.broadcast(tot))
        .groupBy("n", "y")
        .agg(
            F.round(
                F.sum(a * a / F.col("n_k")) / (F.col("n") * 100000000.0), 6
            ).alias("rel"),
            F.round(
                F.sum(b * b / F.col("n_k"))
                / (
                    F.col("n").cast("double")
                    * F.col("n")
                    * F.col("n")
                ),
                6,
            ).alias("res"),
            F.round(
                F.col("y").cast("double")
                / F.col("n")
                * (F.lit(1.0) - F.col("y").cast("double") / F.col("n")),
                6,
            ).alias("unc"),
            F.round(
                F.sum(F.col("sq_k").cast("double"))
                / (F.col("n") * 100000000.0),
                6,
            ).alias("brier_raw"),
        )
        .drop("n", "y")
    )


# ---------------------------------------------------------------------------
# q303: decision-stump split search (round 8)
# ---------------------------------------------------------------------------

# best single split per feature by MISCLASSIFICATION error — chosen
# over Gini so the whole search is exact integer arithmetic (Gini's
# per-split rational n_L*n_R denominators cannot be compared exactly
# in SQL without per-pair cross-multiplication; error counts can)
_Q303_SQL = """
WITH pts AS (
  SELECT 'acctbal_cents' AS feature,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v,
         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS y
  FROM customer
  UNION ALL
  SELECT 'nationkey', CAST(c_nationkey AS BIGINT),
         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
  FROM customer
),
g AS (
  SELECT feature, v, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM pts GROUP BY feature, v
),
sweep AS (
  SELECT feature, v,
         SUM(cnt) OVER w AS nl, SUM(pos) OVER w AS pl,
         SUM(cnt) OVER f AS n, SUM(pos) OVER f AS p
  FROM g
  WINDOW w AS (PARTITION BY feature ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         f AS (PARTITION BY feature)
),
scored AS (
  SELECT feature, v,
         (nl - GREATEST(pl, nl - pl))
           + ((n - nl) - GREATEST(p - pl, (n - nl) - (p - pl))) AS err,
         n - GREATEST(p, n - p) AS base_err, n,
         ROW_NUMBER() OVER (
           PARTITION BY feature
           ORDER BY (nl - GREATEST(pl, nl - pl))
                    + ((n - nl) - GREATEST(p - pl, (n - nl) - (p - pl))), v
         ) AS rn
  FROM sweep
)
SELECT feature, CAST(v AS BIGINT) AS split_value, CAST(err AS BIGINT) AS err,
       CAST(base_err AS BIGINT) AS base_err, CAST(n AS BIGINT) AS n
FROM scored WHERE rn = 1 ORDER BY feature
"""


@register(
    "q303_stump_split",
    _Q303_SQL,
    doc=(
        "decision-stump split search: for each feature, the threshold "
        "v* minimizing total misclassification error of the split "
        "(x <= v -> majority-left, x > v -> majority-right), found by "
        "one sorted sweep over the feature's VALUE DOMAIN — group to "
        "(feature, value) sufficient statistics first (the shuffle "
        "carries distinct values + two counts, never rows), then "
        "per-feature cumulative windows over the value-domain-sized "
        "frame (the q289 rank-frame discipline; a wide feature set "
        "at 100 TB swaps the per-feature window for one "
        "global_cumsum per feature).  Misclassification over Gini "
        "keeps the argmin exact-integer; ties break toward the "
        "smallest threshold"
    ),
    tables=("customer",),
)
def q303(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    y = F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)
    pts = cust.select(
        F.lit("acctbal_cents").alias("feature"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("v"),
        y.alias("y"),
    ).unionByName(
        cust.select(
            F.lit("nationkey").alias("feature"),
            F.col("c_nationkey").cast("long").alias("v"),
            y.alias("y"),
        )
    )
    g = pts.groupBy("feature", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("y").cast("long").alias("pos"),
    )
    w = (
        Window.partitionBy("feature")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    f = Window.partitionBy("feature")
    sweep = g.select(
        "feature",
        "v",
        F.sum("cnt").over(w).alias("nl"),
        F.sum("pos").over(w).alias("pl"),
        F.sum("cnt").over(f).alias("n"),
        F.sum("pos").over(f).alias("p"),
    )
    nl, pl, n, p = F.col("nl"), F.col("pl"), F.col("n"), F.col("p")
    err = (nl - F.greatest(pl, nl - pl)) + (
        (n - nl) - F.greatest(p - pl, (n - nl) - (p - pl))
    )
    scored = sweep.select(
        "feature",
        "v",
        err.alias("err"),
        (n - F.greatest(p, n - p)).alias("base_err"),
        "n",
        F.row_number()
        .over(Window.partitionBy("feature").orderBy(err, "v"))
        .alias("rn"),
    )
    return (
        scored.where(F.col("rn") == 1)
        .select(
            "feature",
            F.col("v").cast("long").alias("split_value"),
            F.col("err").cast("long").alias("err"),
            F.col("base_err").cast("long").alias("base_err"),
            F.col("n").cast("long").alias("n"),
        )
        .orderBy("feature")
    )


# ---------------------------------------------------------------------------
# q311: logistic regression by IRLS — deterministic distributed fitting
# ---------------------------------------------------------------------------

_Q311_ROUNDS = 6


def _q311_round_ctes(k: int) -> str:
    prev = f"b{k - 1}"
    return f"""s{k} AS (
  SELECT CAST(SUM(y * 1000000 - p_mil) AS BIGINT) AS g0,
         CAST(SUM((y * 1000000 - p_mil) * x) AS BIGINT) AS g1,
         CAST(SUM(w_mic) AS BIGINT) AS h00,
         CAST(SUM(w_mic * x) AS BIGINT) AS h01,
         CAST(SUM(w_mic * x * x) AS BIGINT) AS h11
  FROM (
    SELECT d.x, d.y, p_mil,
           CAST(FLOOR((p_mil * (1000000 - p_mil) + 500000) / 1000000.0)
                AS BIGINT) AS w_mic
    FROM (
      SELECT d.x, d.y,
             CAST(FLOOR(1000000.0 / (1.0 + EXP(-(b.b0 + b.b1 * d.x)))
                        + 0.5) AS BIGINT) AS p_mil
      FROM d, {prev} b
    ) d
  )
),
b{k} AS (
  SELECT b.b0 + (CAST(s.h11 AS DOUBLE) * s.g0
                 - CAST(s.h01 AS DOUBLE) * s.g1)
               / (CAST(s.h00 AS DOUBLE) * s.h11
                  - CAST(s.h01 AS DOUBLE) * s.h01) AS b0,
         b.b1 + (CAST(s.h00 AS DOUBLE) * s.g1
                 - CAST(s.h01 AS DOUBLE) * s.g0)
               / (CAST(s.h00 AS DOUBLE) * s.h11
                  - CAST(s.h01 AS DOUBLE) * s.h01) AS b1
  FROM {prev} b, s{k} s
)"""


_Q311_SQL = f"""
WITH d AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS x,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
b0 AS (SELECT CAST(0 AS DOUBLE) AS b0, CAST(0 AS DOUBLE) AS b1),
{", ".join(_q311_round_ctes(k) for k in range(1, _Q311_ROUNDS + 1))}
SELECT ROUND(b0, 6) AS beta0, ROUND(b1 * 1000, 6) AS beta1_per_10usd,
       CAST({_Q311_ROUNDS} AS BIGINT) AS n_rounds
FROM b{_Q311_ROUNDS}
"""


@register(
    "q311_logistic_irls",
    _Q311_SQL,
    doc=(
        "logistic regression FIT (is-purchase ~ value-in-cents) by "
        f"{_Q311_ROUNDS} Newton/IRLS rounds (enough to converge from a "
        "cold start: Newton needs ~6 rounds on a logistic likelihood "
        "this size; quantization error is below 1e-8 — measured) — "
        "actual distributed model "
        "fitting, not just scoring: each round is ONE aggregation of "
        "five sufficient statistics and a driver-side 2x2 solve (the "
        "same closed-form expression tree the oracle unrolls as "
        "chained CTEs).  Determinism: per-event probabilities are "
        "quantized to INTEGER millionths and weights to integer "
        "micro-units BEFORE summation, so the gradient/Hessian sums "
        "are order-independent exact integers in every engine and "
        "partitioning — the float surface is one 5-number solve per "
        "round, evaluated identically both sides.  At 100 TB each "
        "round is one map-side-combined scan; state on the driver is "
        "two doubles.  The fixture's value is uninformative of "
        "purchase (beta1 ~ 0, beta0 ~ logit(1/5)) — the honest null, "
        "like q283's rho^2~0; a planted-signal test pins real "
        "learning in tests/test_round8_ops.py"
    ),
    tables=("events",),
)
def q311(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    b0, b1 = 0.0, 0.0
    for _ in range(_Q311_ROUNDS):
        z = F.lit(b0) + F.lit(b1) * F.col("x")
        p_mil = F.floor(
            F.lit(1000000.0) / (F.lit(1.0) + F.exp(-z)) + F.lit(0.5)
        ).cast("long")
        w_mic = F.floor(
            (p_mil * (F.lit(1000000) - p_mil) + F.lit(500000))
            / F.lit(1000000.0)
        ).cast("long")
        diff = F.col("y") * 1000000 - p_mil
        row = ev.agg(
            F.sum(diff).cast("long").alias("g0"),
            F.sum(diff * F.col("x")).cast("long").alias("g1"),
            F.sum(w_mic).cast("long").alias("h00"),
            F.sum(w_mic * F.col("x")).cast("long").alias("h01"),
            F.sum(w_mic * F.col("x") * F.col("x")).cast("long").alias("h11"),
        ).first()  # bounded driver collect: five integers per round
        # the 2x2 Newton solve — float() casts mirror the oracle's
        # CAST(.. AS DOUBLE) placement exactly, so both engines run
        # the identical IEEE expression tree
        det = float(row.h00) * float(row.h11) - float(row.h01) * float(
            row.h01
        )
        b0 = b0 + (float(row.h11) * row.g0 - float(row.h01) * row.g1) / det
        b1 = b1 + (float(row.h00) * row.g1 - float(row.h01) * row.g0) / det
    return spark.range(1).select(
        F.round(F.lit(b0), 6).alias("beta0"),
        F.round(F.lit(b1) * 1000, 6).alias("beta1_per_10usd"),
        F.lit(_Q311_ROUNDS).cast("long").alias("n_rounds"),
    )


# ---------------------------------------------------------------------------
# q334: two-component Gaussian mixture fit by EM (round 8)
# ---------------------------------------------------------------------------

# q311's sibling for UNSUPERVISED model fitting: a 1-D two-component
# GMM over event value cents, 3 EM rounds (Dempster, Laird & Rubin
# 1977).  The q311 determinism discipline: per-row responsibilities
# are quantized to INTEGER milli-units before summation, so each
# M-step consumes order-independent exact-integer sufficient
# statistics (n, Σrx, Σrx² per component — the complement component's
# sums derive from the once-computed global Σx/Σx², so each round is
# ONE 3-integer aggregation); the float surface is the per-round
# 5-parameter update, spelled with float() casts that mirror the
# oracle's CAST(.. AS DOUBLE) placement exactly (sums exceed 2^53 at
# sf0.1, so cast-then-divide vs exact-rational-divide WOULD diverge —
# the q311 lesson applied where it actually bites).  Init is
# deterministic from the data: mu = exact lower-quartile cents (value-
# domain cumulative, the q312 discipline), sigma = population std,
# w = 1/2.  Integer headroom: Σ rq·x² <= 1e3·(6e4)²·rows — BIGINT-safe
# to ~2.5e9 rows (~sf1); past that, quantize x to deci-cents.
# Sigma is floored at 1 cent (GREATEST(var, 1.0) both engines) so a
# degenerating component cannot produce NaN.
_Q334_ROUNDS = 3
_Q334_RQ = 1000


def _q334_em_cte(k: int) -> str:
    prev = f"p{k - 1}"
    return f"""s{k} AS (
  SELECT CAST(SUM(rq) AS BIGINT) AS n1,
         CAST(SUM(rq * c) AS BIGINT) AS sx1,
         CAST(SUM(rq * c * c) AS BIGINT) AS sxx1
  FROM (
    SELECT x.c,
           CAST(FLOOR(l1 / (l1 + l2) * {_Q334_RQ} + 0.5) AS BIGINT) AS rq
    FROM (
      SELECT c,
             p.w * EXP(-0.5 * ((c - p.mu1) / p.s1) * ((c - p.mu1) / p.s1))
               / p.s1 AS l1,
             (1 - p.w) * EXP(-0.5 * ((c - p.mu2) / p.s2)
                             * ((c - p.mu2) / p.s2)) / p.s2 AS l2
      FROM x CROSS JOIN {prev} p
    ) x
  )
),
p{k} AS (
  SELECT s.n1 * 1.0 / ({_Q334_RQ}.0 * g.n) AS w,
         CAST(s.sx1 AS DOUBLE) / CAST(s.n1 AS DOUBLE) AS mu1,
         SQRT(GREATEST(CAST(s.sxx1 AS DOUBLE) / CAST(s.n1 AS DOUBLE)
              - (CAST(s.sx1 AS DOUBLE) / CAST(s.n1 AS DOUBLE))
                * (CAST(s.sx1 AS DOUBLE) / CAST(s.n1 AS DOUBLE)),
              1.0)) AS s1,
         CAST({_Q334_RQ} * g.sx - s.sx1 AS DOUBLE)
           / CAST({_Q334_RQ} * g.n - s.n1 AS DOUBLE) AS mu2,
         SQRT(GREATEST(
           CAST({_Q334_RQ} * g.sxx - s.sxx1 AS DOUBLE)
             / CAST({_Q334_RQ} * g.n - s.n1 AS DOUBLE)
           - (CAST({_Q334_RQ} * g.sx - s.sx1 AS DOUBLE)
              / CAST({_Q334_RQ} * g.n - s.n1 AS DOUBLE))
             * (CAST({_Q334_RQ} * g.sx - s.sx1 AS DOUBLE)
                / CAST({_Q334_RQ} * g.n - s.n1 AS DOUBLE)),
           1.0)) AS s2,
         s.n1 AS n1_milli
  FROM s{k} s CROSS JOIN g
)"""


_Q334_SQL = f"""
WITH x AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS sx,
         CAST(SUM(c * c) AS BIGINT) AS sxx
  FROM x
),
vals AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt FROM x GROUP BY c),
cum AS (
  SELECT c, SUM(cnt) OVER (ORDER BY c) AS cm FROM vals
),
qs AS (
  SELECT (SELECT MIN(c) FROM cum, g
          WHERE cm >= CAST(CEIL(g.n * 0.25) AS BIGINT)) AS q25,
         (SELECT MIN(c) FROM cum, g
          WHERE cm >= CAST(CEIL(g.n * 0.75) AS BIGINT)) AS q75
),
p0 AS (
  SELECT CAST(0.5 AS DOUBLE) AS w,
         CAST(q25 AS DOUBLE) AS mu1,
         SQRT((CAST(g.sxx AS DOUBLE)
               - CAST(g.sx AS DOUBLE) * CAST(g.sx AS DOUBLE)
                 / CAST(g.n AS DOUBLE)) / CAST(g.n AS DOUBLE)) AS s1,
         CAST(q75 AS DOUBLE) AS mu2,
         SQRT((CAST(g.sxx AS DOUBLE)
               - CAST(g.sx AS DOUBLE) * CAST(g.sx AS DOUBLE)
                 / CAST(g.n AS DOUBLE)) / CAST(g.n AS DOUBLE)) AS s2,
         CAST(0 AS BIGINT) AS n1_milli
  FROM qs CROSS JOIN g
),
{", ".join(_q334_em_cte(k) for k in range(1, _Q334_ROUNDS + 1))}
SELECT comp, ROUND(w, 6) AS weight, ROUND(mu / 100, 4) AS mu_dollars,
       ROUND(sig / 100, 4) AS sigma_dollars, n_milli
FROM (
  SELECT 1 AS comp, w, mu1 AS mu, s1 AS sig, n1_milli AS n_milli
  FROM p{_Q334_ROUNDS}
  UNION ALL
  SELECT 2, 1 - w, mu2, s2, (SELECT {_Q334_RQ} * n FROM g) - n1_milli
  FROM p{_Q334_ROUNDS}
)
ORDER BY comp
"""


@register(
    "q334_gmm_em",
    _Q334_SQL,
    doc=(
        "two-component 1-D Gaussian mixture fit by "
        f"{_Q334_ROUNDS} EM rounds (Dempster-Laird-Rubin 1977) over "
        "event value cents — q311's unsupervised sibling: per-row "
        "responsibilities quantized to integer MILLI-units before "
        "summation (order-independent exact-integer M-step "
        "statistics under any partitioning), each round ONE "
        "3-integer aggregation (the complement component derives "
        "from the once-computed global Σx/Σx²), parameter updates on "
        "the driver with float() casts mirroring the oracle's "
        "CAST-AS-DOUBLE placement exactly (the sums exceed 2^53 at "
        "sf0.1 — exact-rational vs cast-then-divide WOULD diverge); "
        "deterministic init (exact lower-quartile cents by "
        "value-domain cumulative, population sigma, w=1/2), sigma "
        "floored at 1 cent so a degenerate component cannot NaN.  "
        "Honest fixture answer: the components split the skewed "
        "value distribution into a low-mean bulk and a high-mean "
        "tail; integer headroom ~2.5e9 rows (then quantize x to "
        "deci-cents)"
    ),
    tables=("events",),
)
def q334(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from osm_changesets_to_parquet_spark.operators.iterutils import (
        truncate_lineage,
    )

    ev = load_table(spark, sf_dir, "events")
    x = truncate_lineage(
        ev.select(F.round(F.col("value") * 100).cast("long").alias("c"))
    )
    g = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("sx"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sxx"),
    ).first()  # bounded driver collect: three integers, once
    n, sx, sxx = g.n, g.sx, g.sxx
    vals = x.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    # value-domain cumulative over the bounded cents domain (q312
    # discipline: <= ~56k distinct values regardless of row count)
    cum = vals.select(
        "c",
        F.sum("cnt")
        .over(Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cm"),
    )
    q25 = (
        cum.where(F.col("cm") >= math.ceil(n * 0.25))
        .agg(F.min("c"))
        .first()[0]
    )
    q75 = (
        cum.where(F.col("cm") >= math.ceil(n * 0.75))
        .agg(F.min("c"))
        .first()[0]
    )
    sig0 = math.sqrt(
        (float(sxx) - float(sx) * float(sx) / float(n)) / float(n)
    )
    w, mu1, s1, mu2, s2 = 0.5, float(q25), sig0, float(q75), sig0
    n1 = 0
    for _ in range(_Q334_ROUNDS):
        z1 = (F.col("c") - F.lit(mu1)) / F.lit(s1)
        z2 = (F.col("c") - F.lit(mu2)) / F.lit(s2)
        l1 = F.lit(w) * F.exp(F.lit(-0.5) * z1 * z1) / F.lit(s1)
        l2 = (
            F.lit(1 - w)
            * F.exp(F.lit(-0.5) * z2 * z2)
            / F.lit(s2)
        )
        rq = F.floor(l1 / (l1 + l2) * _Q334_RQ + F.lit(0.5)).cast("long")
        row = x.select(F.col("c"), rq.alias("rq")).agg(
            F.sum("rq").cast("long").alias("n1"),
            F.sum(F.col("rq") * F.col("c")).cast("long").alias("sx1"),
            F.sum(F.col("rq") * F.col("c") * F.col("c"))
            .cast("long")
            .alias("sxx1"),
        ).first()  # bounded driver collect: three integers per round
        n1, sx1, sxx1 = row.n1, row.sx1, row.sxx1
        w = n1 * 1.0 / (float(_Q334_RQ) * n)
        mu1 = float(sx1) / float(n1)
        s1 = math.sqrt(
            max(float(sxx1) / float(n1) - (float(sx1) / float(n1))
                * (float(sx1) / float(n1)), 1.0)
        )
        n2, sx2, sxx2 = _Q334_RQ * n - n1, _Q334_RQ * sx - sx1, (
            _Q334_RQ * sxx - sxx1
        )
        mu2 = float(sx2) / float(n2)
        s2 = math.sqrt(
            max(float(sxx2) / float(n2) - (float(sx2) / float(n2))
                * (float(sx2) / float(n2)), 1.0)
        )
    return spark.range(1).select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).cast("int").alias("comp"),
                    F.round(F.lit(w), 6).alias("weight"),
                    F.round(F.lit(mu1 / 100), 4).alias("mu_dollars"),
                    F.round(F.lit(s1 / 100), 4).alias("sigma_dollars"),
                    F.lit(n1).cast("long").alias("n_milli"),
                ),
                F.struct(
                    F.lit(2).cast("int").alias("comp"),
                    F.round(F.lit(1 - w), 6).alias("weight"),
                    F.round(F.lit(mu2 / 100), 4).alias("mu_dollars"),
                    F.round(F.lit(s2 / 100), 4).alias("sigma_dollars"),
                    F.lit(_Q334_RQ * n - n1).cast("long").alias("n_milli"),
                ),
            )
        ).alias("r")
    ).select("r.comp", "r.weight", "r.mu_dollars", "r.sigma_dollars", "r.n_milli")


# ---------------------------------------------------------------------------
# q344: AdaBoost over decision stumps, 3 rounds (round 8)
# ---------------------------------------------------------------------------

# Freund & Schapire (1997) — ENSEMBLE fitting completing the
# model-fitting family (q311 IRLS, q334 EM, q303 single stump): three
# boosting rounds over stumps on (value-cents, hour-of-day,
# day-of-week) predicting is-purchase.  The q311/q334 determinism
# discipline, applied to boosting's multiplicative weights: row
# weights START as integer 1000 and every update re-quantizes
# (w' = FLOOR(w * e^{±alpha} + 0.5)), so each round's weighted stump
# search runs on EXACT integers — per-feature value-domain cumulative
# sweeps (the q303 shape; sufficient statistics are (feature, value,
# weighted-pos, weighted-neg), never rows), the argmin a total-order
# (err, feature, value, polarity) TakeOrdered.  The only floats are
# alpha = ln((1-e)/e)/2 per round (identical doubles: e is a ratio of
# exact integers < 2^53) and the weight factors, whose FLOOR(+0.5)
# quantization absorbs last-ulp libm drift (the q334 argument).  Each
# round is ONE scan + two bounded scalar collects; weights are a
# per-row EXPRESSION of the stump parameters (no per-row state, no
# join — the weight chain is a nested FLOOR/EXP expression both
# engines evaluate identically).
_Q344_ROUNDS = 3
_Q344_W0 = 1000
_Q344_CLAMP = 0.000001

_Q344_FEATURES = {1: "cents", 2: "hour", 3: "dow"}

_Q344_BASE = """
base AS MATERIALIZED (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS x1,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) % 24 AS x2,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) % 7 AS x3,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS y
  FROM events
)
"""


def _q344_pred(k: int) -> str:
    """Per-row prediction of round-k's picked stump as scalar subqueries."""
    p = f"(SELECT fid FROM pick{k})"
    v = f"(SELECT v FROM pick{k})"
    pol = f"(SELECT pol FROM pick{k})"
    xf = f"(CASE {p} WHEN 1 THEN x1 WHEN 2 THEN x2 ELSE x3 END)"
    return (
        f"(CASE WHEN {xf} <= {v} "
        f"THEN (CASE WHEN {pol} = 1 THEN 1 ELSE -1 END) "
        f"ELSE (CASE WHEN {pol} = 1 THEN -1 ELSE 1 END) END)"
    )


def _q344_sql() -> str:
    w_expr = str(_Q344_W0)
    parts = [_Q344_BASE.strip()]
    for k in range(1, _Q344_ROUNDS + 1):
        parts.append(f"""wt{k} AS (SELECT CAST(SUM({w_expr}) AS BIGINT) AS w FROM base)""")
        parts.append(f"""g{k} AS MATERIALIZED (
  SELECT fid, v,
         CAST(SUM(CASE WHEN y = 1 THEN {w_expr} ELSE 0 END) AS BIGINT) AS swp,
         CAST(SUM(CASE WHEN y = -1 THEN {w_expr} ELSE 0 END) AS BIGINT) AS swn
  FROM (
    SELECT 1 AS fid, x1 AS v, x1, x2, x3, y FROM base
    UNION ALL SELECT 2, x2, x1, x2, x3, y FROM base
    UNION ALL SELECT 3, x3, x1, x2, x3, y FROM base
  ) GROUP BY fid, v
)""")
        parts.append(f"""sweep{k} AS MATERIALIZED (
  SELECT fid, v,
         SUM(swp) OVER w AS csp, SUM(swn) OVER w AS csn,
         SUM(swp) OVER f AS tp, SUM(swn) OVER f AS tn
  FROM g{k}
  WINDOW w AS (PARTITION BY fid ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         f AS (PARTITION BY fid)
)""")
        parts.append(f"""cand{k} AS MATERIALIZED (
  SELECT fid, v, 1 AS pol,
         CAST(csn + (tp - csp) AS BIGINT) AS err FROM sweep{k}
  UNION ALL
  SELECT fid, v, 0, CAST(csp + (tn - csn) AS BIGINT) FROM sweep{k}
)""")
        parts.append(
            f"e{k} AS (SELECT CAST(MIN(err) AS BIGINT) AS e FROM cand{k})"
        )
        parts.append(f"""pick{k} AS MATERIALIZED (
  SELECT fid, v, pol, err FROM cand{k}
  WHERE err = (SELECT e FROM e{k})
  ORDER BY fid, v, pol LIMIT 1
)""")
        parts.append(f"""a{k} AS MATERIALIZED (
  SELECT 0.5 * LN((1 - ec) / ec) AS a FROM (
    SELECT LEAST(GREATEST((SELECT e FROM e{k}) * 1.0
                          / (SELECT w FROM wt{k}),
                          CAST({_Q344_CLAMP} AS DOUBLE)),
                 CAST(1 - {_Q344_CLAMP} AS DOUBLE)) AS ec
  )
)""")
        pred = _q344_pred(k)
        a = f"(SELECT a FROM a{k})"
        w_expr = (
            f"FLOOR(({w_expr}) * EXP(CASE WHEN {pred} = y "
            f"THEN -{a} ELSE {a} END) + 0.5)"
        )
    score = " + ".join(
        f"(CASE WHEN {_q344_pred(k)} = 1 THEN (SELECT a FROM a{k}) "
        f"ELSE -(SELECT a FROM a{k}) END)"
        for k in range(1, _Q344_ROUNDS + 1)
    )
    parts.append(f"""acc AS (
  SELECT SUM(CASE WHEN (CASE WHEN {score} >= 0 THEN 1 ELSE -1 END) = y
             THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS acc
  FROM base
)""")
    rows = " UNION ALL ".join(
        f"""SELECT {k} AS round,
       (SELECT CASE fid WHEN 1 THEN 'cents' WHEN 2 THEN 'hour'
               ELSE 'dow' END FROM pick{k}) AS feature,
       (SELECT CAST(v AS BIGINT) FROM pick{k}) AS threshold,
       (SELECT CAST(pol AS BIGINT) FROM pick{k}) AS polarity,
       (SELECT CAST(err AS BIGINT) FROM pick{k}) AS err_milli,
       ROUND((SELECT e FROM e{k}) * 1.0 / (SELECT w FROM wt{k}), 6)
         AS err_rate,
       ROUND((SELECT a FROM a{k}), 6) AS alpha,
       ROUND((SELECT acc FROM acc), 6) AS ensemble_acc"""
        for k in range(1, _Q344_ROUNDS + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT * FROM ({rows})\nORDER BY round"
    )


_Q344_SQL = _q344_sql()


@register(
    "q344_adaboost_stumps",
    _Q344_SQL,
    doc=(
        f"AdaBoost (Freund & Schapire 1997), {_Q344_ROUNDS} rounds of "
        "decision stumps on (value-cents, hour, day-of-week) "
        "predicting is-purchase — ensemble fitting completing the "
        "model family (q311 IRLS, q334 EM, q303 single stump): row "
        "weights start integer 1000 and RE-QUANTIZE after every "
        "multiplicative update (FLOOR(w*e^{±alpha}+0.5)), so each "
        "round's weighted stump search is exact-integer value-domain "
        "sweeps (the q303 shape) with a total-order argmin; weights "
        "are per-row EXPRESSIONS of the stump parameters (no per-row "
        "state, no join), each round ONE scan + two bounded scalar "
        "collects.  Honest fixture answer: stumps on value separate "
        "purchases only marginally (the label is near-independent of "
        "the features) — accuracy hovers at the 4/5 majority rate, "
        "and the err_rate ~0.2 per round IS that report"
    ),
    tables=("events",),
)
def q344(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from osm_changesets_to_parquet_spark.operators.iterutils import (
        truncate_lineage,
    )

    ev = load_table(spark, sf_dir, "events")
    base = truncate_lineage(
        ev.select(
            F.round(F.col("value") * 100).cast("long").alias("x1"),
            (F.expr("ts_us div 3600000000") % 24).cast("long").alias("x2"),
            (
                F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
                % 7
            )
            .cast("long")
            .alias("x3"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(-1)
            .alias("y"),
        )
    )
    w_expr = F.lit(_Q344_W0).cast("long")
    picks = []  # (fid, v, pol, err, wtot, alpha)
    for _k in range(_Q344_ROUNDS):
        wtot = base.agg(F.sum(w_expr).cast("long").alias("w")).first().w
        pts = None
        for fid, xcol in ((1, "x1"), (2, "x2"), (3, "x3")):
            p = base.select(
                F.lit(fid).alias("fid"),
                F.col(xcol).alias("v"),
                F.when(F.col("y") == 1, w_expr).otherwise(0).alias("wp"),
                F.when(F.col("y") == -1, w_expr).otherwise(0).alias("wn"),
            )
            pts = p if pts is None else pts.unionByName(p)
        g = pts.groupBy("fid", "v").agg(
            F.sum("wp").cast("long").alias("swp"),
            F.sum("wn").cast("long").alias("swn"),
        )
        wv = (
            Window.partitionBy("fid")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wf = Window.partitionBy("fid")
        sweep = g.select(
            "fid",
            "v",
            F.sum("swp").over(wv).alias("csp"),
            F.sum("swn").over(wv).alias("csn"),
            F.sum("swp").over(wf).alias("tp"),
            F.sum("swn").over(wf).alias("tn"),
        )
        cand = sweep.select(
            "fid",
            "v",
            F.lit(1).alias("pol"),
            (F.col("csn") + (F.col("tp") - F.col("csp"))).alias("err"),
        ).unionByName(
            sweep.select(
                "fid",
                "v",
                F.lit(0).alias("pol"),
                (F.col("csp") + (F.col("tn") - F.col("csn"))).alias("err"),
            )
        )
        cand = truncate_lineage(cand)
        e = cand.agg(F.min("err").cast("long").alias("e")).first().e
        pk = (
            cand.where(F.col("err") == e)
            .orderBy("fid", "v", "pol")
            .limit(1)
            .first()
        )
        ec = max(min(float(e) * 1.0 / float(wtot), 1 - _Q344_CLAMP), _Q344_CLAMP)
        alpha = 0.5 * math.log((1 - ec) / ec)
        picks.append((pk.fid, pk.v, pk.pol, e, wtot, alpha))
        xf = F.col({1: "x1", 2: "x2", 3: "x3"}[pk.fid])
        pred = F.when(
            xf <= F.lit(pk.v),
            F.lit(1) if pk.pol == 1 else F.lit(-1),
        ).otherwise(F.lit(-1) if pk.pol == 1 else F.lit(1))
        w_expr = F.floor(
            w_expr
            * F.exp(
                F.when(pred == F.col("y"), F.lit(-alpha)).otherwise(
                    F.lit(alpha)
                )
            )
            + F.lit(0.5)
        ).cast("long")
    score = None
    for (fid, v, pol, _e, _w, alpha) in picks:
        xf = F.col({1: "x1", 2: "x2", 3: "x3"}[fid])
        pred = F.when(
            xf <= F.lit(v), F.lit(1) if pol == 1 else F.lit(-1)
        ).otherwise(F.lit(-1) if pol == 1 else F.lit(1))
        term = F.when(pred == 1, F.lit(alpha)).otherwise(F.lit(-alpha))
        score = term if score is None else score + term
    acc = (
        base.agg(
            (
                F.sum(
                    (
                        F.when(score >= 0, 1).otherwise(-1) == F.col("y")
                    ).cast("long")
                )
                * F.lit(1.0)
                / F.count(F.lit(1))
            ).alias("acc")
        ).first().acc
    )
    structs = [
        F.struct(
            F.lit(k + 1).cast("int").alias("round"),
            F.lit(_Q344_FEATURES[fid]).alias("feature"),
            F.lit(v).cast("long").alias("threshold"),
            F.lit(pol).cast("long").alias("polarity"),
            F.lit(e).cast("long").alias("err_milli"),
            F.round(F.lit(float(e) * 1.0 / float(wtot)), 6).alias(
                "err_rate"
            ),
            F.round(F.lit(alpha), 6).alias("alpha"),
            F.round(F.lit(acc), 6).alias("ensemble_acc"),
        )
        for k, (fid, v, pol, e, wtot, alpha) in enumerate(picks)
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("r"))
        .select(
            "r.round",
            "r.feature",
            "r.threshold",
            "r.polarity",
            "r.err_milli",
            "r.err_rate",
            "r.alpha",
            "r.ensemble_acc",
        )
        .orderBy("round")
    )
