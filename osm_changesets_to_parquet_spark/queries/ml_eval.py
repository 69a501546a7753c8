"""Round-7 session-2 queries (q232+): model evaluation, classical
ML, inference, time-series, and rate/cohort analytics.

The reference engine (/root/reference/src/main.rs — a 456-line
XML->parquet converter) has no analytics surface; these queries extend
the engine the way a training-data/eval pipeline needs (SURVEY §2.C).
The module groups by REGISTRATION ERA, not family — the per-family
index lives in SURVEY §2 (graph ops landed in queries/graph.py, ANN
in queries/ann.py, corpus laws in queries/quality.py).  Common shape:
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
from osm_changesets_to_parquet_spark.operators.multitest import bh_stepup
from osm_changesets_to_parquet_spark.operators.nbayes import naive_bayes_predict
from osm_changesets_to_parquet_spark.operators.quality import (
    hash_bucket,
    sql_hash_bucket,
)
from osm_changesets_to_parquet_spark.queries import register

# ---------------------------------------------------------------------------
# q232: Spearman rank correlation from contingency counts
# ---------------------------------------------------------------------------

_Q232_SQL = """
WITH cells AS (
  SELECT l_returnflag AS g,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS y,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1, 2, 3
),
xm AS (SELECT g, x, CAST(SUM(cnt) AS BIGINT) AS cx FROM cells GROUP BY g, x),
ym AS (SELECT g, y, CAST(SUM(cnt) AS BIGINT) AS cy FROM cells GROUP BY g, y),
xr AS (
  SELECT g, x,
         2 * COALESCE(SUM(cx) OVER (PARTITION BY g ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cx + 1 AS tx
  FROM xm
),
yr AS (
  SELECT g, y,
         2 * COALESCE(SUM(cy) OVER (PARTITION BY g ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cy + 1 AS ty
  FROM ym
),
j AS (
  SELECT c.g, c.cnt, xr.tx, yr.ty
  FROM cells c
  JOIN xr ON xr.g = c.g AND xr.x = c.x
  JOIN yr ON yr.g = c.g AND yr.y = c.y
),
s AS (
  SELECT g,
         CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(cnt * tx) AS BIGINT) AS sx,
         CAST(SUM(cnt * ty) AS BIGINT) AS sy,
         CAST(SUM(cnt * tx * ty) AS BIGINT) AS sxy,
         CAST(SUM(cnt * tx * tx) AS BIGINT) AS sxx,
         CAST(SUM(cnt * ty * ty) AS BIGINT) AS syy
  FROM j GROUP BY g
)
SELECT g, n,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
             6) AS rho
FROM s ORDER BY g
"""


@register(
    "q232_spearman",
    _Q232_SQL,
    doc=(
        "tie-aware Spearman rank correlation (quantity vs discount "
        "percent per returnflag) computed ENTIRELY from contingency "
        "counts: average ranks come from cumulative marginal counts "
        "(doubled so .5 average ranks stay exact BIGINTs), and rho is "
        "Pearson on doubled ranks via integer power sums — no per-row "
        "rank window ever touches the fact table, so the only "
        "full-data shuffle is the (group,x,y) cell rollup (<=550 "
        "cells/group); rank frames are |distinct-value|-sized and "
        "broadcast back onto the cells"
    ),
    tables=("lineitem",),
)
def q232(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cells = (
        li.select(
            F.col("l_returnflag").alias("g"),
            F.col("l_quantity").cast("long").alias("x"),
            F.round(F.col("l_discount") * 100).cast("long").alias("y"),
        )
        .groupBy("g", "x", "y")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # marginal counts -> doubled average ranks; windows run over
    # |distinct x| <= 50 rows per group, never over the fact table
    before = Window.partitionBy("g").orderBy("x").rowsBetween(
        Window.unboundedPreceding, -1
    )
    xr = (
        cells.groupBy("g", "x")
        .agg(F.sum("cnt").alias("cx"))
        .select(
            "g",
            "x",
            (
                2 * F.coalesce(F.sum("cx").over(before), F.lit(0))
                + F.col("cx")
                + 1
            ).alias("tx"),
        )
    )
    before_y = Window.partitionBy("g").orderBy("y").rowsBetween(
        Window.unboundedPreceding, -1
    )
    yr = (
        cells.groupBy("g", "y")
        .agg(F.sum("cnt").alias("cy"))
        .select(
            "g",
            "y",
            (
                2 * F.coalesce(F.sum("cy").over(before_y), F.lit(0))
                + F.col("cy")
                + 1
            ).alias("ty"),
        )
    )
    j = cells.join(F.broadcast(xr), ["g", "x"]).join(F.broadcast(yr), ["g", "y"])
    s = j.groupBy("g").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt") * F.col("tx")).alias("sx"),
        F.sum(F.col("cnt") * F.col("ty")).alias("sy"),
        F.sum(F.col("cnt") * F.col("tx") * F.col("ty")).alias("sxy"),
        F.sum(F.col("cnt") * F.col("tx") * F.col("tx")).alias("sxx"),
        F.sum(F.col("cnt") * F.col("ty") * F.col("ty")).alias("syy"),
    )
    n_d = F.col("n").cast("double")
    num = n_d * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        (n_d * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (n_d * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return s.select(
        "g", "n", F.round(num / den, 6).alias("rho")
    ).orderBy("g")


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
# q234: Benjamini-Hochberg FDR control over per-cell mean shifts
# ---------------------------------------------------------------------------

_Q234_ALPHA = 0.05

_Q234_SQL = f"""
WITH e AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
              AS BIGINT) AS dow,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(v) AS BIGINT) AS s1,
         CAST(SUM(v * v) AS BIGINT) AS s2
  FROM e
),
cell AS (
  SELECT event_type, dow,
         CAST(COUNT(*) AS BIGINT) AS n_c,
         CAST(SUM(v) AS BIGINT) AS s1c
  FROM e GROUP BY event_type, dow
),
z AS (
  SELECT c.event_type, c.dow, c.n_c,
         (CAST(c.s1c AS DOUBLE) / c.n_c - CAST(g.s1 AS DOUBLE) / g.n_g)
         / SQRT(((CAST(g.s2 AS DOUBLE)
                  - CAST(g.s1 AS DOUBLE) * g.s1 / g.n_g) / (g.n_g - 1))
                / c.n_c) AS zs
  FROM cell c CROSS JOIN g
),
p AS (
  SELECT event_type, dow, n_c, zs,
         1.0 / (1.0 + zs * zs) AS pv,
         ROW_NUMBER() OVER (ORDER BY 1.0 / (1.0 + zs * zs), event_type, dow)
           AS rn,
         COUNT(*) OVER () AS m
  FROM z
),
k AS (
  SELECT *,
         MAX(CASE WHEN pv * m <= {_Q234_ALPHA} * rn THEN rn ELSE 0 END)
           OVER () AS kmax
  FROM p
)
SELECT event_type, dow, n_c,
       ROUND(zs, 4) AS z,
       ROUND(pv, 6) AS p_surrogate,
       rn <= kmax AS rejected
FROM k ORDER BY event_type, dow
"""


@register(
    "q234_bh_fdr",
    _Q234_SQL,
    doc=(
        "multiple-testing control: every (event_type, dow) cell gets a "
        "one-sample z for its mean value-in-cents vs the global mean "
        "(variance from INTEGER power sums over quantized cents — "
        "double summation is order-dependent across engines, integer "
        "summation is not), then Benjamini-Hochberg step-up at "
        "alpha=0.05 rejects the top-k cells; the CDF is replaced by "
        "the rational surrogate p=1/(1+z^2) (strictly monotone in "
        "|z|, so the rank procedure is EXACT and engine-identical; "
        "swap a calibrated CDF in production) — the step-up "
        "(operators/multitest.bh_stepup) runs on the |cells|-row "
        "frame (35 rows), the fact table is touched once for the "
        "cell rollup; the fixture's value column is null w.r.t. "
        "(type,dow), so ZERO rejections is the correct answer here — "
        "the reject branch is pinned by the planted-shift unit test"
    ),
    tables=("events",),
)
def q234(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        (
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            % 7
        ).cast("long").alias("dow"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    g = e.agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    cell = e.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n_c"), F.sum("v").alias("s1c")
    )
    var_g = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n_g")
    ) / (F.col("n_g") - 1)
    zs = (
        F.col("s1c").cast("double") / F.col("n_c")
        - F.col("s1").cast("double") / F.col("n_g")
    ) / F.sqrt(var_g / F.col("n_c"))
    z = cell.crossJoin(F.broadcast(g)).select(
        "event_type", "dow", "n_c", zs.alias("zs")
    )
    # |cells|-row frame (5 types x 7 dows): bh_stepup's unpartitioned
    # windows run over 35 rows, a documented-bounded WindowExec
    p = z.withColumn("pv", 1.0 / (1.0 + F.col("zs") * F.col("zs")))
    k = bh_stepup(p, "pv", _Q234_ALPHA, tie_cols=("event_type", "dow"))
    return k.select(
        "event_type",
        "dow",
        "n_c",
        F.round("zs", 4).alias("z"),
        F.round("pv", 6).alias("p_surrogate"),
        "rejected",
    ).orderBy("event_type", "dow")


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
# q236: Holt double exponential smoothing (level + trend forecast)
# ---------------------------------------------------------------------------

# alpha = beta = 0.5: every smoothing op is multiply-by-0.5 / add of
# exact doubles — the identical IEEE op sequence in python and SQL, so
# the recursion is bit-deterministic with no rounding discipline needed
_Q236_SQL = """
WITH RECURSIVE daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
  FROM daily
),
nn AS (SELECT event_type, CAST(MAX(rn) AS BIGINT) AS n FROM idx GROUP BY 1),
init AS (
  SELECT i1.event_type, i1.y AS l, i2.y - i1.y AS b
  FROM idx i1
  JOIN idx i2 ON i2.event_type = i1.event_type AND i2.rn = 2
  WHERE i1.rn = 1
),
r(event_type, t, l, b) AS (
  SELECT event_type, 1, l, b FROM init
  UNION ALL
  SELECT r.event_type, r.t + 1,
         0.5 * d.y + 0.5 * (r.l + r.b),
         0.5 * ((0.5 * d.y + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
  FROM r JOIN idx d ON d.event_type = r.event_type AND d.rn = r.t + 1
)
SELECT r.event_type, nn.n AS n_days,
       ROUND(r.l, 4) AS level,
       ROUND(r.b, 4) AS trend,
       ROUND(r.l + 7 * r.b, 4) AS forecast_7d
FROM r JOIN nn ON nn.event_type = r.event_type AND r.t = nn.n
ORDER BY r.event_type
"""


@register(
    "q236_holt_smoothing",
    _Q236_SQL,
    doc=(
        "Holt double exponential smoothing over per-type daily counts "
        "(level + trend, 7-day-ahead forecast): the engine runs the "
        "inherently-sequential recursion per key inside ONE "
        "applyInPandas over the |days|-row rollup (30 rows/key — the "
        "fact table is reduced first, so the Python stage sees "
        "kilobytes), the oracle mirrors it as a recursive CTE; "
        "alpha=beta=0.5 makes every smoothing op dyadic, so both "
        "engines walk the identical IEEE op sequence bit-for-bit"
    ),
    tables=("events",),
)
def q236(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        ys = [float(v) for v in pdf["y"]]
        if len(ys) < 2:
            lvl, tr = (ys[0] if ys else 0.0), 0.0
        else:
            lvl, tr = ys[0], ys[1] - ys[0]
            for y in ys[1:]:
                new_l = 0.5 * y + 0.5 * (lvl + tr)
                tr = 0.5 * (new_l - lvl) + 0.5 * tr
                lvl = new_l
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(ys)],
                "level": [lvl],
                "trend": [tr],
            }
        )

    out = daily.groupBy("event_type").applyInPandas(
        holt,
        "event_type string, n_days long, level double, trend double",
    )
    return out.select(
        "event_type",
        "n_days",
        F.round("level", 4).alias("level"),
        F.round("trend", 4).alias("trend"),
        F.round(F.col("level") + 7 * F.col("trend"), 4).alias("forecast_7d"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q237: Kendall tau-b between daily volume and daily revenue
# ---------------------------------------------------------------------------

_Q237_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS conc,
         CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS disc,
         CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tie_x,
         CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS tie_y
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(conc) AS BIGINT) AS concordant,
       CAST(SUM(disc) AS BIGINT) AS discordant,
       ROUND((SUM(conc) - SUM(disc))
             / SQRT((COUNT(*) - CAST(SUM(tie_x) AS DOUBLE))
                    * (COUNT(*) - CAST(SUM(tie_y) AS DOUBLE))), 6) AS tau_b
FROM pairs GROUP BY event_type ORDER BY event_type
"""


@register(
    "q237_kendall_tau",
    _Q237_SQL,
    doc=(
        "Kendall tau-b between daily event volume and daily revenue "
        "cents per type: concordant/discordant/tie counts from the "
        "O(days^2) pair self-join — quadratic in DAYS (30 -> 435 "
        "pairs/key), NOT in rows, because the fact table is rolled up "
        "to (type, day) integers first; every comparison is exact "
        "integer sign arithmetic, tau-b's tie correction included"
    ),
    tables=("events",),
)
def q237(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).cast("long").alias("d"),
        )
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"),
        )
    )
    a = daily.alias("a")
    b = daily.alias("b")
    dx = F.col("a.x") - F.col("b.x")
    dy = F.col("a.y") - F.col("b.y")
    pairs = (
        a.join(b, F.col("a.event_type") == F.col("b.event_type"))
        .where(F.col("a.d") < F.col("b.d"))
        .select(
            F.col("a.event_type").alias("event_type"),
            F.when(dx * dy > 0, 1).otherwise(0).alias("conc"),
            F.when(dx * dy < 0, 1).otherwise(0).alias("disc"),
            F.when(F.col("a.x") == F.col("b.x"), 1).otherwise(0).alias("tie_x"),
            F.when(F.col("a.y") == F.col("b.y"), 1).otherwise(0).alias("tie_y"),
        )
    )
    s = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("conc").alias("concordant"),
        F.sum("disc").alias("discordant"),
        F.sum("tie_x").alias("tx"),
        F.sum("tie_y").alias("ty"),
    )
    tau = (F.col("concordant") - F.col("discordant")) / F.sqrt(
        (F.col("n_pairs") - F.col("tx").cast("double"))
        * (F.col("n_pairs") - F.col("ty").cast("double"))
    )
    return s.select(
        "event_type",
        "n_pairs",
        "concordant",
        "discordant",
        F.round(tau, 6).alias("tau_b"),
    ).orderBy("event_type")


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
# q240: lead-lag cross-correlation between two event series
# ---------------------------------------------------------------------------

_Q240_A = "view"
_Q240_B = "purchase"
_Q240_LAGS = (-3, -2, -1, 0, 1, 2, 3)

_Q240_SQL = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE event_type IN ('{_Q240_A}', '{_Q240_B}')
  GROUP BY 1, 2
),
lags(lag) AS (
  SELECT * FROM (VALUES {", ".join(f"({x})" for x in _Q240_LAGS)}) v(lag)
),
pairs AS (
  SELECT l.lag, a.c AS x, b.c AS y
  FROM lags l
  JOIN daily a ON a.event_type = '{_Q240_A}'
  JOIN daily b ON b.event_type = '{_Q240_B}' AND b.d = a.d + l.lag
),
s AS (
  SELECT lag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
             6) AS r
FROM s ORDER BY lag
"""


@register(
    "q240_leadlag_xcorr",
    _Q240_SQL,
    doc=(
        f"lead-lag cross-correlation between the daily '{_Q240_A}' and "
        f"'{_Q240_B}' volume series at lags {_Q240_LAGS[0]}..+"
        f"{_Q240_LAGS[-1]} (does one series LEAD the other — the "
        "q170 autocorrelation machinery, crossed): the fact table "
        "rolls up to (type, day) integer counts first, the 7-row lag "
        "frame cross-joins onto the |days| rollup, and Pearson per "
        "lag comes from exact integer power sums — boundary days "
        "shrink n per lag, handled by per-lag n in the formula"
    ),
    tables=("events",),
)
def q240(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type").isin(_Q240_A, _Q240_B))
        .groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).cast("long").alias("d"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a = daily.where(F.col("event_type") == _Q240_A).select(
        F.col("d").alias("da"), F.col("c").alias("x")
    )
    b = daily.where(F.col("event_type") == _Q240_B).select(
        F.col("d").alias("db"), F.col("c").alias("y")
    )
    lags = spark.createDataFrame(
        [(x,) for x in _Q240_LAGS], "lag LONG"
    )
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("db") == F.col("da") + F.col("lag"))
        .select("lag", "x", "y")
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n_d = F.col("n").cast("double")
    num = n_d * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        (n_d * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (n_d * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return s.select("lag", "n", F.round(num / den, 6).alias("r")).orderBy("lag")


# ---------------------------------------------------------------------------
# q241: vocabulary coverage curve (tokenizer budget design)
# ---------------------------------------------------------------------------

_Q241_KS = (10, 50, 100, 250, 500)

_Q241_SQL = f"""
WITH tok AS (
  SELECT string_split(text, ' ') AS ws FROM documents
),
grams AS (
  SELECT ws[i] || ' ' || ws[i + 1] AS g
  FROM tok, UNNEST(range(1, len(ws))) AS u(i)
),
f AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c FROM grams GROUP BY g),
ranked AS (
  SELECT c,
         ROW_NUMBER() OVER (ORDER BY c DESC, g) AS rk,
         CAST(SUM(c) OVER () AS BIGINT) AS total,
         CAST(SUM(c) OVER (ORDER BY c DESC, g
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum
  FROM f
),
ks(k) AS (SELECT * FROM (VALUES {", ".join(f"({k})" for k in _Q241_KS)}) v(k))
SELECT CAST(k AS BIGINT) AS k,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM f) AS vocab_size,
       ROUND(CAST(MAX(CASE WHEN rk <= k THEN cum ELSE 0 END) AS DOUBLE)
             / ANY_VALUE(total), 6) AS coverage
FROM ranked CROSS JOIN ks
GROUP BY k ORDER BY k
"""


@register(
    "q241_vocab_coverage",
    _Q241_SQL,
    doc=(
        "vocabulary coverage curve over word BIGRAMS (the tokenizer-"
        "budget question: what share of occurrences does a top-k "
        "vocabulary cover): in-row gram construction (zero shuffle "
        "before the type rollup), then rank + running share over the "
        "|gram types|-sized frequency table — the only window in the "
        "plan is VOCABULARY-sized (~900 types here), never corpus-"
        "sized, the q144 BPE discipline; total order by (count desc, "
        "gram) pins rank ties"
    ),
    tables=("documents",),
)
def q241(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 1), "
                "i -> concat(split(text, ' ')[i - 1], ' ', "
                "split(text, ' ')[i]))"
            )
        ).alias("g")
    )
    f = grams.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    # vocabulary-sized windows (|gram types|, ~900 rows)
    order = Window.orderBy(F.col("c").desc(), F.col("g"))
    whole = Window.partitionBy().orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = f.select(
        "c",
        F.row_number().over(order).alias("rk"),
        F.sum("c").over(whole).alias("total"),
        F.sum("c").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
    )
    vocab_size = f.agg(F.count(F.lit(1)).alias("vocab_size"))
    ks = spark.createDataFrame([(k,) for k in _Q241_KS], "k LONG")
    return (
        ranked.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.round(
                F.max(
                    F.when(F.col("rk") <= F.col("k"), F.col("cum")).otherwise(0)
                ).cast("double")
                / F.first("total"),
                6,
            ).alias("coverage")
        )
        .crossJoin(F.broadcast(vocab_size))
        .select("k", "vocab_size", "coverage")
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# q242: Cramér's V association matrix over categorical pairs
# ---------------------------------------------------------------------------


def _q242_pair_sql(name: str, a: str, b: str) -> str:
    return f"""
SELECT '{name}' AS pair,
       CAST(SUM(o) AS BIGINT) AS n,
       ROUND(SUM(POWER(o - e, 2) / e), 4) AS chi2,
       ROUND(SQRT(SUM(POWER(o - e, 2) / e)
             / (SUM(o) * (LEAST((SELECT COUNT(DISTINCT {a}) FROM base),
                                (SELECT COUNT(DISTINCT {b}) FROM base))
                          - 1))), 6) AS v
FROM (
  SELECT o,
         CAST(ra AS DOUBLE) * rb / tot AS e
  FROM (
    SELECT CAST(COUNT(*) AS BIGINT) AS o, {a} AS av, {b} AS bv
    FROM base GROUP BY {a}, {b}
  ) cell
  JOIN (SELECT {a} AS av, CAST(COUNT(*) AS BIGINT) AS ra
        FROM base GROUP BY {a}) x USING (av)
  JOIN (SELECT {b} AS bv, CAST(COUNT(*) AS BIGINT) AS rb
        FROM base GROUP BY {b}) y USING (bv)
  CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM base) t
)"""


_Q242_SQL = f"""
WITH base AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
              AS BIGINT) AS dow,
         CAST(hour(ts) // 6 AS BIGINT) AS hb
  FROM events
)
{_q242_pair_sql("event_type~dow", "event_type", "dow")}
UNION ALL
{_q242_pair_sql("event_type~hour_bucket", "event_type", "hb")}
UNION ALL
{_q242_pair_sql("dow~hour_bucket", "dow", "hb")}
ORDER BY pair
"""


def _q242_pair(base: DataFrame, name: str, a: str, b: str) -> DataFrame:
    cell = base.groupBy(F.col(a).alias("av"), F.col(b).alias("bv")).agg(
        F.count(F.lit(1)).alias("o")
    )
    ra = base.groupBy(F.col(a).alias("av")).agg(F.count(F.lit(1)).alias("ra"))
    rb = base.groupBy(F.col(b).alias("bv")).agg(F.count(F.lit(1)).alias("rb"))
    tot = base.agg(F.count(F.lit(1)).alias("tot"))
    card = base.agg(
        F.least(
            F.count_distinct(F.col(a)), F.count_distinct(F.col(b))
        ).alias("minrc")
    )
    e = F.col("ra").cast("double") * F.col("rb") / F.col("tot")
    j = (
        cell.join(F.broadcast(ra), "av")
        .join(F.broadcast(rb), "bv")
        .crossJoin(F.broadcast(tot))
        .select("o", e.alias("e"))
    )
    return (
        j.agg(
            F.sum("o").alias("n"),
            F.sum(F.pow(F.col("o") - F.col("e"), 2) / F.col("e")).alias("chi2r"),
        )
        .crossJoin(F.broadcast(card))
        .select(
            F.lit(name).alias("pair"),
            F.col("n"),
            F.round("chi2r", 4).alias("chi2"),
            F.round(
                F.sqrt(F.col("chi2r") / (F.col("n") * (F.col("minrc") - 1))), 6
            ).alias("v"),
        )
    )


@register(
    "q242_cramers_v",
    _Q242_SQL,
    doc=(
        "Cramér's V association matrix over the categorical pairs "
        "(event_type, dow, hour-bucket): observed/expected from "
        "integer contingency + marginal rollups (cells joined to "
        "broadcast marginals — the q214 chi2 machinery generalized to "
        "pairwise), V = sqrt(chi2 / (n*(min(r,c)-1))); three cell "
        "rollups over one scan each, every output value derived from "
        "exact integer counts"
    ),
    tables=("events",),
)
def q242(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        (
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            % 7
        ).cast("long").alias("dow"),
        F.floor(F.hour("ts") / 6).cast("long").alias("hb"),
    )
    return (
        _q242_pair(base, "event_type~dow", "event_type", "dow")
        .unionByName(
            _q242_pair(base, "event_type~hour_bucket", "event_type", "hb")
        )
        .unionByName(_q242_pair(base, "dow~hour_bucket", "dow", "hb"))
        .orderBy("pair")
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
# q247: Wilson score confidence intervals for per-type proportions
# ---------------------------------------------------------------------------

_Q247_Z = 1.96
_Q247_CUT = 100  # "high-value" event: value >= 100

_Q247_SQL = f"""
WITH s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN value >= {_Q247_CUT} THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM events GROUP BY event_type
)
SELECT event_type, n, k,
       ROUND((CAST(k AS DOUBLE) / n + {_Q247_Z} * {_Q247_Z} / (2 * n)
              - {_Q247_Z} * SQRT((CAST(k AS DOUBLE) / n)
                  * (1 - CAST(k AS DOUBLE) / n) / n
                  + {_Q247_Z} * {_Q247_Z} / (4.0 * n * n)))
             / (1 + {_Q247_Z} * {_Q247_Z} / n), 6) AS lo,
       ROUND((CAST(k AS DOUBLE) / n + {_Q247_Z} * {_Q247_Z} / (2 * n)
              + {_Q247_Z} * SQRT((CAST(k AS DOUBLE) / n)
                  * (1 - CAST(k AS DOUBLE) / n) / n
                  + {_Q247_Z} * {_Q247_Z} / (4.0 * n * n)))
             / (1 + {_Q247_Z} * {_Q247_Z} / n), 6) AS hi
FROM s ORDER BY event_type
"""


@register(
    "q247_wilson_ci",
    _Q247_SQL,
    doc=(
        "Wilson score 95% confidence interval for the per-type "
        "high-value proportion (the interval that behaves at p near "
        "0/1 where the Wald interval collapses): one conditional-sum "
        "rollup per type, closed-form interval from exact integer "
        "(n, k) — identical double arithmetic both engines, no "
        "simulation, no CDF"
    ),
    tables=("events",),
)
def q247(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") >= _Q247_CUT, 1).otherwise(0)).alias("k"),
    )
    z = _Q247_Z
    p = F.col("k").cast("double") / F.col("n")
    n = F.col("n")
    center = p + z * z / (2 * n)
    half = z * F.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    denom = 1 + z * z / n
    return s.select(
        "event_type",
        "n",
        "k",
        F.round((center - half) / denom, 6).alias("lo"),
        F.round((center + half) / denom, 6).alias("hi"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q248: difference-in-differences estimator (2x2 panel, integer-exact)
# ---------------------------------------------------------------------------

_Q248_POST_DAY = 15  # midpoint of the 30-day fixture window

_Q248_SQL = f"""
WITH e AS (
  SELECT event_type,
         {sql_hash_bucket("user_id", 2)} AS treated,
         CASE WHEN CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                   AS BIGINT) >= {_Q248_POST_DAY} THEN 1 ELSE 0 END AS post,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events
),
cell AS (
  SELECT event_type, treated, post,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s
  FROM e GROUP BY 1, 2, 3
),
wide AS (
  SELECT event_type,
         MAX(CASE WHEN treated = 1 AND post = 1 THEN CAST(s AS DOUBLE) / n
             END) AS t_post,
         MAX(CASE WHEN treated = 1 AND post = 0 THEN CAST(s AS DOUBLE) / n
             END) AS t_pre,
         MAX(CASE WHEN treated = 0 AND post = 1 THEN CAST(s AS DOUBLE) / n
             END) AS c_post,
         MAX(CASE WHEN treated = 0 AND post = 0 THEN CAST(s AS DOUBLE) / n
             END) AS c_pre,
         CAST(SUM(n) AS BIGINT) AS n_total
  FROM cell GROUP BY event_type
)
SELECT event_type, n_total,
       ROUND(t_pre / 100, 4) AS treated_pre,
       ROUND(t_post / 100, 4) AS treated_post,
       ROUND(c_pre / 100, 4) AS control_pre,
       ROUND(c_post / 100, 4) AS control_post,
       ROUND(((t_post - t_pre) - (c_post - c_pre)) / 100, 4) AS did
FROM wide ORDER BY event_type
"""


@register(
    "q248_diff_in_diff",
    _Q248_SQL,
    doc=(
        "difference-in-differences over the 2x2 (treated x pre/post) "
        "panel per type — treatment assignment is the deterministic "
        "user-id hash (a synthetic rollout), post = day >= 15: four "
        "cell means from INTEGER cents power sums, DiD = "
        "(Tpost-Tpre)-(Cpost-Cpre); one cell rollup over one scan, a "
        "|types|x4 frame after — the fixture's value is "
        "assignment-independent so did ~ 0 is the correct null "
        "answer (the estimator's arithmetic is what the oracle and "
        "the brute-force test pin)"
    ),
    tables=("events",),
)
def q248(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        hash_bucket("user_id", 2).alias("treated"),
        F.when(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).cast("long")
            >= _Q248_POST_DAY,
            1,
        ).otherwise(0).alias("post"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    cell = e.groupBy("event_type", "treated", "post").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    mean = F.col("s").cast("double") / F.col("n")

    def cell_mean(t: int, p: int):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), mean)
        )

    wide = cell.groupBy("event_type").agg(
        cell_mean(1, 1).alias("t_post"),
        cell_mean(1, 0).alias("t_pre"),
        cell_mean(0, 1).alias("c_post"),
        cell_mean(0, 0).alias("c_pre"),
        F.sum("n").alias("n_total"),
    )
    return wide.select(
        "event_type",
        "n_total",
        F.round(F.col("t_pre") / 100, 4).alias("treated_pre"),
        F.round(F.col("t_post") / 100, 4).alias("treated_post"),
        F.round(F.col("c_pre") / 100, 4).alias("control_pre"),
        F.round(F.col("c_post") / 100, 4).alias("control_post"),
        F.round(
            ((F.col("t_post") - F.col("t_pre"))
             - (F.col("c_post") - F.col("c_pre"))) / 100,
            4,
        ).alias("did"),
    ).orderBy("event_type")


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
# q254: randomization test for a two-group mean difference
# ---------------------------------------------------------------------------

_Q254_N_PERMS = 19
_Q254_SALT = 9973

_Q254_SQL = f"""
WITH base AS (
  SELECT event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events WHERE event_type IN ('purchase', 'view')
),
stats AS (
  SELECT j,
         CAST(SUM(CASE WHEN gj = 1 THEN v ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN gj = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN gj = 0 THEN v ELSE 0 END) AS BIGINT) AS s0,
         CAST(SUM(CASE WHEN gj = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
  FROM (
    SELECT j,
           CASE WHEN j = 0 THEN g
                ELSE {sql_hash_bucket(f"event_id + j * {_Q254_SALT}", 2)}
           END AS gj,
           v
    FROM base CROSS JOIN (
      SELECT * FROM UNNEST(range(0, {_Q254_N_PERMS + 1})) AS u(j)
    )
  ) GROUP BY j
),
diffs AS (
  SELECT j,
         ABS(CAST(s1 AS DOUBLE) * n0 - CAST(s0 AS DOUBLE) * n1) AS absnum,
         CAST(n1 AS DOUBLE) * n0 AS denom,
         (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0) AS diff
  FROM stats
),
obs AS (SELECT absnum, denom, diff FROM diffs WHERE j = 0)
SELECT ROUND(obs.diff / 100, 4) AS obs_diff,
       CAST(COUNT(*) FILTER (WHERE d.j > 0
              AND d.absnum * obs.denom >= obs.absnum * d.denom)
            AS BIGINT) AS n_extreme,
       ROUND((1.0 + COUNT(*) FILTER (WHERE d.j > 0
              AND d.absnum * obs.denom >= obs.absnum * d.denom))
             / (1.0 + {_Q254_N_PERMS}), 4) AS p_value
FROM diffs d CROSS JOIN obs
GROUP BY obs.diff, obs.absnum, obs.denom
"""


@register(
    "q254_randomization_test",
    _Q254_SQL,
    doc=(
        "randomization test for the purchase-vs-view mean-value gap: "
        f"{_Q254_N_PERMS} deterministic hash reassignments (salted "
        "id-hash parity — randomization inference with reproducible "
        "'permutations', the engine-wide no-RNG rule) each recompute "
        "the group-mean difference from integer sums in the SAME "
        "single scan (a 20-way conditional rollup, not 20 passes); "
        "the two-sided p compares |s1*n0 - s0*n1| cross-multiplied — "
        "deterministic double products of exact integers, no "
        "division-order exposure in the DECISION"
    ),
    tables=("events",),
)
def q254(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.where(F.col("event_type").isin("purchase", "view")).select(
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    js = spark.createDataFrame(
        [(j,) for j in range(_Q254_N_PERMS + 1)], "j LONG"
    )
    assigned = base.crossJoin(F.broadcast(js)).select(
        "j",
        F.when(F.col("j") == 0, F.col("g"))
        .otherwise(
            hash_bucket(
                F.col("event_id") + F.col("j") * _Q254_SALT, 2
            )
        )
        .alias("gj"),
        "v",
    )
    stats = assigned.groupBy("j").agg(
        F.sum(F.when(F.col("gj") == 1, F.col("v")).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("gj") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("gj") == 0, F.col("v")).otherwise(0)).alias("s0"),
        F.sum(F.when(F.col("gj") == 0, 1).otherwise(0)).alias("n0"),
    )
    diffs = stats.select(
        "j",
        F.abs(
            F.col("s1").cast("double") * F.col("n0")
            - F.col("s0").cast("double") * F.col("n1")
        ).alias("absnum"),
        (F.col("n1").cast("double") * F.col("n0")).alias("denom"),
        (
            F.col("s1").cast("double") / F.col("n1")
            - F.col("s0").cast("double") / F.col("n0")
        ).alias("diff"),
    )
    obs = diffs.where(F.col("j") == 0).select(
        F.col("absnum").alias("o_absnum"),
        F.col("denom").alias("o_denom"),
        F.col("diff").alias("o_diff"),
    )
    extreme = F.when(
        (F.col("j") > 0)
        & (F.col("absnum") * F.col("o_denom") >= F.col("o_absnum") * F.col("denom")),
        1,
    ).otherwise(0)
    return (
        diffs.crossJoin(F.broadcast(obs))
        .agg(
            F.round(F.first("o_diff") / 100, 4).alias("obs_diff"),
            F.sum(extreme).cast("long").alias("n_extreme"),
            F.round(
                (1.0 + F.sum(extreme)) / (1.0 + _Q254_N_PERMS), 4
            ).alias("p_value"),
        )
    )


# ---------------------------------------------------------------------------
# q255: next-event prediction eval (Markov top-1 baseline)
# ---------------------------------------------------------------------------

_Q255_TRAIN_PCT = 80

_Q255_SQL = f"""
WITH t AS (
  SELECT user_id, event_type,
         {sql_hash_bucket("user_id", 100)} < {_Q255_TRAIN_PCT} AS is_train,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY CAST(epoch_us(ts) AS BIGINT),
                                        event_id) AS src
  FROM events
),
trans AS (SELECT src, event_type AS dst, is_train FROM t WHERE src IS NOT NULL),
model AS (
  SELECT src, dst AS pred FROM (
    SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src
                     ORDER BY COUNT(*) DESC, dst) AS rk
    FROM trans WHERE is_train GROUP BY src, dst
  ) WHERE rk = 1
)
SELECT x.src,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       ANY_VALUE(m.pred) AS predicted,
       CAST(SUM(CASE WHEN x.dst = m.pred THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       ROUND(SUM(CASE WHEN x.dst = m.pred THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 4) AS accuracy
FROM trans x JOIN model m ON m.src = x.src
WHERE NOT x.is_train
GROUP BY x.src ORDER BY x.src
"""


@register(
    "q255_markov_eval",
    _Q255_SQL,
    doc=(
        "next-event prediction evaluated on held-out USERS (the "
        "behavior-model baseline: train a first-order Markov top-1 "
        "predictor on 80% of users by id hash, score transitions of "
        "the other 20%): per-user LAG windows are bounded by a "
        "user's event count (the q156 shape), the model is the "
        "|types|^2 count rollup argmaxed with a dst tie-break and "
        "BROADCAST onto the test transitions — splitting by USER not "
        "by row is the leakage discipline (a row split would let a "
        "user's own future leak into training)"
    ),
    tables=("events",),
)
def q255(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    t = ev.select(
        "user_id",
        "event_type",
        (hash_bucket("user_id", 100) < _Q255_TRAIN_PCT).alias("is_train"),
        F.lag("event_type").over(w).alias("src"),
    ).where(F.col("src").isNotNull())
    counts = (
        t.where(F.col("is_train"))
        .groupBy("src", F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_rk = Window.partitionBy("src").orderBy(F.col("c").desc(), F.col("dst"))
    model = (
        counts.withColumn("rk", F.row_number().over(w_rk))
        .where(F.col("rk") == 1)
        .select("src", F.col("dst").alias("pred"))
    )
    test = t.where(~F.col("is_train")).select(
        "src", F.col("event_type").alias("dst")
    )
    hit = F.when(F.col("dst") == F.col("pred"), 1).otherwise(0)
    return (
        test.join(F.broadcast(model), "src")
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.first("pred").alias("predicted"),
            F.sum(hit).alias("n_correct"),
            F.round(F.sum(hit) * 1.0 / F.count(F.lit(1)), 4).alias("accuracy"),
        )
        .orderBy("src")
    )


# ---------------------------------------------------------------------------
# q256: Heaps' law vocabulary-growth curve (q250's companion)
# ---------------------------------------------------------------------------

_Q256_PCTS = (20, 40, 60, 80, 100)

_Q256_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         ROW_NUMBER() OVER (ORDER BY doc_id) AS drk,
         COUNT(*) OVER () AS nd
  FROM documents
),
grams AS (
  SELECT ws[i] || ' ' || ws[i + 1] AS g, drk
  FROM d, UNNEST(range(1, len(ws))) AS u(i)
),
first_seen AS (SELECT g, CAST(MIN(drk) AS BIGINT) AS fr FROM grams GROUP BY g),
per_doc AS (
  SELECT drk, CAST(COUNT(*) AS BIGINT) AS toks FROM grams GROUP BY drk
),
ck(p) AS (SELECT * FROM (VALUES {", ".join(f"({p})" for p in _Q256_PCTS)}) v(p)),
pts AS (
  SELECT ck.p,
         (SELECT CAST(SUM(toks) AS BIGINT) FROM per_doc, (SELECT ANY_VALUE(nd)
            AS nd FROM d) x
          WHERE drk <= (ck.p * x.nd + 99) // 100) AS n_tokens,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM first_seen, (SELECT
            ANY_VALUE(nd) AS nd FROM d) x
          WHERE fr <= (ck.p * x.nd + 99) // 100) AS v_types
  FROM ck
),
fit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         SUM(ROUND(LN(n_tokens), 6)) AS sx,
         SUM(ROUND(LN(v_types), 6)) AS sy,
         SUM(ROUND(LN(n_tokens), 6) * ROUND(LN(v_types), 6)) AS sxy,
         SUM(ROUND(LN(n_tokens), 6) * ROUND(LN(n_tokens), 6)) AS sxx
  FROM pts
)
SELECT CAST(p AS BIGINT) AS pct, n_tokens, v_types,
       ROUND(CAST(v_types AS DOUBLE) / n_tokens, 6) AS ttr,
       ROUND((fit.k * fit.sxy - fit.sx * fit.sy)
             / (fit.k * fit.sxx - fit.sx * fit.sx), 4) AS heaps_beta
FROM pts CROSS JOIN fit ORDER BY pct
"""


@register(
    "q256_heaps_law",
    _Q256_SQL,
    doc=(
        "Heaps' law vocabulary-growth curve over word bigrams "
        "(q250's companion corpus law — V(n) ~ K*n^beta; natural "
        "text sits near beta 0.5, a CLOSED vocabulary like this "
        "fixture flattens toward 0): cumulative distinct types at "
        "each corpus prefix come from gram-keyed MIN(first-doc-rank) "
        "— the q224 novelty machinery, so checkpoints are threshold "
        "COUNTS over the vocabulary table, never a re-scan per "
        "checkpoint; beta is the ln-ln OLS over the checkpoint "
        "frame (q250 discipline)"
    ),
    tables=("documents",),
)
def q256(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id")
    d = docs.select(
        "doc_id",
        F.row_number().over(w).alias("drk"),
    )
    nd = docs.agg(F.count(F.lit(1)).alias("nd"))
    grams = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(split(text, ' ')) - 1), "
                    "i -> concat(split(text, ' ')[i - 1], ' ', "
                    "split(text, ' ')[i]))"
                )
            ).alias("g"),
        )
        .join(F.broadcast(d), "doc_id")
    )
    first_seen = grams.groupBy("g").agg(F.min("drk").cast("long").alias("fr"))
    per_doc = grams.groupBy("drk").agg(F.count(F.lit(1)).alias("toks"))
    ck = spark.createDataFrame([(p,) for p in _Q256_PCTS], "p LONG")
    ckn = ck.crossJoin(F.broadcast(nd)).select(
        "p", F.expr("(p * nd + 99) div 100").alias("kdoc")
    )
    n_tokens = (
        per_doc.crossJoin(F.broadcast(ckn))
        .where(F.col("drk") <= F.col("kdoc"))
        .groupBy("p")
        .agg(F.sum("toks").alias("n_tokens"))
    )
    v_types = (
        first_seen.crossJoin(F.broadcast(ckn))
        .where(F.col("fr") <= F.col("kdoc"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("v_types"))
    )
    pts = n_tokens.join(v_types, "p")
    x = F.round(F.log(F.col("n_tokens").cast("double")), 6)
    y = F.round(F.log(F.col("v_types").cast("double")), 6)
    fit = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    beta = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .select(
            F.col("p").alias("pct"),
            "n_tokens",
            "v_types",
            F.round(
                F.col("v_types").cast("double") / F.col("n_tokens"), 6
            ).alias("ttr"),
            F.round(beta, 4).alias("heaps_beta"),
        )
        .orderBy("pct")
    )


# ---------------------------------------------------------------------------
# q259: classical additive seasonal decomposition (trend/dow/resid)
# ---------------------------------------------------------------------------

_Q259_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
ma AS (
  SELECT event_type, d, y, d % 7 AS dow,
         SUM(y) OVER (PARTITION BY event_type ORDER BY d
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) / 7.0
           AS trend,
         COUNT(*) OVER (PARTITION BY event_type ORDER BY d
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w
  FROM daily
),
dw AS (
  SELECT event_type, d % 7 AS dow,
         CAST(SUM(y) AS BIGINT) AS s_dw, CAST(COUNT(*) AS BIGINT) AS n_dw
  FROM daily GROUP BY 1, 2
),
g AS (
  SELECT event_type, CAST(SUM(y) AS BIGINT) AS s_t,
         CAST(COUNT(*) AS BIGINT) AS n_t
  FROM daily GROUP BY event_type
),
resid AS (
  SELECT m.event_type,
         m.y - m.trend
           - (CAST(dw.s_dw AS DOUBLE) / dw.n_dw
              - CAST(g.s_t AS DOUBLE) / g.n_t) AS r,
         m.y
  FROM ma m
  JOIN dw ON dw.event_type = m.event_type AND dw.dow = m.dow
  JOIN g ON g.event_type = m.event_type
  WHERE m.w = 7
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days_used,
       ROUND((SUM(CAST(y AS DOUBLE) * y) - SUM(CAST(y AS DOUBLE))
              * SUM(CAST(y AS DOUBLE)) / COUNT(*)) / COUNT(*), 4)
         AS var_total,
       ROUND((SUM(r * r) - SUM(r) * SUM(r) / COUNT(*)) / COUNT(*), 4)
         AS var_resid,
       ROUND(1 - ((SUM(r * r) - SUM(r) * SUM(r) / COUNT(*)) / COUNT(*))
             / ((SUM(CAST(y AS DOUBLE) * y) - SUM(CAST(y AS DOUBLE))
                 * SUM(CAST(y AS DOUBLE)) / COUNT(*)) / COUNT(*)), 4)
         AS pct_explained
FROM resid GROUP BY event_type ORDER BY event_type
"""


@register(
    "q259_seasonal_decomposition",
    _Q259_SQL,
    doc=(
        "classical additive decomposition of per-type daily volume "
        "(trend = centered 7-day MA, seasonal = dow-mean minus grand "
        "mean, residual = the rest): the fixture's generator has a "
        "REAL weekday effect (dow-0 runs ~30% above dow-6), so "
        "pct_explained is genuinely positive; per-type windows run "
        "over the 30-day rollup, only full 7-day MA windows "
        "contribute (w=7 filter — the decomposition must not use "
        "truncated trend estimates at the series edges); residual "
        "variance sums are 24-term per-type frames rounded at 4dp"
    ),
    tables=("events",),
)
def q259(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).cast("long").alias("d"),
    ).agg(F.count(F.lit(1)).alias("y"))
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-3, 3)
    )
    ma = daily.select(
        "event_type",
        "d",
        "y",
        (F.col("d") % 7).alias("dow"),
        (F.sum("y").over(w7) / 7.0).alias("trend"),
        F.count(F.lit(1)).over(w7).alias("w"),
    )
    dw = daily.groupBy("event_type", (F.col("d") % 7).alias("dow")).agg(
        F.sum("y").alias("s_dw"), F.count(F.lit(1)).alias("n_dw")
    )
    g = daily.groupBy("event_type").agg(
        F.sum("y").alias("s_t"), F.count(F.lit(1)).alias("n_t")
    )
    resid = (
        ma.where(F.col("w") == 7)
        .join(F.broadcast(dw), ["event_type", "dow"])
        .join(F.broadcast(g), "event_type")
        .select(
            "event_type",
            "y",
            (
                F.col("y")
                - F.col("trend")
                - (
                    F.col("s_dw").cast("double") / F.col("n_dw")
                    - F.col("s_t").cast("double") / F.col("n_t")
                )
            ).alias("r"),
        )
    )
    cnt = F.count(F.lit(1))
    y_d = F.col("y").cast("double")
    var_y = (F.sum(y_d * F.col("y")) - F.sum(y_d) * F.sum(y_d) / cnt) / cnt
    var_r = (
        F.sum(F.col("r") * F.col("r")) - F.sum("r") * F.sum("r") / cnt
    ) / cnt
    return (
        resid.groupBy("event_type")
        .agg(
            cnt.alias("n_days_used"),
            F.round(var_y, 4).alias("var_total"),
            F.round(var_r, 4).alias("var_resid"),
            F.round(1 - var_r / var_y, 4).alias("pct_explained"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q260: term burstiness (index of dispersion over per-doc counts)
# ---------------------------------------------------------------------------

_Q260_SQL = """
WITH nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
per_doc AS (
  SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w, doc_id
),
s AS (
  SELECT w,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM per_doc GROUP BY w
)
SELECT w,
       s1 AS total_count,
       ROUND((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nd.n) / s1, 6)
         AS dispersion
FROM s CROSS JOIN nd
ORDER BY dispersion DESC, w LIMIT 10
"""


@register(
    "q260_term_burstiness",
    _Q260_SQL,
    doc=(
        "term burstiness via the index of dispersion D = var/mean of "
        "per-document counts (Church & Gale: content words are bursty "
        "D>>1, function words Poisson D~1 — a curation signal for "
        "templated/boilerplate corpora): zero-docs contribute nothing "
        "to the power sums so D = (s2 - s1^2/N)/s1 needs only the "
        "NONZERO (term, doc) rollup plus the document count — exact "
        "integer sums, one division per term; the fixture's uniform "
        "generator sits at the Poisson null (D~1), which the brute "
        "test pins as a property"
    ),
    tables=("documents",),
)
def q260(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nd = docs.agg(F.count(F.lit(1)).alias("n"))
    per_doc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = per_doc.groupBy("w").agg(
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    disp = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n")
    ) / F.col("s1")
    return (
        s.crossJoin(F.broadcast(nd))
        .select(
            "w",
            F.col("s1").alias("total_count"),
            F.round(disp, 6).alias("dispersion"),
        )
        .orderBy(F.col("dispersion").desc(), "w")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q261: cohort LTV curve (cumulative revenue per user by cohort age)
# ---------------------------------------------------------------------------

_Q261_SQL = """
WITH e AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) // 7 AS wk,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events
),
first_wk AS (
  SELECT user_id, CAST(MIN(wk) AS BIGINT) AS cohort FROM e GROUP BY user_id
),
cohort_size AS (
  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM first_wk GROUP BY cohort
),
cell AS (
  SELECT f.cohort, e.wk - f.cohort AS age,
         CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users,
         CAST(SUM(e.v) AS BIGINT) AS rev
  FROM e JOIN first_wk f ON f.user_id = e.user_id
  GROUP BY f.cohort, e.wk - f.cohort
),
cum AS (
  SELECT cohort, age, active_users,
         CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY age
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum_rev
  FROM cell
)
SELECT c.cohort, CAST(c.age AS BIGINT) AS age, s.n_users, c.active_users,
       ROUND(CAST(c.cum_rev AS DOUBLE) / 100, 2) AS cum_revenue,
       ROUND(CAST(c.cum_rev AS DOUBLE) / s.n_users / 100, 4)
         AS ltv_per_user
FROM cum c JOIN cohort_size s ON s.cohort = c.cohort
ORDER BY c.cohort, age
"""


@register(
    "q261_cohort_ltv",
    _Q261_SQL,
    doc=(
        "cohort LTV curves (q76 retention's revenue twin): cohort = "
        "first-activity week, cells = (cohort, age) integer cents "
        "rollups, cumulative revenue via a window over <=5 ages per "
        "cohort, normalized by the FIXED cohort size (not the "
        "shrinking active count — LTV is per enrolled user); every "
        "sum is exact integer cents"
    ),
    tables=("events",),
)
def q261(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.expr(
            "datediff(cast(ts as date), date'2024-01-01') div 7"
        ).cast("long").alias("wk"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    first_wk = e.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    cohort_size = first_wk.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    cell = (
        e.join(first_wk, "user_id")
        .groupBy("cohort", (F.col("wk") - F.col("cohort")).alias("age"))
        .agg(
            F.count_distinct("user_id").alias("active_users"),
            F.sum("v").alias("rev"),
        )
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cell.select(
        "cohort",
        F.col("age").cast("long").alias("age"),
        "active_users",
        F.sum("rev").over(w).alias("cum_rev"),
    )
    return (
        cum.join(F.broadcast(cohort_size), "cohort")
        .select(
            "cohort",
            "age",
            "n_users",
            "active_users",
            F.round(F.col("cum_rev").cast("double") / 100, 2).alias(
                "cum_revenue"
            ),
            F.round(
                F.col("cum_rev").cast("double") / F.col("n_users") / 100, 4
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort", "age")
    )


# ---------------------------------------------------------------------------
# q262: pairwise-similarity histogram (dedup-threshold diagnostic)
# ---------------------------------------------------------------------------

_Q262_NA = 32
_Q262_BIN = 100_000

_Q262_SQL = f"""
WITH anchors AS (
  SELECT vec_id FROM embeddings
  ORDER BY {{anchor_key}}, vec_id LIMIT {_Q262_NA}
),
quant AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
  FROM embeddings
),
dots AS (
  SELECT a.vec_id AS aid, v.vec_id,
         CAST(SUM(av.q * v.q) AS BIGINT) AS dot
  FROM anchors a
  JOIN quant av ON av.vec_id = a.vec_id
  JOIN quant v ON v.pos = av.pos AND v.vec_id <> a.vec_id
  GROUP BY a.vec_id, v.vec_id
)
SELECT CAST(FLOOR(dot / {_Q262_BIN}.0) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(MIN(dot) AS BIGINT) AS min_dot,
       CAST(MAX(dot) AS BIGINT) AS max_dot
FROM dots GROUP BY 1 ORDER BY bin
"""

from osm_changesets_to_parquet_spark.operators.anchors import (  # noqa: E402
    sql_anchor_order as _sql_anchor_order,
)

_Q262_SQL = _Q262_SQL.format(anchor_key=_sql_anchor_order("vec_id"))


@register(
    "q262_similarity_histogram",
    _Q262_SQL,
    doc=(
        "pairwise-similarity histogram over a fixed-k anchor panel "
        "(the threshold-choosing diagnostic BEFORE committing to a "
        "SemDeDup/near-dup cutoff: where does the corpus's similarity "
        "mass sit?): dot products of integer milli-quantized vectors "
        "are exact BIGINTs, binning FLOORs the integer dot — no "
        "double ever decides a bin — and the anchor panel is "
        f"CONSTANT-k ({_Q262_NA}), so the pass is Θ(k·n·D), never "
        "all-pairs (the q179 discipline)"
    ),
    tables=("embeddings",),
)
def q262(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.anchors import (
        fixed_k_anchors,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = fixed_k_anchors(emb, "vec_id", _Q262_NA).select(
        F.col("vec_id").alias("aid")
    )
    quant = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "v")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("v").cast("double") * 1000).cast("long").alias("q"),
    )
    aq = anchors.join(
        quant.select(F.col("vec_id").alias("aid"), "pos", F.col("q").alias("aq")),
        "aid",
    )
    dots = (
        quant.join(F.broadcast(aq), "pos")
        .where(F.col("vec_id") != F.col("aid"))
        .groupBy("aid", "vec_id")
        .agg(F.sum(F.col("aq") * F.col("q")).alias("dot"))
    )
    return (
        dots.groupBy(
            F.floor(F.col("dot") / float(_Q262_BIN)).cast("long").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("dot").alias("min_dot"),
            F.max("dot").alias("max_dot"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q263: token-bucket rate limiter replay (clamped nonlinear recurrence)
# ---------------------------------------------------------------------------

_Q263_CAP = 5
_Q263_REFILL_US = 43_200_000_000  # 1 token per 12h of gap


_Q263_SQL = f"""
WITH RECURSIVE e AS (
  SELECT user_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id)
           AS rn
  FROM events
),
r(user_id, rn, ts_us, tokens_after, throttled, event_type) AS (
  SELECT user_id, rn, ts_us, {_Q263_CAP} - 1, FALSE, event_type
  FROM e WHERE rn = 1
  UNION ALL
  SELECT n.user_id, n.rn, n.ts_us,
         CASE WHEN LEAST({_Q263_CAP}, r.tokens_after
                    + (n.ts_us - r.ts_us) // {_Q263_REFILL_US}) >= 1
              THEN LEAST({_Q263_CAP}, r.tokens_after
                    + (n.ts_us - r.ts_us) // {_Q263_REFILL_US}) - 1
              ELSE LEAST({_Q263_CAP}, r.tokens_after
                    + (n.ts_us - r.ts_us) // {_Q263_REFILL_US}) END,
         LEAST({_Q263_CAP}, r.tokens_after
               + (n.ts_us - r.ts_us) // {_Q263_REFILL_US}) < 1,
         n.event_type
  FROM r JOIN e n ON n.user_id = r.user_id AND n.rn = r.rn + 1
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN throttled THEN 1 ELSE 0 END) AS BIGINT)
         AS n_throttled,
       ROUND(SUM(CASE WHEN throttled THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
         AS throttle_rate
FROM r GROUP BY event_type ORDER BY event_type
"""


@register(
    "q263_token_bucket",
    _Q263_SQL,
    doc=(
        f"token-bucket rate-limiter replay (capacity {_Q263_CAP}, one "
        "token per 12h of gap — calibrated so ~half the fixture throttles): the CLAMPED nonlinear recurrence "
        "min(C, tokens + gap//refill) that no window/cumsum can "
        "express — the engine runs it per user inside ONE "
        "applyInPandas over (ts_us, event_id)-sorted groups (bounded "
        "by a user's event count), the oracle is a true recursive CTE "
        "walking rn -> rn+1; every quantity is integer micros/tokens, "
        "so engine and oracle are exactly equal; output = per-type "
        "throttle accounting (which event types burst past the "
        "limiter)"
    ),
    tables=("events",),
)
def q263(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        out_type, out_thr = [], []
        tokens = _Q263_CAP
        prev_ts = None
        for ts_us, et in zip(pdf["ts_us"], pdf["event_type"]):
            ts_us = int(ts_us)
            if prev_ts is not None:
                tokens = min(
                    _Q263_CAP, tokens + (ts_us - prev_ts) // _Q263_REFILL_US
                )
            throttled = tokens < 1
            if not throttled:
                tokens -= 1
            out_type.append(et)
            out_thr.append(1 if throttled else 0)
            prev_ts = ts_us
        return pd.DataFrame({"event_type": out_type, "throttled": out_thr})

    per_event = ev.select(
        "user_id", "event_id", "ts_us", "event_type"
    ).groupBy("user_id").applyInPandas(
        replay, "event_type string, throttled int"
    )
    thr = F.sum("throttled")
    return (
        per_event.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            thr.cast("long").alias("n_throttled"),
            F.round(thr * 1.0 / F.count(F.lit(1)), 4).alias("throttle_rate"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q265: Cohen's kappa between two labeling heuristics
# ---------------------------------------------------------------------------

_Q265_CUT_A = 50
_Q265_CUT_B = 40

_Q265_SQL = f"""
WITH lab AS (
  SELECT event_type,
         CASE WHEN value >= {_Q265_CUT_A} THEN 1 ELSE 0 END AS a,
         CASE WHEN value >= {_Q265_CUT_B} THEN 1 ELSE 0 END AS b
  FROM events
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a * b) AS BIGINT) AS n11,
         CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
         CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
         CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
  FROM lab GROUP BY event_type
)
SELECT event_type, n,
       ROUND(CAST(n11 + n00 AS DOUBLE) / n, 4) AS p_observed,
       ROUND((CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
              + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)) / n / n, 4)
         AS p_expected,
       ROUND((CAST(n11 + n00 AS DOUBLE) / n
              - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                 + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)) / n / n)
             / (1 - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                     + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)) / n / n),
             4) AS kappa
FROM s ORDER BY event_type
"""


@register(
    "q265_cohens_kappa",
    _Q265_SQL,
    doc=(
        "Cohen's kappa between two labeling heuristics (value >= 50 "
        "vs the more lenient >= 40 — the annotator-agreement audit "
        "before trusting heuristic labels at scale): the 2x2 "
        "agreement table is ONE conditional rollup of exact integer "
        "counts per type, kappa = (po - pe)/(1 - pe) in closed form "
        "— chance-corrected agreement, where raw overlap (po ~ 0.9 "
        "here) flatters raters that both say 'no' to everything"
    ),
    tables=("events",),
)
def q265(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = F.when(F.col("value") >= _Q265_CUT_A, 1).otherwise(0)
    b = F.when(F.col("value") >= _Q265_CUT_B, 1).otherwise(0)
    s = ev.select("event_type", a.alias("a"), b.alias("b")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("a") * F.col("b")).alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).alias("n00"),
    )
    n = F.col("n")
    po = (F.col("n11") + F.col("n00")).cast("double") / n
    pe = (
        (F.col("n11") + F.col("n10")).cast("double")
        * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")).cast("double")
        * (F.col("n10") + F.col("n00"))
    ) / n / n
    return s.select(
        "event_type",
        "n",
        F.round(po, 4).alias("p_observed"),
        F.round(pe, 4).alias("p_expected"),
        F.round((po - pe) / (1 - pe), 4).alias("kappa"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q266: delta-method CI for a ratio metric, clustered by user
# ---------------------------------------------------------------------------

_Q266_Z = 1.96

_Q266_SQL = f"""
WITH per_user AS (
  SELECT event_type, user_id,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, user_id
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM per_user GROUP BY event_type
),
d AS (
  SELECT event_type, n, sx, sy,
         CAST(sx AS DOUBLE) / sy AS r,
         (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)
           AS vx,
         (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1)
           AS vy,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / (n - 1)
           AS cxy,
         CAST(sy AS DOUBLE) / n AS ybar
  FROM s
)
SELECT event_type, n AS n_users,
       ROUND(r / 100, 6) AS ratio,
       ROUND(SQRT((vx - 2 * r * cxy + r * r * vy) / n / (ybar * ybar))
             / 100, 6) AS se,
       ROUND((r - {_Q266_Z} * SQRT((vx - 2 * r * cxy + r * r * vy)
             / n / (ybar * ybar))) / 100, 6) AS lo,
       ROUND((r + {_Q266_Z} * SQRT((vx - 2 * r * cxy + r * r * vy)
             / n / (ybar * ybar))) / 100, 6) AS hi
FROM d ORDER BY event_type
"""


@register(
    "q266_ratio_metric_delta",
    _Q266_SQL,
    doc=(
        "delta-method confidence interval for a RATIO metric "
        "(mean value per event) CLUSTERED BY USER — the A/B-infra "
        "subtlety event-level variance gets wrong: events of one "
        "user are correlated, so the i.i.d. unit is the user and "
        "var(R) ~ (vx - 2R·cov + R²·vy)/(n·ȳ²) over PER-USER sums "
        "(Deng et al., KDD 2018 ratio-metric practice); every input "
        "to the closed form is an exact integer power sum over the "
        "(type,user) rollup"
    ),
    tables=("events",),
)
def q266(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("x"),
        F.count(F.lit(1)).alias("y"),
    )
    s = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    r = F.col("sx").cast("double") / F.col("sy")
    vx = (F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / n) / (n - 1)
    vy = (F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / n) / (n - 1)
    cxy = (F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / n) / (n - 1)
    ybar = F.col("sy").cast("double") / n
    se = F.sqrt((vx - 2 * r * cxy + r * r * vy) / n / (ybar * ybar))
    return s.select(
        "event_type",
        F.col("n").alias("n_users"),
        F.round(r / 100, 6).alias("ratio"),
        F.round(se / 100, 6).alias("se"),
        F.round((r - _Q266_Z * se) / 100, 6).alias("lo"),
        F.round((r + _Q266_Z * se) / 100, 6).alias("hi"),
    ).orderBy("event_type")


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
# q270: churn label construction + cohort base rates
# ---------------------------------------------------------------------------

_Q270_QUIET_DAYS = 7

_Q270_SQL = f"""
WITH e AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d
  FROM events
),
horizon AS (SELECT CAST(MAX(d) AS BIGINT) AS max_d FROM e),
per_user AS (
  SELECT user_id,
         CAST(MIN(d) AS BIGINT) AS first_d,
         CAST(MAX(d) AS BIGINT) AS last_d,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM e GROUP BY user_id
)
SELECT first_d // 7 AS cohort_week,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN last_d < h.max_d - {_Q270_QUIET_DAYS}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       ROUND(SUM(CASE WHEN last_d < h.max_d - {_Q270_QUIET_DAYS}
                 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS churn_rate,
       ROUND(AVG(CAST(n_events AS DOUBLE)), 4) AS avg_events
FROM per_user CROSS JOIN horizon h
GROUP BY cohort_week ORDER BY cohort_week
"""


@register(
    "q270_churn_labels",
    _Q270_SQL,
    doc=(
        "churn LABEL CONSTRUCTION (the step before any churn model: "
        f"churned = no activity in the last {_Q270_QUIET_DAYS} days "
        "of the observation window, horizon anchored to the DATA's "
        "max day so the label is replay-stable, never wall-clock): "
        "per-user first/last/count rollup, broadcast scalar horizon, "
        "base rates by acquisition cohort — exact integer day "
        "arithmetic throughout"
    ),
    tables=("events",),
)
def q270(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).cast("long").alias("d"),
    )
    horizon = e.agg(F.max("d").alias("max_d"))
    per_user = e.groupBy("user_id").agg(
        F.min("d").alias("first_d"),
        F.max("d").alias("last_d"),
        F.count(F.lit(1)).alias("n_events"),
    )
    churned = F.when(
        F.col("last_d") < F.col("max_d") - _Q270_QUIET_DAYS, 1
    ).otherwise(0)
    return (
        per_user.crossJoin(F.broadcast(horizon))
        .groupBy(F.expr("first_d div 7").alias("cohort_week"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(churned).alias("n_churned"),
            F.round(F.sum(churned) * 1.0 / F.count(F.lit(1)), 4).alias(
                "churn_rate"
            ),
            F.round(F.avg(F.col("n_events").cast("double")), 4).alias(
                "avg_events"
            ),
        )
        .orderBy("cohort_week")
    )


# ---------------------------------------------------------------------------
# q271: rendezvous (HRW) sharding + resize movement analysis
# ---------------------------------------------------------------------------

_Q271_SHARDS = 8
_Q271_SALT = 9973

_Q271_SQL = f"""
WITH shards(s) AS (
  SELECT * FROM (VALUES {", ".join(f"({s})" for s in range(9))}) v(s)
),
scored AS (
  SELECT doc_id, s, ((h * h) % 1000000007) * 100 + s AS score
  FROM (
    SELECT d.doc_id, sh.s,
           {sql_hash_bucket(f"doc_id + s * {_Q271_SALT}", 1000000007)} AS h
    FROM documents d CROSS JOIN shards sh
  )
),
a8 AS (
  SELECT doc_id, arg_max(s, score) AS shard
  FROM scored WHERE s < {_Q271_SHARDS} GROUP BY doc_id
),
a9 AS (
  SELECT doc_id, arg_max(s, score) AS shard
  FROM scored GROUP BY doc_id
),
j AS (
  SELECT a8.doc_id, a8.shard AS s8, a9.shard AS s9
  FROM a8 JOIN a9 ON a9.doc_id = a8.doc_id
),
bal AS (
  SELECT CAST(MAX(c) AS BIGINT) AS max_shard,
         CAST(MIN(c) AS BIGINT) AS min_shard
  FROM (SELECT COUNT(*) AS c FROM a9 GROUP BY shard)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) AS BIGINT) AS moved,
       ROUND(SUM(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
         AS moved_frac,
       ANY_VALUE(bal.max_shard) AS max_shard,
       ANY_VALUE(bal.min_shard) AS min_shard
FROM j CROSS JOIN bal
"""


@register(
    "q271_rendezvous_sharding",
    _Q271_SQL,
    doc=(
        "rendezvous / highest-random-weight sharding (Thaler & Ravi "
        "1996 — the consistent-assignment scheme behind cache/shard "
        "rings) + the resize-cost analysis: each key's shard is "
        f"argmax over per-(key,shard) salted SQUARED hashes (one "
        "multiplicative step is linear in key and shard — squaring "
        "mod p is the cheapest engine-exact nonlinearity); growing "
        f"{_Q271_SHARDS}→{_Q271_SHARDS + 1} shards must move only "
        f"~1/{_Q271_SHARDS + 1} of keys (HRW's defining guarantee — "
        "modulo sharding would move ~8/9), measured exactly here; "
        "the argmax is ONE keyed max_by with the (score,shard) "
        "composite encoded as score*100+s (exact integers), the "
        "shard frame is broadcast — Θ(n·k) work, no shuffle besides "
        "the per-key rollup"
    ),
    tables=("documents",),
)
def q271(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    shards = spark.createDataFrame([(s,) for s in range(9)], "s LONG")
    h = hash_bucket(F.col("doc_id") + F.col("s") * _Q271_SALT, 1_000_000_007)
    # square mod p: ONE multiplicative step is LINEAR in (key, shard)
    # and assigns with visible structure (measured: 0.18 moved, 31-123
    # shard sizes); the squaring is the cheapest SQL-expressible
    # nonlinearity and lands the HRW guarantee exactly (0.110 moved)
    scored = docs.crossJoin(F.broadcast(shards)).select(
        "doc_id",
        "s",
        (((h * h) % 1_000_000_007) * 100 + F.col("s")).alias("score"),
    )
    a8 = (
        scored.where(F.col("s") < _Q271_SHARDS)
        .groupBy("doc_id")
        .agg(F.max_by("s", "score").alias("s8"))
    )
    a9 = scored.groupBy("doc_id").agg(F.max_by("s", "score").alias("s9"))
    bal = (
        a9.groupBy("s9")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.max("c").alias("max_shard"),
            F.min("c").alias("min_shard"),
        )
    )
    moved = F.sum(F.when(F.col("s8") != F.col("s9"), 1).otherwise(0))
    return (
        a8.join(a9, "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            moved.cast("long").alias("moved"),
            F.round(moved * 1.0 / F.count(F.lit(1)), 4).alias("moved_frac"),
        )
        .crossJoin(F.broadcast(bal))
        .select("n_keys", "moved", "moved_frac", "max_shard", "min_shard")
    )


# ---------------------------------------------------------------------------
# q275: A/B power analysis — minimum detectable effect per arm size
# ---------------------------------------------------------------------------

_Q275_Z_ALPHA = 1.96   # two-sided alpha = 0.05
_Q275_Z_POWER = 0.8416  # 80% power

_Q275_SQL = f"""
WITH s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM events GROUP BY event_type
)
SELECT event_type, n, k,
       ROUND(CAST(k AS DOUBLE) / n, 6) AS p_base,
       ROUND(({_Q275_Z_ALPHA} + {_Q275_Z_POWER})
             * SQRT(2 * (CAST(k AS DOUBLE) / n)
                    * (1 - CAST(k AS DOUBLE) / n) / (n / 2.0)), 6)
         AS mde_abs,
       ROUND(({_Q275_Z_ALPHA} + {_Q275_Z_POWER})
             * SQRT(2 * (CAST(k AS DOUBLE) / n)
                    * (1 - CAST(k AS DOUBLE) / n) / (n / 2.0))
             / (CAST(k AS DOUBLE) / n), 6) AS mde_rel
FROM s ORDER BY event_type
"""


@register(
    "q275_ab_power_mde",
    _Q275_SQL,
    doc=(
        "A/B experiment design: minimum detectable effect for the "
        "per-type high-value proportion if today's traffic were split "
        "50/50 — MDE = (z_a/2 + z_power)·sqrt(2p(1-p)/(n/2)), the "
        "two-proportion power closed form at alpha=.05/power=.80 "
        "(z quantiles are LITERALS, no CDF at runtime): the "
        "'is this experiment even worth running' gate computed from "
        "one integer rollup per type — complements q173's post-hoc "
        "z-test and q247's interval with the PRE-hoc design number"
    ),
    tables=("events",),
)
def q275(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") >= 100, 1).otherwise(0)).alias("k"),
    )
    p = F.col("k").cast("double") / F.col("n")
    mde = (_Q275_Z_ALPHA + _Q275_Z_POWER) * F.sqrt(
        2 * p * (1 - p) / (F.col("n") / 2.0)
    )
    return s.select(
        "event_type",
        "n",
        "k",
        F.round(p, 6).alias("p_base"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / p, 6).alias("mde_rel"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q276: capture-recapture (Lincoln-Petersen) population estimate
# ---------------------------------------------------------------------------

_Q276_W1 = (0, 7)    # capture window 1: days [0, 7)
_Q276_W2 = (14, 21)  # capture window 2: days [14, 21)

_Q276_SQL = f"""
WITH e AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d
  FROM events
),
c1 AS (SELECT DISTINCT user_id FROM e
       WHERE d >= {_Q276_W1[0]} AND d < {_Q276_W1[1]}),
c2 AS (SELECT DISTINCT user_id FROM e
       WHERE d >= {_Q276_W2[0]} AND d < {_Q276_W2[1]}),
s AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c1) AS n1,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM c2) AS n2,
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM c1 WHERE user_id IN (SELECT user_id FROM c2)) AS m,
         (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM e) AS truth
)
SELECT n1, n2, m, truth,
       ROUND(CAST(n1 AS DOUBLE) * n2 / m, 2) AS lincoln_petersen,
       ROUND(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1, 2)
         AS chapman,
       ROUND(ABS(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1 - truth)
             / truth, 4) AS chapman_rel_err
FROM s
"""


@register(
    "q276_capture_recapture",
    _Q276_SQL,
    doc=(
        "capture-recapture population estimation (Lincoln-Petersen + "
        "the bias-corrected Chapman estimator): two disjoint week "
        "windows are the 'captures', overlap m gives N^ = n1*n2/m — "
        "the estimate-the-universe-from-samples trick (how many "
        "distinct users/documents EXIST when you can only afford to "
        "scan samples); two semi-join cardinalities + one distinct "
        "count, and because the fixture's full truth is computable "
        "the output includes the estimator's actual relative error"
    ),
    tables=("events",),
)
def q276(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).cast("long").alias("d"),
    )
    c1 = e.where(
        (F.col("d") >= _Q276_W1[0]) & (F.col("d") < _Q276_W1[1])
    ).select("user_id").distinct()
    c2 = e.where(
        (F.col("d") >= _Q276_W2[0]) & (F.col("d") < _Q276_W2[1])
    ).select("user_id").distinct()
    n1 = c1.agg(F.count(F.lit(1)).alias("n1"))
    n2 = c2.agg(F.count(F.lit(1)).alias("n2"))
    m = c1.join(c2, "user_id", "semi").agg(F.count(F.lit(1)).alias("m"))
    truth = e.agg(F.count_distinct("user_id").alias("truth"))
    lp = F.col("n1").cast("double") * F.col("n2") / F.col("m")
    chapman = (
        (F.col("n1") + 1).cast("double") * (F.col("n2") + 1) / (F.col("m") + 1)
        - 1
    )
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(truth))
        .select(
            "n1",
            "n2",
            "m",
            "truth",
            F.round(lp, 2).alias("lincoln_petersen"),
            F.round(chapman, 2).alias("chapman"),
            F.round(
                F.abs(chapman - F.col("truth")) / F.col("truth"), 4
            ).alias("chapman_rel_err"),
        )
    )


# ---------------------------------------------------------------------------
# q277: partial correlation (volume~revenue controlling for time)
# ---------------------------------------------------------------------------

_Q277_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS z,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(z) AS BIGINT) AS sz,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * z) AS BIGINT) AS sxz,
         CAST(SUM(y * z) AS BIGINT) AS syz,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(z * z) AS BIGINT) AS szz
  FROM daily GROUP BY event_type
),
r AS (
  SELECT event_type, n,
         (n * sxy - CAST(sx AS DOUBLE) * sy)
           / SQRT((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                  * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy))
           AS rxy,
         (n * sxz - CAST(sx AS DOUBLE) * sz)
           / SQRT((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                  * (n * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz))
           AS rxz,
         (n * syz - CAST(sy AS DOUBLE) * sz)
           / SQRT((n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)
                  * (n * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz))
           AS ryz
  FROM s
)
SELECT event_type, n AS n_days,
       ROUND(rxy, 6) AS r_xy,
       ROUND((rxy - rxz * ryz)
             / SQRT((1 - rxz * rxz) * (1 - ryz * ryz)), 6) AS r_xy_given_t
FROM r ORDER BY event_type
"""


@register(
    "q277_partial_correlation",
    _Q277_SQL,
    doc=(
        "partial correlation of daily volume vs daily revenue "
        "CONTROLLING FOR the time index — r_xy.z = "
        "(r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)), the 'is the "
        "association real or just a shared trend' test that completes "
        "the correlation family (Pearson q240, Spearman q232, Kendall "
        "q237): all three pairwise r's from ONE integer power-sum "
        "rollup of the (type, day) frame, one closed form after"
    ),
    tables=("events",),
)
def q277(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).cast("long").alias("z"),
    ).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"),
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("y") * F.col("z")).alias("syz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    n = F.col("n")

    def corr(sab, sa, sb, saa, sbb):
        return (n * F.col(sab) - F.col(sa).cast("double") * F.col(sb)) / F.sqrt(
            (n * F.col(saa).cast("double") - F.col(sa).cast("double") * F.col(sa))
            * (n * F.col(sbb).cast("double") - F.col(sb).cast("double") * F.col(sb))
        )

    rxy = corr("sxy", "sx", "sy", "sxx", "syy")
    rxz = corr("sxz", "sx", "sz", "sxx", "szz")
    ryz = corr("syz", "sy", "sz", "syy", "szz")
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(rxy, 6).alias("r_xy"),
        F.round(
            (rxy - rxz * ryz) / F.sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 6
        ).alias("r_xy_given_t"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q278: behavioral-profile cosine similarity matrix
# ---------------------------------------------------------------------------

_Q278_SQL = """
WITH prof AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         CAST(SUM(a.c * b.c) AS BIGINT) AS dot
  FROM prof a JOIN prof b ON a.h = b.h AND a.event_type < b.event_type
  GROUP BY 1, 2
),
norms AS (
  SELECT event_type, CAST(SUM(c * c) AS BIGINT) AS nn FROM prof GROUP BY 1
)
SELECT p.ta, p.tb,
       ROUND(CAST(p.dot AS DOUBLE)
             / SQRT(CAST(na.nn AS DOUBLE) * nb.nn), 6) AS cosine
FROM pairs p
JOIN norms na ON na.event_type = p.ta
JOIN norms nb ON nb.event_type = p.tb
ORDER BY p.ta, p.tb
"""


@register(
    "q278_profile_cosine",
    _Q278_SQL,
    doc=(
        "behavioral-profile similarity: each type's 24-hour activity "
        "histogram as a vector, pairwise cosine over the |types|² "
        "matrix — 'which event types share a daily rhythm' (the "
        "entity-profile twin of q36's document cosine): dots and "
        "norms are exact integer sums over the (type, hour) rollup, "
        "the join key is the HOUR so the shuffle carries 24·|types| "
        "rows, never events"
    ),
    tables=("events",),
)
def q278(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    prof = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    a = prof.alias("a")
    b = prof.alias("b")
    pairs = (
        a.join(b, F.col("a.h") == F.col("b.h"))
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
        )
        .agg(F.sum(F.col("a.c") * F.col("b.c")).alias("dot"))
    )
    norms = prof.groupBy("event_type").agg(
        F.sum(F.col("c") * F.col("c")).alias("nn")
    )
    return (
        pairs.join(
            F.broadcast(norms.select(F.col("event_type").alias("ta"),
                                     F.col("nn").alias("na"))), "ta"
        )
        .join(
            F.broadcast(norms.select(F.col("event_type").alias("tb"),
                                     F.col("nn").alias("nb"))), "tb"
        )
        .select(
            "ta",
            "tb",
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb")),
                6,
            ).alias("cosine"),
        )
        .orderBy("ta", "tb")
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
# q281: session-basket lift (which event types co-occur in a session)
# ---------------------------------------------------------------------------

_Q281_GAP_US = 1_800_000_000  # 30 min, the q229 session gap

_Q281_SQL = f"""
WITH o AS (
  SELECT user_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         LAG(CAST(epoch_us(ts) AS BIGINT)) OVER (
           PARTITION BY user_id
           ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) AS prev
  FROM events
),
marks AS (
  SELECT user_id, event_type, ts_us,
         CASE WHEN prev IS NULL OR ts_us - prev > {_Q281_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM o
),
sess AS (
  SELECT user_id, event_type,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM marks
),
baskets AS (SELECT DISTINCT user_id, sid, event_type FROM sess),
n_s AS (
  SELECT CAST(COUNT(DISTINCT user_id || '#' || sid) AS BIGINT) AS n
  FROM baskets
),
item AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS supp
  FROM baskets GROUP BY event_type
),
pair AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         CAST(COUNT(*) AS BIGINT) AS supp_ab
  FROM baskets a
  JOIN baskets b ON b.user_id = a.user_id AND b.sid = a.sid
                AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.ta, p.tb, p.supp_ab,
       ROUND(CAST(p.supp_ab AS DOUBLE) * n_s.n / (ia.supp * ib.supp), 4)
         AS lift
FROM pair p
JOIN item ia ON ia.event_type = p.ta
JOIN item ib ON ib.event_type = p.tb
CROSS JOIN n_s
ORDER BY p.ta, p.tb
"""


@register(
    "q281_session_lift",
    _Q281_SQL,
    doc=(
        "session-basket lift: 30-min-gap sessions (the q229 "
        "spelling) become the BASKETS, and event-type pairs get "
        "lift = N·supp(ab)/(supp(a)·supp(b)) — the product-analytics "
        "'which actions travel together within a visit' (q171's "
        "order-basket pairs re-based on behavioral sessions); "
        "per-user windows for sessionization, then every count is a "
        "(session, type)-distinct integer rollup; lift>1 = "
        "attraction, <1 = repulsion"
    ),
    tables=("events",),
)
def q281(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        "ts_us",
        "event_id",
        F.lag("ts_us").over(w).alias("prev"),
    )
    marks = o.withColumn(
        "new_s",
        F.when(
            F.col("prev").isNull()
            | (F.col("ts_us") - F.col("prev") > _Q281_GAP_US),
            1,
        ).otherwise(0),
    )
    w_cum = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = marks.withColumn("sid", F.sum("new_s").over(w_cum))
    # baskets feed FOUR consumers (n_s, item, both pair sides): cut
    # lineage once so the sessionization windows run a single time
    # instead of five
    from osm_changesets_to_parquet_spark.operators.iterutils import (
        truncate_lineage,
    )

    baskets = truncate_lineage(
        sess.select("user_id", "sid", "event_type").distinct()
    )
    n_s = baskets.select("user_id", "sid").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    item = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("supp"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.sid") == F.col("b.sid")),
        )
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
        )
        .agg(F.count(F.lit(1)).alias("supp_ab"))
    )
    return (
        pair.join(
            F.broadcast(item.select(F.col("event_type").alias("ta"),
                                    F.col("supp").alias("sa"))), "ta"
        )
        .join(
            F.broadcast(item.select(F.col("event_type").alias("tb"),
                                    F.col("supp").alias("sb"))), "tb"
        )
        .crossJoin(F.broadcast(n_s))
        .select(
            "ta",
            "tb",
            "supp_ab",
            F.round(
                F.col("supp_ab").cast("double") * F.col("n")
                / (F.col("sa") * F.col("sb")),
                4,
            ).alias("lift"),
        )
        .orderBy("ta", "tb")
    )


# ---------------------------------------------------------------------------
# q282: quantile treatment effects (per-decile arm differences)
# ---------------------------------------------------------------------------

_Q282_SQL = """
WITH e AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
         {treat} AS arm,
         event_id
  FROM events
),
binned AS (
  SELECT arm, v,
         NTILE(10) OVER (PARTITION BY arm ORDER BY v, event_id) AS dec
  FROM e
),
q AS (
  SELECT arm, dec, CAST(MAX(v) AS BIGINT) AS q_v
  FROM binned GROUP BY arm, dec
)
SELECT t.dec AS decile,
       ROUND(CAST(t.q_v AS DOUBLE) / 100, 2) AS treated_q,
       ROUND(CAST(c.q_v AS DOUBLE) / 100, 2) AS control_q,
       ROUND(CAST(t.q_v - c.q_v AS DOUBLE) / 100, 2) AS qte
FROM q t JOIN q c ON c.dec = t.dec AND c.arm = 0
WHERE t.arm = 1
ORDER BY decile
"""

_Q282_SQL = _Q282_SQL.format(treat=sql_hash_bucket("user_id", 2))


@register(
    "q282_quantile_treatment_effect",
    _Q282_SQL,
    doc=(
        "quantile treatment effects — the heterogeneity view a mean "
        "difference (q248/q173) hides: per-arm decile boundaries of "
        "value (NTILE made TOTAL by the (v, event_id) tie-break, the "
        "q269 discipline) differenced decile-by-decile; an effect "
        "concentrated in the tail shows up ONLY here; arms are the "
        "deterministic user-id hash, boundaries are exact integer "
        "cents — on the null fixture every QTE ~ 0, the honest "
        "answer"
    ),
    tables=("events",),
)
def q282(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("v"),
        hash_bucket("user_id", 2).alias("arm"),
        "event_id",
    )
    # per-arm NTILE: the one corpus-sized window pair (one per arm);
    # respell via packing.global_rank + integer bin arithmetic at
    # 100 TB (q137/q269's documented path)
    w = Window.partitionBy("arm").orderBy("v", "event_id")
    binned = e.select("arm", "v", F.ntile(10).over(w).alias("dec"))
    q = binned.groupBy("arm", "dec").agg(F.max("v").alias("q_v"))
    t = q.where(F.col("arm") == 1).select(
        F.col("dec").alias("decile"), F.col("q_v").alias("tq")
    )
    c = q.where(F.col("arm") == 0).select(
        F.col("dec").alias("decile"), F.col("q_v").alias("cq")
    )
    return (
        t.join(c, "decile")
        .select(
            "decile",
            F.round(F.col("tq").cast("double") / 100, 2).alias("treated_q"),
            F.round(F.col("cq").cast("double") / 100, 2).alias("control_q"),
            F.round(
                (F.col("tq") - F.col("cq")).cast("double") / 100, 2
            ).alias("qte"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# q283: CUPED variance reduction (pre-period covariate adjustment)
# ---------------------------------------------------------------------------

_Q283_SQL = f"""
WITH e AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events
),
h AS (SELECT CAST(MAX(d) AS BIGINT) AS max_d FROM e),
per_user AS (
  SELECT user_id,
         {sql_hash_bucket("user_id", 2)} AS arm,
         CAST(SUM(CASE WHEN d <= h.max_d - 15 THEN v ELSE 0 END) AS BIGINT)
           AS x_pre,
         CAST(SUM(CASE WHEN d > h.max_d - 15 THEN v ELSE 0 END) AS BIGINT)
           AS y_post
  FROM e CROSS JOIN h GROUP BY user_id
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x_pre) AS BIGINT) AS sx,
         CAST(SUM(y_post) AS BIGINT) AS sy,
         CAST(SUM(x_pre * y_post) AS BIGINT) AS sxy,
         CAST(SUM(x_pre * x_pre) AS BIGINT) AS sxx,
         CAST(SUM(y_post * y_post) AS BIGINT) AS syy
  FROM per_user
),
theta AS (
  SELECT n, CAST(sx AS DOUBLE) / n AS xbar,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
           / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS th,
         (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1)
           AS var_y,
         POWER(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n, 2)
           / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
              * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n))
           AS rho2
  FROM s
),
adj AS (
  SELECT p.arm,
         CAST(COUNT(*) AS BIGINT) AS n_arm,
         AVG(CAST(p.y_post AS DOUBLE)) AS raw_mean,
         AVG(p.y_post - t.th * (p.x_pre - t.xbar)) AS cuped_mean
  FROM per_user p CROSS JOIN theta t
  GROUP BY p.arm
)
SELECT a1.n_arm AS n_treated, a0.n_arm AS n_control,
       ROUND((a1.raw_mean - a0.raw_mean) / 100, 4) AS raw_diff,
       ROUND((a1.cuped_mean - a0.cuped_mean) / 100, 4) AS cuped_diff,
       ROUND((SELECT rho2 FROM theta), 4) AS variance_reduction
FROM adj a1 JOIN adj a0 ON a1.arm = 1 AND a0.arm = 0
"""


@register(
    "q283_cuped",
    _Q283_SQL,
    doc=(
        "CUPED variance reduction (Deng et al., WSDM 2013 — the "
        "standard A/B sensitivity boost): per-user PRE-period value "
        "(days <= max-15) adjusts the POST-period metric via "
        "theta = cov(y,x)/var(x), and the variance-reduction factor "
        "is rho² (reported — ~0.005 here because the fixture's users "
        "share ONE activity rate, so pre/post sums are independent "
        "Poisson noise: the honest null; heterogeneous real users "
        "give 0.3-0.7); "
        "everything from one per-user integer rollup + one "
        "power-sum frame; the per-row adjustment is a broadcast "
        "scalar join — CUPED at 100 TB is two cheap passes"
    ),
    tables=("events",),
)
def q283(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).cast("long").alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    h = e.agg(F.max("d").alias("max_d"))
    per_user = (
        e.crossJoin(F.broadcast(h))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("d") <= F.col("max_d") - 15, F.col("v")).otherwise(0)
            ).alias("x_pre"),
            F.sum(
                F.when(F.col("d") > F.col("max_d") - 15, F.col("v")).otherwise(0)
            ).alias("y_post"),
        )
        .withColumn("arm", hash_bucket("user_id", 2))
    )
    s = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_pre").alias("sx"),
        F.sum("y_post").alias("sy"),
        F.sum(F.col("x_pre") * F.col("y_post")).alias("sxy"),
        F.sum(F.col("x_pre") * F.col("x_pre")).alias("sxx"),
        F.sum(F.col("y_post") * F.col("y_post")).alias("syy"),
    )
    n = F.col("n")
    cov = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / n
    varx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / n
    vary = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / n
    theta = s.select(
        (F.col("sx").cast("double") / n).alias("xbar"),
        (cov / varx).alias("th"),
        (F.pow(cov, 2) / (varx * vary)).alias("rho2"),
    )
    adj = (
        per_user.crossJoin(F.broadcast(theta))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_arm"),
            F.avg(F.col("y_post").cast("double")).alias("raw_mean"),
            F.avg(
                F.col("y_post") - F.col("th") * (F.col("x_pre") - F.col("xbar"))
            ).alias("cuped_mean"),
        )
    )
    a1 = adj.where(F.col("arm") == 1).select(
        F.col("n_arm").alias("n_treated"),
        F.col("raw_mean").alias("rm1"),
        F.col("cuped_mean").alias("cm1"),
    )
    a0 = adj.where(F.col("arm") == 0).select(
        F.col("n_arm").alias("n_control"),
        F.col("raw_mean").alias("rm0"),
        F.col("cuped_mean").alias("cm0"),
    )
    rho2 = theta.select(F.round("rho2", 4).alias("variance_reduction"))
    return (
        a1.crossJoin(a0)
        .crossJoin(F.broadcast(rho2))
        .select(
            "n_treated",
            "n_control",
            F.round((F.col("rm1") - F.col("rm0")) / 100, 4).alias("raw_diff"),
            F.round((F.col("cm1") - F.col("cm0")) / 100, 4).alias("cuped_diff"),
            "variance_reduction",
        )
    )


# ---------------------------------------------------------------------------
# q284: sample-ratio-mismatch check (experiment health gate)
# ---------------------------------------------------------------------------

_Q284_CHI2_CRIT = 3.841  # chi2(1 dof) 95% critical value, a literal

_Q284_SQL = f"""
WITH u AS (
  SELECT DISTINCT user_id, {sql_hash_bucket("user_id", 2)} AS arm
  FROM events
),
s AS (
  SELECT CAST(SUM(arm) AS BIGINT) AS n1,
         CAST(SUM(1 - arm) AS BIGINT) AS n0
  FROM u
)
SELECT n1 AS n_treated, n0 AS n_control,
       ROUND(POWER(n1 - (n1 + n0) / 2.0, 2) / ((n1 + n0) / 2.0)
             + POWER(n0 - (n1 + n0) / 2.0, 2) / ((n1 + n0) / 2.0), 4)
         AS chi2,
       (POWER(n1 - (n1 + n0) / 2.0, 2) / ((n1 + n0) / 2.0)
        + POWER(n0 - (n1 + n0) / 2.0, 2) / ((n1 + n0) / 2.0))
         > {_Q284_CHI2_CRIT} AS srm_detected
FROM s
"""


@register(
    "q284_srm_check",
    _Q284_SQL,
    doc=(
        "sample-ratio mismatch — the FIRST health check of any "
        "experiment readout (a biased assignment invalidates every "
        "downstream metric): chi² of the observed arm counts vs the "
        "declared 50/50, flagged against the 3.841 critical value "
        "(a LITERAL, no CDF); one distinct-user rollup — and the "
        "check doubles as an audit of the engine's own hash_bucket "
        "assignment (the fixture splits 75/75, chi²=0)"
    ),
    tables=("events",),
)
def q284(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct().select(
        hash_bucket("user_id", 2).alias("arm")
    )
    s = u.agg(
        F.sum("arm").alias("n1"),
        F.sum(1 - F.col("arm")).alias("n0"),
    )
    e = (F.col("n1") + F.col("n0")) / 2.0
    chi2 = F.pow(F.col("n1") - e, 2) / e + F.pow(F.col("n0") - e, 2) / e
    return s.select(
        F.col("n1").cast("long").alias("n_treated"),
        F.col("n0").cast("long").alias("n_control"),
        F.round(chi2, 4).alias("chi2"),
        (chi2 > _Q284_CHI2_CRIT).alias("srm_detected"),
    )


# ---------------------------------------------------------------------------
# q286: Page-Hinkley change detector over daily volumes
# ---------------------------------------------------------------------------

_Q286_DELTA = 0.0   # magnitude tolerance
_Q286_LAMBDA = 30.0  # alert threshold (max_ph spans 27-46 at sf0.01 - mixed outcome)

_Q286_SQL = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, d, x,
         SUM(x) OVER seq AS s,
         ROW_NUMBER() OVER seq AS i
  FROM daily
  WINDOW seq AS (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
m AS (
  SELECT event_type, d,
         SUM(x - CAST(s AS DOUBLE) / i - {_Q286_DELTA}) OVER seq AS mt
  FROM w
  WINDOW seq AS (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
a AS (
  SELECT event_type, d, mt,
         mt - MIN(mt) OVER seq AS ph
  FROM m
  WINDOW seq AS (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(CASE WHEN ph > {_Q286_LAMBDA} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alert_days,
       CAST(MIN(CASE WHEN ph > {_Q286_LAMBDA} THEN d END) AS BIGINT)
         AS first_alert_day,
       ROUND(MAX(ph), 4) AS max_ph
FROM a GROUP BY event_type ORDER BY event_type
"""


@register(
    "q286_page_hinkley",
    _Q286_SQL,
    doc=(
        "Page-Hinkley change detection over per-type daily volume — "
        "the SEQUENTIAL drift alarm (complements the batch "
        "two-sample drifts KS q223 / PSI q120 / EMD q192): "
        "PH_t = m_t - min_{i<=t} m_i with m_t = Σ(x_i - mean_i), "
        "which looks sequential but is THREE ordered cumulative "
        "windows over the 30-row daily rollup — both engines "
        "accumulate ordered frames in the same order, so the doubles "
        "agree bit-for-bit; alert when PH exceeds the lambda "
        "literal; on the upward-trendless fixture alerts reflect "
        "genuine volume drift if any, else zero — both read directly"
    ),
    tables=("events",),
)
def q286(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).cast("long").alias("d"),
    ).agg(F.count(F.lit(1)).alias("x"))
    seq = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w = daily.select(
        "event_type",
        "d",
        "x",
        F.sum("x").over(seq).alias("s"),
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("d")
        ).alias("i"),
    )
    m = w.select(
        "event_type",
        "d",
        F.sum(
            F.col("x") - F.col("s").cast("double") / F.col("i") - _Q286_DELTA
        ).over(seq).alias("mt"),
    )
    a = m.select(
        "event_type",
        "d",
        (F.col("mt") - F.min("mt").over(seq)).alias("ph"),
    )
    alert = F.when(F.col("ph") > _Q286_LAMBDA, 1).otherwise(0)
    return (
        a.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(alert).cast("long").alias("n_alert_days"),
            F.min(
                F.when(F.col("ph") > _Q286_LAMBDA, F.col("d"))
            ).cast("long").alias("first_alert_day"),
            F.round(F.max("ph"), 4).alias("max_ph"),
        )
        .orderBy("event_type")
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
# q288: LSH parameter planner (candidate-probability S-curves)
# ---------------------------------------------------------------------------

_Q288_SQL = """
WITH grid AS (
  SELECT CAST(j AS BIGINT) AS jpct, j / 100.0 AS jac
  FROM UNNEST(range(5, 100, 5)) AS u(j)
),
p AS (
  SELECT jpct, jac,
         jac * jac * jac * jac AS band4,
         jac * jac AS band2
  FROM grid
),
q AS (
  SELECT jpct, jac,
         (1 - band4) * (1 - band4) AS m4_2,
         (1 - band2) * (1 - band2) AS m2_2
  FROM p
),
r AS (
  SELECT jpct, jac,
         m4_2 * m4_2 AS m4_4, m2_2 * m2_2 AS m2_4 FROM q
),
s AS (
  SELECT jpct, jac,
         m4_4 * m4_4 AS miss_8x4,
         m2_4 * m2_4 * m2_4 * m2_4 AS miss_16x2
  FROM r
)
SELECT jpct AS jaccard_pct,
       ROUND(1 - miss_8x4, 6) AS p_candidate_8x4,
       ROUND(1 - miss_16x2, 6) AS p_candidate_16x2
FROM s ORDER BY jaccard_pct
"""


@register(
    "q288_lsh_planner",
    _Q288_SQL,
    doc=(
        "LSH parameter planner — the design tool BEHIND q35b's "
        "8-bands×4-rows choice: candidate probability "
        "1-(1-J^r)^b across the Jaccard grid for two configurations "
        "(8×4 vs 16×2), showing where each S-curve puts its "
        "threshold; every power is spelled as EXPLICIT repeated "
        "multiplication/squaring (J⁴ = ((J²))², (1-x)⁸ = (((x²)²)²) "
        "— zero pow()/libm calls, bit-identical in any engine); the "
        "grid is generated, no table scanned — a pure planning query"
    ),
    tables=(),
)
def q288(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = spark.createDataFrame(
        [(j,) for j in range(5, 100, 5)], "jpct LONG"
    ).select("jpct", (F.col("jpct") / 100.0).alias("jac"))
    j = F.col("jac")
    band4 = j * j * j * j
    band2 = j * j
    m4_2 = (1 - band4) * (1 - band4)
    m2_2 = (1 - band2) * (1 - band2)
    m4_4 = m4_2 * m4_2
    m2_4 = m2_2 * m2_2
    miss_8x4 = m4_4 * m4_4
    miss_16x2 = m2_4 * m2_4 * m2_4 * m2_4
    return grid.select(
        F.col("jpct").alias("jaccard_pct"),
        F.round(1 - miss_8x4, 6).alias("p_candidate_8x4"),
        F.round(1 - miss_16x2, 6).alias("p_candidate_16x2"),
    ).orderBy("jaccard_pct")


# ---------------------------------------------------------------------------
# q289: Kruskal-Wallis k-sample rank test (q213's k-group extension)
# ---------------------------------------------------------------------------

_Q289_SQL = """
WITH e AS (
  SELECT event_type AS g, CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events
),
vc AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM e GROUP BY v
),
tr AS (
  SELECT v, cnt,
         2 * COALESCE(SUM(cnt) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cnt + 1 AS t2
  FROM vc
),
gv AS (
  SELECT g, v, CAST(COUNT(*) AS BIGINT) AS cg FROM e GROUP BY g, v
),
rg AS (
  SELECT gv.g,
         CAST(SUM(gv.cg) AS BIGINT) AS n_g,
         CAST(SUM(gv.cg * tr.t2) AS BIGINT) AS s2_g
  FROM gv JOIN tr ON tr.v = gv.v
  GROUP BY gv.g
),
tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         SUM(POWER(s2_g / 2.0, 2) / n_g) AS rterm
  FROM rg
),
ties AS (
  SELECT CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS t3 FROM vc
),
h AS (
  SELECT tot.n,
         12.0 / (tot.n * (tot.n + 1.0)) * tot.rterm - 3 * (tot.n + 1.0)
           AS h_raw,
         1 - CAST(ties.t3 AS DOUBLE)
             / (CAST(tot.n AS DOUBLE) * tot.n * tot.n - tot.n) AS c
  FROM tot CROSS JOIN ties
)
SELECT n, CAST((SELECT COUNT(*) FROM rg) AS BIGINT) AS n_groups,
       ROUND(h_raw, 4) AS h,
       ROUND(h_raw / c, 4) AS h_tie_adjusted
FROM h
"""


@register(
    "q289_kruskal_wallis",
    _Q289_SQL,
    doc=(
        "Kruskal-Wallis k-sample rank test (q213 Mann-Whitney's "
        "k-group extension — does ANY type's value distribution "
        "differ): pooled average ranks via the q232 doubled-rank "
        "contingency trick (2·rank stays an exact BIGINT through "
        "ties), per-group rank sums from the (group, value) rollup "
        "joined to the value-domain-sized rank frame (|distinct "
        "cents|, never corpus rows), H with the exact tie "
        "correction 1-Σ(t³-t)/(N³-N); H_adj ~ chi²(k-1) under the "
        "null — ~4 expected on this label-free fixture"
    ),
    tables=("events",),
)
def q289(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    vc = e.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    # value-domain-sized window (|distinct cents|), not corpus-sized
    tr = vc.select(
        "v",
        (
            2 * F.coalesce(F.sum("cnt").over(w), F.lit(0))
            + F.col("cnt")
            + 1
        ).alias("t2"),
    )
    gv = e.groupBy("g", "v").agg(F.count(F.lit(1)).alias("cg"))
    rg = (
        gv.join(F.broadcast(tr), "v")
        .groupBy("g")
        .agg(
            F.sum("cg").alias("n_g"),
            F.sum(F.col("cg") * F.col("t2")).alias("s2_g"),
        )
    )
    tot = rg.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_g").alias("n"),
        F.sum(F.pow(F.col("s2_g") / 2.0, 2) / F.col("n_g")).alias("rterm"),
    )
    ties = vc.agg(
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("t3")
    )
    n = F.col("n")
    h_raw = 12.0 / (n * (n + 1.0)) * F.col("rterm") - 3 * (n + 1.0)
    c = 1 - F.col("t3").cast("double") / (
        n.cast("double") * n * n - n
    )
    return (
        tot.crossJoin(F.broadcast(ties))
        .select(
            "n",
            "n_groups",
            F.round(h_raw, 4).alias("h"),
            F.round(h_raw / c, 4).alias("h_tie_adjusted"),
        )
    )


# ---------------------------------------------------------------------------
# q290: log-rank test (two-arm survival comparison, q219's inferential twin)
# ---------------------------------------------------------------------------

_Q290_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         {sql_hash_bucket("user_id", 2)} AS arm,
         MIN(epoch_us(ts)) AS t0,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp,
         MAX(epoch_us(ts)) AS tl
  FROM events GROUP BY user_id
),
dur AS (
  SELECT arm,
         CAST(COALESCE(tp - t0, tl - t0) // 86400000000 AS BIGINT) AS t,
         CAST(tp IS NOT NULL AS BIGINT) AS died
  FROM per_user
),
day AS (
  SELECT t, arm,
         CAST(SUM(died) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM dur GROUP BY t, arm
),
grid AS (
  SELECT DISTINCT dy.t, a.arm
  FROM (SELECT DISTINCT t FROM day) dy
  CROSS JOIN (SELECT 0 AS arm UNION ALL SELECT 1) a
),
full_day AS (
  SELECT g.t, g.arm, COALESCE(day.d, 0) AS d, COALESCE(day.c, 0) AS c
  FROM grid g LEFT JOIN day ON day.t = g.t AND day.arm = g.arm
),
risk AS (
  SELECT t, arm, d,
         SUM(c) OVER (PARTITION BY arm ORDER BY t DESC) AS n_risk
  FROM full_day
),
wide AS (
  SELECT t,
         SUM(CASE WHEN arm = 1 THEN d ELSE 0 END) AS d1,
         SUM(d) AS dt,
         SUM(CASE WHEN arm = 1 THEN n_risk ELSE 0 END) AS n1,
         SUM(n_risk) AS nt
  FROM risk GROUP BY t
),
terms AS (
  SELECT t, d1,
         dt * CAST(n1 AS DOUBLE) / nt AS e1,
         CASE WHEN nt > 1
              THEN dt * (CAST(n1 AS DOUBLE) / nt)
                   * (1 - CAST(n1 AS DOUBLE) / nt)
                   * (nt - dt) / (nt - 1.0)
              ELSE 0.0 END AS v1
  FROM wide WHERE dt > 0
)
SELECT CAST(SUM(d1) AS BIGINT) AS observed_1,
       ROUND(SUM(e1), 4) AS expected_1,
       ROUND(POWER(SUM(d1) - SUM(e1), 2) / SUM(v1), 4) AS logrank_chi2
FROM terms
"""


@register(
    "q290_logrank",
    _Q290_SQL,
    doc=(
        "log-rank test between two hash arms on time-to-first-"
        "purchase (q219 Kaplan-Meier's inferential twin — the "
        "standard survival-curve comparison): at each event time the "
        "hypergeometric expected deaths and variance for arm 1 come "
        "from the at-risk table (a reverse cumulative window per arm "
        "over the |distinct days| frame, densified so both arms "
        "carry at-risk counts at every event time), chi² = "
        "(O−E)²/ΣV; on the random split the honest chi² is ~chi²(1)"
    ),
    tables=("events",),
)
def q290(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts_us").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts_us"))
        ).alias("tp"),
        F.max("ts_us").alias("tl"),
    ).withColumn("arm", hash_bucket("user_id", 2))
    dur = per_user.select(
        "arm",
        (
            F.coalesce(F.col("tp") - F.col("t0"), F.col("tl") - F.col("t0"))
            / F.lit(86400000000)
        ).cast("long").alias("t_raw"),
        F.col("tp").isNotNull().cast("long").alias("died"),
    ).select(F.expr("t_raw").alias("t"), "arm", "died")
    day = dur.groupBy("t", "arm").agg(
        F.sum("died").alias("d"), F.count(F.lit(1)).alias("c")
    )
    arms = ev.sparkSession.createDataFrame([(0,), (1,)], "arm LONG")
    grid = day.select("t").distinct().crossJoin(F.broadcast(arms))
    full_day = grid.join(day, ["t", "arm"], "left").select(
        "t",
        "arm",
        F.coalesce("d", F.lit(0)).alias("d"),
        F.coalesce("c", F.lit(0)).alias("c"),
    )
    w = Window.partitionBy("arm").orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = full_day.select(
        "t", "arm", "d", F.sum("c").over(w).alias("n_risk")
    )
    wide = risk.groupBy("t").agg(
        F.sum(F.when(F.col("arm") == 1, F.col("d")).otherwise(0)).alias("d1"),
        F.sum("d").alias("dt"),
        F.sum(
            F.when(F.col("arm") == 1, F.col("n_risk")).otherwise(0)
        ).alias("n1"),
        F.sum("n_risk").alias("nt"),
    )
    frac = F.col("n1").cast("double") / F.col("nt")
    terms = wide.where(F.col("dt") > 0).select(
        "d1",
        (F.col("dt") * frac).alias("e1"),
        F.when(
            F.col("nt") > 1,
            F.col("dt") * frac * (1 - frac)
            * (F.col("nt") - F.col("dt")) / (F.col("nt") - 1.0),
        ).otherwise(0.0).alias("v1"),
    )
    return terms.agg(
        F.sum("d1").cast("long").alias("observed_1"),
        F.round(F.sum("e1"), 4).alias("expected_1"),
        F.round(
            F.pow(F.sum("d1") - F.sum("e1"), 2) / F.sum("v1"), 4
        ).alias("logrank_chi2"),
    )


# ---------------------------------------------------------------------------
# q291: Fleiss' kappa — k-rater chance-corrected agreement
# ---------------------------------------------------------------------------

_Q291_CUTS = (40, 50, 60)  # three heuristic raters

_Q291_SQL = f"""
WITH r AS (
  SELECT event_id,
         {" + ".join(f"CASE WHEN value >= {c} THEN 1 ELSE 0 END" for c in _Q291_CUTS)}
           AS n_pos
  FROM events
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_pos) AS BIGINT) AS tot_pos,
         CAST(SUM(n_pos * n_pos + (3 - n_pos) * (3 - n_pos)) AS BIGINT)
           AS sq_sum
  FROM r
)
SELECT n AS n_items,
       ROUND((CAST(sq_sum AS DOUBLE) - n * 3) / (n * 3 * 2.0), 6)
         AS p_observed,
       ROUND(POWER(CAST(tot_pos AS DOUBLE) / (n * 3), 2)
             + POWER(1 - CAST(tot_pos AS DOUBLE) / (n * 3), 2), 6)
         AS p_expected,
       ROUND(((CAST(sq_sum AS DOUBLE) - n * 3) / (n * 3 * 2.0)
              - (POWER(CAST(tot_pos AS DOUBLE) / (n * 3), 2)
                 + POWER(1 - CAST(tot_pos AS DOUBLE) / (n * 3), 2)))
             / (1 - (POWER(CAST(tot_pos AS DOUBLE) / (n * 3), 2)
                     + POWER(1 - CAST(tot_pos AS DOUBLE) / (n * 3), 2))),
             6) AS fleiss_kappa
FROM s
"""


@register(
    "q291_fleiss_kappa",
    _Q291_SQL,
    doc=(
        "Fleiss' kappa (1971) — q265's Cohen generalized to THREE "
        "raters (the value>=40/50/60 heuristics): per-item agreement "
        "P_i = (Σ n_ij² - k)/(k(k-1)) reduces to ONE integer rollup "
        "of n_pos and n_pos², chance agreement from the pooled "
        "category shares, kappa closed-form; the three correlated "
        "thresholds agree far above chance but below 1 — the "
        "multi-annotator audit shape"
    ),
    tables=("events",),
)
def q291(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    n_pos = sum(
        (F.when(F.col("value") >= c, 1).otherwise(0) for c in _Q291_CUTS),
        F.lit(0),
    )
    r = ev.select(n_pos.alias("n_pos"))
    s = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_pos").alias("tot_pos"),
        F.sum(
            F.col("n_pos") * F.col("n_pos")
            + (3 - F.col("n_pos")) * (3 - F.col("n_pos"))
        ).alias("sq_sum"),
    )
    n = F.col("n")
    po = (F.col("sq_sum").cast("double") - n * 3) / (n * 3 * 2.0)
    share = F.col("tot_pos").cast("double") / (n * 3)
    pe = F.pow(share, 2) + F.pow(1 - share, 2)
    return s.select(
        n.alias("n_items"),
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_expected"),
        F.round((po - pe) / (1 - pe), 6).alias("fleiss_kappa"),
    )


# ---------------------------------------------------------------------------
# q293: vocabulary saturation forecast (extrapolating the Heaps fit)
# ---------------------------------------------------------------------------

_Q293_MULTIPLIERS = (2, 5, 10)

_Q293_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         ROW_NUMBER() OVER (ORDER BY doc_id) AS drk,
         COUNT(*) OVER () AS nd
  FROM documents
),
grams AS (
  SELECT ws[i] || ' ' || ws[i + 1] AS g, drk
  FROM d, UNNEST(range(1, len(ws))) AS u(i)
),
first_seen AS (SELECT g, CAST(MIN(drk) AS BIGINT) AS fr FROM grams GROUP BY g),
per_doc AS (
  SELECT drk, CAST(COUNT(*) AS BIGINT) AS toks FROM grams GROUP BY drk
),
ck(p) AS (SELECT * FROM (VALUES (20), (40), (60), (80), (100)) v(p)),
pts AS (
  SELECT ck.p,
         (SELECT CAST(SUM(toks) AS BIGINT) FROM per_doc,
            (SELECT ANY_VALUE(nd) AS nd FROM d) x
          WHERE drk <= (ck.p * x.nd + 99) // 100) AS n_tokens,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM first_seen,
            (SELECT ANY_VALUE(nd) AS nd FROM d) x
          WHERE fr <= (ck.p * x.nd + 99) // 100) AS v_types
  FROM ck
),
fit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         SUM(ROUND(LN(n_tokens), 6)) AS sx,
         SUM(ROUND(LN(v_types), 6)) AS sy,
         SUM(ROUND(LN(n_tokens), 6) * ROUND(LN(v_types), 6)) AS sxy,
         SUM(ROUND(LN(n_tokens), 6) * ROUND(LN(n_tokens), 6)) AS sxx
  FROM pts
),
coef AS (
  SELECT (k * sxy - sx * sy) / (k * sxx - sx * sx) AS beta,
         (sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k
           AS lnk
  FROM fit
),
now_pt AS (
  SELECT n_tokens AS n_now, v_types AS v_now FROM pts WHERE p = 100
)
SELECT CAST(m AS BIGINT) AS tokens_multiplier,
       CAST(now_pt.n_now * m AS BIGINT) AS projected_tokens,
       CAST(ROUND(EXP(coef.lnk + coef.beta
                      * ROUND(LN(CAST(now_pt.n_now AS DOUBLE) * m), 6)))
            AS BIGINT) AS projected_vocab,
       now_pt.v_now AS current_vocab
FROM (SELECT * FROM (VALUES {", ".join(f"({m})" for m in _Q293_MULTIPLIERS)})
      v(m)) ms
CROSS JOIN coef CROSS JOIN now_pt
ORDER BY tokens_multiplier
"""


@register(
    "q293_vocab_forecast",
    _Q293_SQL,
    doc=(
        "vocabulary saturation forecast — the capacity-planning use "
        "of q256's Heaps fit: V(m·N) = K·(m·N)^β extrapolated to "
        "2×/5×/10× today's token count from the measured (K, β) "
        "(should you budget a bigger tokenizer vocab before scaling "
        "the corpus?); same ln-rounding fit discipline as q256, the "
        "single EXP per row rounded to a whole type count; on this "
        "CLOSED-vocabulary fixture the forecast stays near today's "
        "vocab — exactly what β≈0.1 predicts"
    ),
    tables=("documents",),
)
def q293(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id")
    d = docs.select("doc_id", F.row_number().over(w).alias("drk"))
    nd = docs.agg(F.count(F.lit(1)).alias("nd"))
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 1), "
                "i -> concat(split(text, ' ')[i - 1], ' ', "
                "split(text, ' ')[i]))"
            )
        ).alias("g"),
    ).join(F.broadcast(d), "doc_id")
    first_seen = grams.groupBy("g").agg(F.min("drk").cast("long").alias("fr"))
    per_doc = grams.groupBy("drk").agg(F.count(F.lit(1)).alias("toks"))
    ck = docs.sparkSession.createDataFrame(
        [(p,) for p in (20, 40, 60, 80, 100)], "p LONG"
    )
    ckn = ck.crossJoin(F.broadcast(nd)).select(
        "p", F.expr("(p * nd + 99) div 100").alias("kdoc")
    )
    n_tokens = (
        per_doc.crossJoin(F.broadcast(ckn))
        .where(F.col("drk") <= F.col("kdoc"))
        .groupBy("p")
        .agg(F.sum("toks").alias("n_tokens"))
    )
    v_types = (
        first_seen.crossJoin(F.broadcast(ckn))
        .where(F.col("fr") <= F.col("kdoc"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("v_types"))
    )
    pts = n_tokens.join(v_types, "p")
    x = F.round(F.log(F.col("n_tokens").cast("double")), 6)
    y = F.round(F.log(F.col("v_types").cast("double")), 6)
    fit = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    beta = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    coef = fit.select(
        beta.alias("beta"),
        ((F.col("sy") - beta * F.col("sx")) / F.col("k")).alias("lnk"),
    )
    now_pt = pts.where(F.col("p") == 100).select(
        F.col("n_tokens").alias("n_now"), F.col("v_types").alias("v_now")
    )
    ms = docs.sparkSession.createDataFrame(
        [(m,) for m in _Q293_MULTIPLIERS], "m LONG"
    )
    return (
        ms.crossJoin(F.broadcast(coef))
        .crossJoin(F.broadcast(now_pt))
        .select(
            F.col("m").alias("tokens_multiplier"),
            (F.col("n_now") * F.col("m")).cast("long").alias(
                "projected_tokens"
            ),
            F.round(
                F.exp(
                    F.col("lnk")
                    + F.col("beta")
                    * F.round(
                        F.log(F.col("n_now").cast("double") * F.col("m")), 6
                    )
                )
            ).cast("long").alias("projected_vocab"),
            F.col("v_now").alias("current_vocab"),
        )
        .orderBy("tokens_multiplier")
    )


# ---------------------------------------------------------------------------
# q294: entropy rate of the behavioral Markov chain
# ---------------------------------------------------------------------------

_Q294_SQL = """
WITH o AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
           ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) AS src
  FROM events
),
t AS (
  SELECT src, event_type AS dst, CAST(COUNT(*) AS BIGINT) AS c
  FROM o WHERE src IS NOT NULL GROUP BY 1, 2
),
row_tot AS (SELECT src, CAST(SUM(c) AS BIGINT) AS rt FROM t GROUP BY src),
grand AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM t),
h AS (
  SELECT t.src,
         ROUND(-SUM((CAST(t.c AS DOUBLE) / rt.rt)
                    * LN(CAST(t.c AS DOUBLE) / rt.rt)) / LN(2), 6)
           AS h_row,
         CAST(ANY_VALUE(rt.rt) AS BIGINT) AS rt
  FROM t JOIN row_tot rt ON rt.src = t.src
  GROUP BY t.src
)
SELECT CAST((SELECT COUNT(*) FROM h) AS BIGINT) AS n_states,
       ROUND(SUM(h.h_row * h.rt / grand.n), 4) AS entropy_rate_bits,
       ROUND(LN((SELECT COUNT(*) FROM h)) / LN(2), 4) AS max_entropy_bits,
       ROUND(1 - SUM(h.h_row * h.rt / grand.n)
             / (LN((SELECT COUNT(*) FROM h)) / LN(2)), 4) AS predictability
FROM h CROSS JOIN grand
GROUP BY grand.n
"""


@register(
    "q294_markov_entropy_rate",
    _Q294_SQL,
    doc=(
        "entropy rate of the empirical behavior chain — how "
        "predictable is the next event, in bits (the "
        "information-theoretic ceiling for any next-event model like "
        "q255's): H = Σ π_i H(row_i) with π the empirical source "
        "share, per-row entropies over the |types|² transition "
        "rollup, ln-to-bits; predictability = 1 − H/log₂|states| — "
        "~0 on this uniform-behavior fixture (the honest null: "
        "q255's top-1 accuracy ~1/|types| agrees)"
    ),
    tables=("events",),
)
def q294(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    o = ev.select(
        "event_type", F.lag("event_type").over(w).alias("src")
    ).where(F.col("src").isNotNull())
    t = o.groupBy("src", F.col("event_type").alias("dst")).agg(
        F.count(F.lit(1)).alias("c")
    )
    row_tot = t.groupBy("src").agg(F.sum("c").alias("rt"))
    grand = t.agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("rt")
    h = (
        t.join(F.broadcast(row_tot), "src")
        .groupBy("src")
        .agg(
            F.round(-F.sum(p * F.log(p)) / F.lit(float(__import__("math").log(2))), 6).alias("h_row"),
            F.first("rt").alias("rt"),
        )
    )
    n_states = h.agg(F.count(F.lit(1)).alias("ns"))
    ln2 = float(__import__("math").log(2))
    return (
        h.crossJoin(F.broadcast(grand))
        .crossJoin(F.broadcast(n_states))
        .groupBy("n", "ns")
        .agg(
            F.sum(F.col("h_row") * F.col("rt") / F.col("n")).alias("er_raw"),
        )
        .select(
            F.col("ns").cast("long").alias("n_states"),
            F.round("er_raw", 4).alias("entropy_rate_bits"),
            F.round(F.log(F.col("ns").cast("double")) / ln2, 4).alias(
                "max_entropy_bits"
            ),
            F.round(
                1
                - F.col("er_raw")
                / (F.log(F.col("ns").cast("double")) / ln2),
                4,
            ).alias("predictability"),
        )
    )


# ---------------------------------------------------------------------------
# q296: Wald SPRT replay (sequential test of the purchase share)
# ---------------------------------------------------------------------------

_Q296_P0 = 0.19
_Q296_P1 = 0.21
_Q296_LNA = 2.9444  # ln((1-beta)/alpha) ~ ln(0.95/0.05), literal
_Q296_LNB = -2.9444

_Q296_SQL = f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS k,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
llr AS (
  SELECT d, k, n,
         SUM(k * ROUND(LN({_Q296_P1} / {_Q296_P0}), 6)
             + (n - k) * ROUND(LN((1 - {_Q296_P1}) / (1 - {_Q296_P0})), 6))
           OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS s
  FROM daily
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(MAX(s), 4) AS max_llr,
       ROUND(MIN(s), 4) AS min_llr,
       CAST(MIN(CASE WHEN s >= {_Q296_LNA} THEN d END) AS BIGINT)
         AS accept_h1_day,
       CAST(MIN(CASE WHEN s <= {_Q296_LNB} THEN d END) AS BIGINT)
         AS accept_h0_day
FROM llr
"""


@register(
    "q296_sprt",
    _Q296_SQL,
    doc=(
        "Wald's SPRT (1945) replayed over the daily purchase share — "
        "the sequential test that STOPS as soon as the evidence "
        "crosses a boundary, vs the fixed-n tests q173/q275 size in "
        "advance: the log-likelihood ratio between p0=0.19 and "
        "p1=0.21 accumulates via ONE ordered cumulative window over "
        "the 30-day rollup (per-day increment = k·ln(p1/p0) + "
        "(n−k)·ln(q1/q0), the ln factors ROUND()ed once as shared "
        "scalars), boundaries ±ln(0.95/0.05) as literals; the true "
        "share ~0.198 sits between the hypotheses, so the honest "
        "outcome is often NO decision in 30 days — exactly what SPRT "
        "is supposed to do with inconclusive evidence"
    ),
    tables=("events",),
)
def q296(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).cast("long").alias("d")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("k"),
        F.count(F.lit(1)).alias("n"),
    )
    lp = round(math.log(_Q296_P1 / _Q296_P0), 6)
    lq = round(math.log((1 - _Q296_P1) / (1 - _Q296_P0)), 6)
    seq = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    llr = daily.select(
        "d",
        F.sum(F.col("k") * lp + (F.col("n") - F.col("k")) * lq)
        .over(seq)
        .alias("s"),
    )
    return llr.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.max("s"), 4).alias("max_llr"),
        F.round(F.min("s"), 4).alias("min_llr"),
        F.min(
            F.when(F.col("s") >= _Q296_LNA, F.col("d"))
        ).cast("long").alias("accept_h1_day"),
        F.min(
            F.when(F.col("s") <= _Q296_LNB, F.col("d"))
        ).cast("long").alias("accept_h0_day"),
    )


# ---------------------------------------------------------------------------
# q297: negative-binomial fit of per-user activity (overdispersion)
# ---------------------------------------------------------------------------

_Q297_SQL = """
WITH per_user AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM per_user
),
mv AS (
  SELECT n,
         CAST(s1 AS DOUBLE) / n AS mean_c,
         (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)
           AS var_c
  FROM s
)
SELECT n AS n_users,
       ROUND(mean_c, 4) AS mean_events,
       ROUND(var_c, 4) AS var_events,
       ROUND(var_c / mean_c, 4) AS dispersion,
       ROUND(CASE WHEN var_c > mean_c
             THEN mean_c * mean_c / (var_c - mean_c) END, 4) AS nb_r,
       ROUND(CASE WHEN var_c > mean_c
             THEN mean_c / var_c END, 4) AS nb_p
FROM mv
"""


@register(
    "q297_nbinom_fit",
    _Q297_SQL,
    doc=(
        "negative-binomial (Gamma-Poisson) fit of per-user event "
        "counts by method of moments — THE distribution question "
        "behind capacity planning and q266's clustering correction: "
        "r = m²/(v−m), p = m/v from one integer power-sum rollup; "
        "dispersion v/m > 1 means heterogeneous users (NB), ~1 means "
        "one shared Poisson rate — this fixture sits near 1, "
        "CONSISTENT with q283's rho²~0 and q294's flat entropy (three "
        "independent queries agreeing on the generator's homogeneity); "
        "nb_r/nb_p are NULL when v <= m, where NB degenerates"
    ),
    tables=("events",),
)
def q297(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    s = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    n = F.col("n")
    mean_c = F.col("s1").cast("double") / n
    var_c = (
        F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / n
    ) / (n - 1)
    return s.select(
        n.alias("n_users"),
        F.round(mean_c, 4).alias("mean_events"),
        F.round(var_c, 4).alias("var_events"),
        F.round(var_c / mean_c, 4).alias("dispersion"),
        F.round(
            F.when(var_c > mean_c, mean_c * mean_c / (var_c - mean_c)), 4
        ).alias("nb_r"),
        F.round(F.when(var_c > mean_c, mean_c / var_c), 4).alias("nb_p"),
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
# q314: McNemar paired-classifier test (round 8)
# ---------------------------------------------------------------------------

_Q314_NCHARS = 306  # rule A threshold: global median-ish n_chars
_Q314_SPACES = 60   # rule B threshold: >= 61 whitespace tokens

# Two deterministic rule classifiers predict lang='en' on the SAME
# documents (A: n_chars > 306; B: token count > 60 via space count).
# McNemar tests whether their accuracies differ using only the
# DISCORDANT pairs (b = A right/B wrong, c = B right/A wrong); the
# continuity-corrected statistic (|b-c|-1)^2/(b+c) is a ratio of exact
# integers.  The fixture's lang labels are independent of text (the
# label-free-corpus property pinned in round 7), so the honest result
# is a small statistic; the b+c=0 degenerate branch is NULLIF-guarded
# and pinned by a synthetic test.
_Q314_SQL = f"""
WITH d AS (
  SELECT (n_chars > {_Q314_NCHARS}) = (lang = 'en') AS a_ok,
         ((LENGTH(text) - LENGTH(REPLACE(text, ' ', '')))
            > {_Q314_SPACES}) = (lang = 'en') AS b_ok
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN a_ok THEN 1 ELSE 0 END) AS BIGINT) AS a_correct,
       CAST(SUM(CASE WHEN b_ok THEN 1 ELSE 0 END) AS BIGINT) AS b_correct,
       CAST(SUM(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END) AS BIGINT)
         AS n_only_a,
       CAST(SUM(CASE WHEN b_ok AND NOT a_ok THEN 1 ELSE 0 END) AS BIGINT)
         AS n_only_b,
       ROUND(
         CAST(GREATEST(ABS(SUM(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END)
                           - SUM(CASE WHEN b_ok AND NOT a_ok THEN 1 ELSE 0 END))
                       - 1, 0) AS DOUBLE)
         * GREATEST(ABS(SUM(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END)
                        - SUM(CASE WHEN b_ok AND NOT a_ok THEN 1 ELSE 0 END))
                    - 1, 0)
         / NULLIF(CAST(SUM(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END)
                       + SUM(CASE WHEN b_ok AND NOT a_ok THEN 1 ELSE 0 END)
                       AS DOUBLE), 0.0), 6) AS mcnemar_chi2
FROM d
"""


@register(
    "q314_mcnemar",
    _Q314_SQL,
    doc=(
        "McNemar paired test for two classifiers evaluated on the SAME "
        "rows (the correct test when comparing models on one eval set "
        "— unpaired z-tests overstate significance): both rule "
        "classifiers and the agreement flags are computed in one "
        "projection, one aggregation derives the discordant cells b/c, "
        "and the continuity-corrected (|b-c|-1)^2/(b+c) statistic is a "
        "ratio of exact BIGINTs (the GREATEST(...,0) clamp handles "
        "|b-c|<=1 the standard way).  One scan, one reduce, no "
        "shuffle wider than the single rollup row; b+c=0 is "
        "NULLIF-guarded (ANSI Spark throws on x/0)"
    ),
    tables=("documents",),
)
def q314(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    en = F.col("lang") == "en"
    a_ok = (F.col("n_chars") > _Q314_NCHARS) == en
    b_ok = (
        F.length("text") - F.length(F.regexp_replace("text", " ", ""))
        > _Q314_SPACES
    ) == en
    d = docs.select(a_ok.alias("a_ok"), b_ok.alias("b_ok"))
    b = F.sum(F.when(F.col("a_ok") & ~F.col("b_ok"), 1).otherwise(0))
    c = F.sum(F.when(F.col("b_ok") & ~F.col("a_ok"), 1).otherwise(0))
    corr = F.greatest(F.abs(b - c) - 1, F.lit(0))
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("a_ok"), 1).otherwise(0)).cast("long").alias("a_correct"),
        F.sum(F.when(F.col("b_ok"), 1).otherwise(0)).cast("long").alias("b_correct"),
        b.cast("long").alias("n_only_a"),
        c.cast("long").alias("n_only_b"),
        F.round(
            corr.cast("double") * corr / F.nullif((b + c).cast("double"), F.lit(0.0)),
            6,
        ).alias("mcnemar_chi2"),
    )


# ---------------------------------------------------------------------------
# q315: Cochran-Armitage trend test (round 8)
# ---------------------------------------------------------------------------

# Dose-response shape: does the fraction of 'F' (fulfilled) orders
# TREND with the ordered priority score x=1..5?  The statistic is
# assembled from five integer power sums (Armitage 1955):
#   A = N*sum(x*r) - R*sum(x*n)          (trend numerator)
#   B = N*sum(x^2*n) - sum(x*n)^2        (score dispersion)
#   Z^2 = N*A^2 / (R*(N-R)*B)
# A and B stay BIGINT (headroom to N ~ 1.5e8); A is CAST to DOUBLE
# before squaring (the q214 overflow lesson).  Priorities are uniform
# over status in the fixture, so the honest statistic is ~chi2(1) noise.
_Q315_SQL = """
WITH g AS (
  SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS r,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
),
t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(r) AS BIGINT) AS rr,
         CAST(SUM(x * r) AS BIGINT) AS sxr,
         CAST(SUM(x * n) AS BIGINT) AS sxn,
         CAST(SUM(x * x * n) AS BIGINT) AS sxxn
  FROM g
)
SELECT nn AS n, rr AS n_success,
       CAST(nn * sxr - rr * sxn AS BIGINT) AS trend_num,
       ROUND(nn * CAST(nn * sxr - rr * sxn AS DOUBLE)
                * CAST(nn * sxr - rr * sxn AS DOUBLE)
             / NULLIF(CAST(rr AS DOUBLE) * (nn - rr)
                      * (nn * sxxn - sxn * sxn), 0.0), 6) AS ca_z2
FROM t
"""


@register(
    "q315_cochran_armitage",
    _Q315_SQL,
    doc=(
        "Cochran-Armitage trend test for a binary outcome across "
        "ORDERED groups (the dose-response test chi-squared "
        "independence ignores): per-priority success counts reduce to "
        "five integer power sums, and the z^2 statistic is one "
        "arithmetic expression over them — trend numerator and score "
        "dispersion are exact BIGINT cross-multiplications, the "
        "numerator CAST to DOUBLE before squaring (q214 overflow "
        "lesson), zero denominator NULLIF-guarded.  One scan, one "
        "5-row group frame, one scalar row out; nothing shuffles but "
        "the 5 group rows"
    ),
    tables=("orders",),
)
def q315(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    g = (
        orders.select(
            F.substring("o_orderpriority", 1, 1).cast("long").alias("x"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("f"),
        )
        .groupBy("x")
        .agg(
            F.sum("f").cast("long").alias("r"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    t = g.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("r").cast("long").alias("rr"),
        F.sum(F.col("x") * F.col("r")).cast("long").alias("sxr"),
        F.sum(F.col("x") * F.col("n")).cast("long").alias("sxn"),
        F.sum(F.col("x") * F.col("x") * F.col("n")).cast("long").alias("sxxn"),
    )
    a = (F.col("nn") * F.col("sxr") - F.col("rr") * F.col("sxn")).cast("double")
    denom = F.nullif(
        F.col("rr").cast("double")
        * (F.col("nn") - F.col("rr"))
        * (F.col("nn") * F.col("sxxn") - F.col("sxn") * F.col("sxn")),
        F.lit(0.0),
    )
    return t.select(
        F.col("nn").alias("n"),
        F.col("rr").alias("n_success"),
        (F.col("nn") * F.col("sxr") - F.col("rr") * F.col("sxn"))
        .cast("long")
        .alias("trend_num"),
        F.round(F.col("nn") * a * a / denom, 6).alias("ca_z2"),
    )


# ---------------------------------------------------------------------------
# q319: Holm step-down FWER control vs BH side-by-side (round 8)
# ---------------------------------------------------------------------------

_Q319_ALPHA = 0.05

_Q319_SQL = f"""
WITH e AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
              AS BIGINT) AS dow,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(v) AS BIGINT) AS s1,
         CAST(SUM(v * v) AS BIGINT) AS s2
  FROM e
),
cell AS (
  SELECT event_type, dow,
         CAST(COUNT(*) AS BIGINT) AS n_c,
         CAST(SUM(v) AS BIGINT) AS s1c
  FROM e GROUP BY event_type, dow
),
z AS (
  SELECT c.event_type, c.dow, c.n_c,
         (CAST(c.s1c AS DOUBLE) / c.n_c - CAST(g.s1 AS DOUBLE) / g.n_g)
         / SQRT(((CAST(g.s2 AS DOUBLE)
                  - CAST(g.s1 AS DOUBLE) * g.s1 / g.n_g) / (g.n_g - 1))
                / c.n_c) AS zs
  FROM cell c CROSS JOIN g
),
p AS (
  SELECT event_type, dow, zs,
         1.0 / (1.0 + zs * zs) AS pv,
         ROW_NUMBER() OVER (ORDER BY 1.0 / (1.0 + zs * zs), event_type, dow)
           AS rn,
         COUNT(*) OVER () AS m
  FROM z
),
k AS (
  SELECT *,
         MIN(CASE WHEN pv * (m - rn + 1) > {_Q319_ALPHA} THEN rn END)
           OVER () AS kfirst,
         MAX(CASE WHEN pv * m <= {_Q319_ALPHA} * rn THEN rn ELSE 0 END)
           OVER () AS kmax
  FROM p
)
SELECT event_type, dow,
       ROUND(zs, 4) AS z,
       ROUND(pv, 6) AS p_surrogate,
       CAST(rn AS BIGINT) AS rn,
       CAST(m AS BIGINT) AS m,
       rn < COALESCE(kfirst, m + 1) AS rejected_holm,
       rn <= kmax AS rejected_bh
FROM k ORDER BY event_type, dow
"""


@register(
    "q319_holm_stepdown",
    _Q319_SQL,
    doc=(
        "Holm step-down FWER control on q234's per-(type,dow) mean-"
        "shift hypotheses, reported SIDE-BY-SIDE with BH step-up so "
        "the reject sets' strictness ordering (Holm is always a "
        "subset at the same alpha) is visible in one frame: the cell "
        "z's come from integer power sums, the rational surrogate "
        "p=1/(1+z^2) keeps the rank procedure engine-exact, and both "
        "procedures run on the 35-row post-aggregation frame "
        "(operators/multitest.holm_stepdown + bh_stepup — the "
        "documented bounded-window exception).  Fixture answer: zero "
        "rejections from either (the honest null); the reject branch "
        "and the subset property are pinned by planted tests"
    ),
    tables=("events",),
)
def q319(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.multitest import (
        holm_stepdown,
    )

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        (
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            % 7
        ).cast("long").alias("dow"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    g = e.agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    cell = e.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n_c"), F.sum("v").alias("s1c")
    )
    var_g = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n_g")
    ) / (F.col("n_g") - 1)
    zs = (
        F.col("s1c").cast("double") / F.col("n_c")
        - F.col("s1").cast("double") / F.col("n_g")
    ) / F.sqrt(var_g / F.col("n_c"))
    p = (
        cell.crossJoin(F.broadcast(g))
        .select("event_type", "dow", zs.alias("zs"))
        .withColumn("pv", 1.0 / (1.0 + F.col("zs") * F.col("zs")))
    )
    # both procedures on the 35-row hypothesis frame; BH's rank/m are
    # identical to Holm's (same order spec), so join back on the keys
    hs = holm_stepdown(p, "pv", _Q319_ALPHA, tie_cols=("event_type", "dow"))
    hb = bh_stepup(p, "pv", _Q319_ALPHA, tie_cols=("event_type", "dow")).select(
        "event_type", "dow", F.col("rejected").alias("rejected_bh")
    )
    return (
        hs.join(hb, ["event_type", "dow"])
        .select(
            "event_type",
            "dow",
            F.round("zs", 4).alias("z"),
            F.round("pv", 6).alias("p_surrogate"),
            F.col("rn").cast("long").alias("rn"),
            F.col("m").cast("long").alias("m"),
            F.col("rejected").alias("rejected_holm"),
            "rejected_bh",
        )
        .orderBy("event_type", "dow")
    )


# ---------------------------------------------------------------------------
# q328: empirical-Bayes (beta-binomial) shrinkage of per-user rates
# ---------------------------------------------------------------------------

# James-Stein-style partial pooling, the standard cure for "the best
# item is the one with 1/1 successes": fit Beta(alpha, beta) to the
# population of per-user purchase proportions by method of moments
# (Morris 1983 lineage; the baseball-batting-average classic), then
# report each user's posterior-mean rate (x + alpha)/(n + alpha +
# beta).  The fit is two float power sums over the per-user rollup
# (map-side combinable; the add-order drift is absorbed by 4dp on
# alpha/beta and 6dp on rates), everything else is exact-integer
# arithmetic.  Output is a deterministic 5% hash panel of users — a
# float-ranked top-k would make the row SET ulp-sensitive.
_Q328_MIN_N = 5
_Q328_PANEL = 5

_Q328_SQL = f"""
WITH u AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM events GROUP BY user_id
),
f AS (SELECT x * 1.0 / n AS p FROM u WHERE n >= {_Q328_MIN_N}),
mo AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nu, SUM(p) AS s1, SUM(p * p) AS s2
  FROM f
),
ab AS (
  SELECT nu, s1 / nu AS pbar,
         (s2 - s1 * s1 / nu) / (nu - 1) AS v
  FROM mo
),
ab2 AS (
  SELECT nu, pbar,
         pbar * (pbar * (1 - pbar) / NULLIF(v, 0.0) - 1) AS alpha,
         (1 - pbar) * (pbar * (1 - pbar) / NULLIF(v, 0.0) - 1) AS beta
  FROM ab
)
SELECT u.user_id, u.n, u.x,
       ROUND(u.x * 1.0 / u.n, 6) AS raw_rate,
       ROUND((u.x + alpha) / (u.n + alpha + beta), 6) AS shrunk_rate,
       ROUND(alpha, 4) AS alpha, ROUND(beta, 4) AS beta
FROM u CROSS JOIN ab2
WHERE ((u.user_id % 2147483648) * 2654435761) % 100 < {_Q328_PANEL}
ORDER BY u.user_id
"""


@register(
    "q328_empirical_bayes",
    _Q328_SQL,
    doc=(
        "empirical-Bayes beta-binomial shrinkage of per-user purchase "
        "rates (method-of-moments Beta fit over the population of "
        "proportions, posterior-mean rate (x+a)/(n+a+b) — the "
        "partial-pooling cure for small-n rate rankings): one keyed "
        "per-user rollup feeds a two-float-power-sum moment frame "
        "(map-side combinable; 4dp absorbs add-order drift), the "
        "1-row (alpha, beta) frame broadcasts back over a "
        f"deterministic {_Q328_PANEL}% hash panel (never a float-"
        "ranked top-k — the row SET would be ulp-sensitive), zero "
        "variance NULLIF-guarded.  Honest fixture answer: alpha~13, "
        "beta~54 — heavy shrinkage, because per-user n~40 barely "
        "outweighs the tight population prior"
    ),
    tables=("events",),
)
def q328(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.iterutils import (
        truncate_lineage,
    )
    from osm_changesets_to_parquet_spark.operators.quality import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    u = truncate_lineage(
        ev.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col("event_type") == "purchase").cast("long"))
            .cast("long")
            .alias("x"),
        )
    )
    p = F.col("x") * F.lit(1.0) / F.col("n")
    mo = u.where(F.col("n") >= _Q328_MIN_N).agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum(p).alias("s1"),
        F.sum(p * p).alias("s2"),
    )
    pbar = F.col("s1") / F.col("nu")
    v = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("nu")) / (
        F.col("nu") - 1
    )
    k = pbar * (1 - pbar) / F.nullif(v, F.lit(0.0)) - 1
    ab = mo.select(
        (pbar * k).alias("alpha"), ((1 - pbar) * k).alias("beta")
    )
    return (
        u.where(hash_bucket("user_id", 100) < _Q328_PANEL)
        .crossJoin(F.broadcast(ab))
        .select(
            "user_id",
            "n",
            "x",
            F.round(F.col("x") * F.lit(1.0) / F.col("n"), 6).alias(
                "raw_rate"
            ),
            F.round(
                (F.col("x") + F.col("alpha"))
                / (F.col("n") + F.col("alpha") + F.col("beta")),
                6,
            ).alias("shrunk_rate"),
            F.round("alpha", 4).alias("alpha"),
            F.round("beta", 4).alias("beta"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q329: uplift deciles + Qini curve (round 8)
# ---------------------------------------------------------------------------

# The heterogeneous-treatment-effect readout (Radcliffe 2007's Qini)
# that completes the experimentation family: q173 reads the average
# effect, q282 its quantiles, q283 reduces variance — this ranks the
# POPULATION by a pre-treatment score and asks where the effect
# concentrates (who to target).  Units are users, arms the shared
# id-hash authority (q173's spelling), score the user's pre-period
# (first 14 days) activity count, outcome any post-period purchase.
# Score deciles are assigned VALUE-DOMAIN-wise (per-count cumulative
# shares -> decile of the count value, the q137/q312 discipline) so no
# per-user global window exists; the Qini cumulative runs over the
# 10-row decile frame.  All counts are exact integers; the only
# doubles are final per-decile ratios of integers.
_Q329_SPLIT_DAY = 14

_Q329_SQL = f"""
WITH e AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         event_type
  FROM events
),
pre AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS pc
  FROM e WHERE d < {_Q329_SPLIT_DAY} GROUP BY user_id
),
outc AS (
  SELECT user_id, 1 AS y FROM e
  WHERE d >= {_Q329_SPLIT_DAY} AND event_type = 'purchase'
  GROUP BY user_id
),
users AS (
  SELECT p.user_id, p.pc,
         CASE WHEN ((p.user_id % 2147483648) * 2654435761) % 100 >= 50
              THEN 1 ELSE 0 END AS treat,
         COALESCE(o.y, 0) AS y
  FROM pre p LEFT JOIN outc o ON o.user_id = p.user_id
),
vc AS (SELECT pc, CAST(COUNT(*) AS BIGINT) AS c FROM users GROUP BY pc),
vb AS (
  SELECT pc,
         CAST(COALESCE(SUM(c) OVER (ORDER BY pc
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cb,
         CAST((SELECT SUM(c) FROM vc) AS BIGINT) AS nt
  FROM vc
),
dc AS (
  SELECT pc,
         LEAST(CAST(FLOOR(cb * 10.0 / nt) AS BIGINT), 9) AS decile
  FROM vb
),
g AS (
  SELECT d.decile, u.treat,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(u.y) AS BIGINT) AS conv
  FROM users u JOIN dc d ON d.pc = u.pc
  GROUP BY d.decile, u.treat
),
w AS (
  SELECT decile,
         CAST(SUM(CASE WHEN treat = 1 THEN n ELSE 0 END) AS BIGINT) AS n_t,
         CAST(SUM(CASE WHEN treat = 0 THEN n ELSE 0 END) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN treat = 1 THEN conv ELSE 0 END) AS BIGINT)
           AS conv_t,
         CAST(SUM(CASE WHEN treat = 0 THEN conv ELSE 0 END) AS BIGINT)
           AS conv_c
  FROM g GROUP BY decile
),
cum AS (
  SELECT decile, n_t, n_c, conv_t, conv_c,
         CAST(SUM(n_t) OVER (ORDER BY decile DESC) AS BIGINT) AS cnt,
         CAST(SUM(n_c) OVER (ORDER BY decile DESC) AS BIGINT) AS cnc,
         CAST(SUM(conv_t) OVER (ORDER BY decile DESC) AS BIGINT) AS cct,
         CAST(SUM(conv_c) OVER (ORDER BY decile DESC) AS BIGINT) AS ccc
  FROM w
)
SELECT decile, n_t, n_c, conv_t, conv_c,
       ROUND(conv_t * 1.0 / NULLIF(n_t, 0)
             - conv_c * 1.0 / NULLIF(n_c, 0), 6) AS uplift,
       ROUND(cct - ccc * 1.0 * cnt / NULLIF(cnc, 0), 4) AS qini
FROM cum ORDER BY decile DESC
"""


@register(
    "q329_uplift_qini",
    _Q329_SQL,
    doc=(
        "uplift deciles + Qini curve (Radcliffe 2007) — where does "
        "the treatment effect concentrate: users score by pre-period "
        "(first 14 days) activity, arms come from the shared id-hash "
        "authority (q173), outcome is any post-period purchase; per "
        "score-ranked decile the incremental conversions qini_k = "
        "cum_conv_t - cum_conv_c * cum_n_t/cum_n_c.  Deciles are "
        "assigned value-domain-wise (per-count cumulative shares -> "
        "decile of the COUNT VALUE, the q137/q312 discipline — no "
        "per-user global window anywhere), the Qini cumulative runs "
        "over the 10-row decile frame, and every cell is an exact "
        "integer until the final ratios.  Honest fixture answer: "
        "uplift ~ 0 everywhere (arms share one generator)"
    ),
    tables=("events",),
)
def q329(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.iterutils import (
        truncate_lineage,
    )
    from osm_changesets_to_parquet_spark.operators.quality import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d"),
        "event_type",
    )
    pre = (
        e.where(F.col("d") < _Q329_SPLIT_DAY)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("pc"))
    )
    outc = (
        e.where(
            (F.col("d") >= _Q329_SPLIT_DAY)
            & (F.col("event_type") == "purchase")
        )
        .groupBy("user_id")
        .agg(F.lit(1).alias("y"))
    )
    users = truncate_lineage(
        pre.join(outc, "user_id", "left").select(
            "user_id",
            "pc",
            F.when(hash_bucket("user_id", 100) >= 50, 1)
            .otherwise(0)
            .alias("treat"),
            F.coalesce(F.col("y"), F.lit(0)).alias("y"),
        )
    )
    vc = users.groupBy("pc").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wv = Window.orderBy("pc").rowsBetween(Window.unboundedPreceding, -1)
    nt = vc.agg(F.sum("c").cast("long").alias("nt"))
    vb = vc.select(
        "pc",
        F.coalesce(F.sum("c").over(wv), F.lit(0)).cast("long").alias("cb"),
    ).crossJoin(F.broadcast(nt))
    dc = vb.select(
        "pc",
        F.least(
            F.floor(F.col("cb") * F.lit(10.0) / F.col("nt")).cast("long"),
            F.lit(9).cast("long"),
        ).alias("decile"),
    )
    g = (
        users.join(F.broadcast(dc), "pc")
        .groupBy("decile", "treat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("conv"),
        )
    )
    w = g.groupBy("decile").agg(
        F.sum(F.when(F.col("treat") == 1, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_t"),
        F.sum(F.when(F.col("treat") == 0, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_c"),
        F.sum(F.when(F.col("treat") == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_t"),
        F.sum(F.when(F.col("treat") == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_c"),
    )
    wc = Window.orderBy(F.desc("decile")).rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = w.select(
        "decile",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.sum("n_t").over(wc).cast("long").alias("cnt"),
        F.sum("n_c").over(wc).cast("long").alias("cnc"),
        F.sum("conv_t").over(wc).cast("long").alias("cct"),
        F.sum("conv_c").over(wc).cast("long").alias("ccc"),
    )
    return cum.select(
        "decile",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.round(
            F.col("conv_t") * F.lit(1.0) / F.nullif(F.col("n_t"), F.lit(0))
            - F.col("conv_c") * F.lit(1.0) / F.nullif(F.col("n_c"), F.lit(0)),
            6,
        ).alias("uplift"),
        F.round(
            F.col("cct")
            - F.col("ccc")
            * F.lit(1.0)
            * F.col("cnt")
            / F.nullif(F.col("cnc"), F.lit(0)),
            4,
        ).alias("qini"),
    ).orderBy(F.desc("decile"))


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
# q345: instrumental-variable (Wald) estimator (round 8)
# ---------------------------------------------------------------------------

# The encouragement-design readout completing the causal family (q248
# DiD, q283 CUPED, q282 QTE, q204 matching): when treatment uptake is
# endogenous, the Wald/IV estimate is ITT / first-stage =
# (E[y|z=1]-E[y|z=0]) / (E[t|z=1]-E[t|z=0]).  Fixture construction:
# z is the shared id-hash arm (a genuinely random instrument) and
# compliance is CONSTRUCTED — the encouraged arm "adopts" at a lower
# post-period activity bar (t = qc >= 34 if z else qc >= 38), the
# standard way to witness IV mechanics on data with no natural
# experiment: the first stage is real (the share of users between the
# two bars), the exclusion restriction holds exactly (y never reads
# z), and the true effect is 0 — so the honest answer is wald ~ 0
# with a STABLE denominator, not a weak-instrument blow-up (the first
# draft used above-median pre-activity as z; measured first stage at
# sf0.01 was 0.02 — a textbook weak instrument, replaced).  Integer
# power sums to a 2-row arm frame; zero first-stage NULLIF-guarded.
_Q345_SPLIT_DAY = 14
_Q345_T_ENC = 34  # adoption bar for the encouraged arm
_Q345_T_CTL = 38  # adoption bar for the control arm

_Q345_SQL = f"""
WITH e AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
post AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS qc,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)
              AS BIGINT) AS y
  FROM e WHERE d >= {_Q345_SPLIT_DAY} GROUP BY user_id
),
u AS (
  SELECT CASE WHEN ((us.user_id % 2147483648) * 2654435761) % 100 >= 50
              THEN 1 ELSE 0 END AS z,
         COALESCE(po.qc, 0) AS qc, COALESCE(po.y, 0) AS y
  FROM (SELECT DISTINCT user_id FROM e) us
  LEFT JOIN post po ON po.user_id = us.user_id
),
t AS (
  SELECT z,
         CAST(qc >= CASE WHEN z = 1 THEN {_Q345_T_ENC}
                         ELSE {_Q345_T_CTL} END AS BIGINT) AS t,
         y
  FROM u
),
g AS (
  SELECT z, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS nt, CAST(SUM(y) AS BIGINT) AS sy
  FROM t GROUP BY z
),
w AS (
  SELECT (SELECT n FROM g WHERE z = 1) AS n1,
         (SELECT n FROM g WHERE z = 0) AS n0,
         (SELECT nt * 1.0 / n FROM g WHERE z = 1) AS t1,
         (SELECT nt * 1.0 / n FROM g WHERE z = 0) AS t0,
         (SELECT sy * 1.0 / n FROM g WHERE z = 1) AS y1,
         (SELECT sy * 1.0 / n FROM g WHERE z = 0) AS y0
)
SELECT n1, n0,
       ROUND(t1, 6) AS t_rate_z1, ROUND(t0, 6) AS t_rate_z0,
       ROUND(y1 / 100, 4) AS y_mean_z1, ROUND(y0 / 100, 4) AS y_mean_z0,
       ROUND((y1 - y0) / 100, 4) AS itt_dollars,
       ROUND(t1 - t0, 6) AS first_stage,
       ROUND((y1 - y0) / NULLIF(t1 - t0, 0.0) / 100, 4) AS wald_dollars
FROM w
"""


@register(
    "q345_iv_wald",
    _Q345_SQL,
    doc=(
        "instrumental-variable (Wald) estimator — the encouragement-"
        "design readout completing the causal family (q248 DiD, q283 "
        "CUPED, q282 QTE, q204 matching): ITT / first-stage with the "
        "shared id-hash arm as a genuinely random instrument and "
        "CONSTRUCTED compliance (the encouraged arm adopts at post-"
        f"activity >= {_Q345_T_ENC}, control at >= {_Q345_T_CTL} — "
        "the share of users between the bars IS the first stage, so "
        "the denominator is stable by design; the first draft's "
        "above-median-activity instrument measured a 0.02 first "
        "stage at sf0.01, the textbook weak-instrument failure, and "
        "was replaced).  Exclusion holds exactly (y never reads z) "
        "and the true effect is 0, so the honest answer is wald ~ 0.  "
        "Integer power sums to a 2-row arm frame; zero first stage "
        "NULLIF-guarded"
    ),
    tables=("events",),
)
def q345(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.iterutils import (
        truncate_lineage,
    )
    from osm_changesets_to_parquet_spark.operators.quality import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    post = (
        e.where(F.col("d") >= _Q345_SPLIT_DAY)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("qc"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("cents")
                ).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
    )
    us = e.select("user_id").distinct()
    u = us.join(post, "user_id", "left").select(
        F.when(hash_bucket("user_id", 100) >= 50, 1).otherwise(0).alias("z"),
        F.coalesce(F.col("qc"), F.lit(0)).alias("qc"),
        F.coalesce(F.col("y"), F.lit(0)).alias("y"),
    )
    t = u.select(
        "z",
        (
            F.col("qc")
            >= F.when(F.col("z") == 1, _Q345_T_ENC).otherwise(_Q345_T_CTL)
        )
        .cast("long")
        .alias("t"),
        "y",
    )
    g = truncate_lineage(
        t.groupBy("z").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("t").cast("long").alias("nt"),
            F.sum("y").cast("long").alias("sy"),
        )
    )
    g1 = g.where(F.col("z") == 1).select(
        F.col("n").alias("n1"),
        (F.col("nt") * F.lit(1.0) / F.col("n")).alias("t1"),
        (F.col("sy") * F.lit(1.0) / F.col("n")).alias("y1"),
    )
    g0 = g.where(F.col("z") == 0).select(
        F.col("n").alias("n0"),
        (F.col("nt") * F.lit(1.0) / F.col("n")).alias("t0"),
        (F.col("sy") * F.lit(1.0) / F.col("n")).alias("y0"),
    )
    w = g1.crossJoin(F.broadcast(g0))
    return w.select(
        "n1",
        "n0",
        F.round("t1", 6).alias("t_rate_z1"),
        F.round("t0", 6).alias("t_rate_z0"),
        F.round(F.col("y1") / 100, 4).alias("y_mean_z1"),
        F.round(F.col("y0") / 100, 4).alias("y_mean_z0"),
        F.round((F.col("y1") - F.col("y0")) / 100, 4).alias("itt_dollars"),
        F.round(F.col("t1") - F.col("t0"), 6).alias("first_stage"),
        F.round(
            (F.col("y1") - F.col("y0"))
            / F.nullif(F.col("t1") - F.col("t0"), F.lit(0.0))
            / 100,
            4,
        ).alias("wald_dollars"),
    )


# ---------------------------------------------------------------------------
# q346: regression-discontinuity estimate at a price cutoff (round 8)
# ---------------------------------------------------------------------------

# The third identification strategy of the causal family (q248 DiD
# exploits time, q345 IV an instrument; RD exploits a THRESHOLD):
# local-linear fits on each side of the cutoff inside a fixed
# bandwidth, and the effect is the gap between the two intercepts at
# the cutoff (Thistlethwaite & Campbell 1960).  Running variable =
# order price cents (cutoff $250k, bandwidth $100k), outcome = the
# order's line-item count; each side's OLS intercept/slope is closed
# form over five integer power sums (n, Σu, Σu², Σy, Σuy with u the
# centered cents — map-side combinable; DOUBLE casts placed
# identically both engines since Σu² exceeds 2^53 at sf0.1).  Honest
# fixture answer: rd ~ 0 — the synthetic generator has no price
# discontinuity, which is exactly what the audit should report.
_Q346_CUT = 25_000_000
_Q346_BW = 10_000_000

_Q346_SIDE = """
  SELECT side, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(u) AS BIGINT) AS su,
         CAST(SUM(u * u) AS BIGINT) AS suu,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(u * y) AS BIGINT) AS suy
  FROM pts GROUP BY side
"""

_Q346_SQL = f"""
WITH o AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) - {_Q346_CUT} AS u
  FROM orders
),
cnt AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS y
  FROM lineitem GROUP BY l_orderkey
),
pts AS (
  SELECT CASE WHEN o.u >= 0 THEN 'right' ELSE 'left' END AS side,
         o.u, COALESCE(c.y, 0) AS y
  FROM o LEFT JOIN cnt c ON c.l_orderkey = o.o_orderkey
  WHERE o.u > -{_Q346_BW} AND o.u < {_Q346_BW}
),
s AS ({_Q346_SIDE}),
f AS (
  SELECT side, n,
         (CAST(sy AS DOUBLE) * CAST(suu AS DOUBLE)
          - CAST(su AS DOUBLE) * CAST(suy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
            - CAST(su AS DOUBLE) * CAST(su AS DOUBLE)) AS a,
         (CAST(n AS DOUBLE) * CAST(suy AS DOUBLE)
          - CAST(su AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
            - CAST(su AS DOUBLE) * CAST(su AS DOUBLE)) AS b
  FROM s
)
SELECT (SELECT n FROM f WHERE side = 'left') AS n_left,
       (SELECT n FROM f WHERE side = 'right') AS n_right,
       ROUND((SELECT a FROM f WHERE side = 'left'), 6) AS intercept_left,
       ROUND((SELECT a FROM f WHERE side = 'right'), 6) AS intercept_right,
       ROUND((SELECT b FROM f WHERE side = 'left') * 100000, 6)
         AS slope_left_per_1kusd,
       ROUND((SELECT b FROM f WHERE side = 'right') * 100000, 6)
         AS slope_right_per_1kusd,
       ROUND((SELECT a FROM f WHERE side = 'right')
             - (SELECT a FROM f WHERE side = 'left'), 6) AS rd_estimate
"""


@register(
    "q346_regression_discontinuity",
    _Q346_SQL,
    doc=(
        "regression-discontinuity estimate (Thistlethwaite & Campbell "
        "1960) at the $250k order-price cutoff, $100k bandwidth — the "
        "threshold identification strategy completing the causal "
        "family (q248 time, q345 instrument): per-side local-linear "
        "intercept/slope closed-form over five integer power sums "
        "(map-side combinable; DOUBLE casts placed identically both "
        "engines — Σu² exceeds 2^53 at sf0.1), effect = the intercept "
        "gap at the cutoff.  Honest fixture answer: rd ~ 0 (no "
        "generator discontinuity) — the audit reporting a clean null "
        "is the point"
    ),
    tables=("orders", "lineitem"),
)
def q346(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.iterutils import (
        truncate_lineage,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (
            F.round(F.col("o_totalprice") * 100).cast("long") - _Q346_CUT
        ).alias("u"),
    )
    cnt = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    pts = (
        o.join(cnt, o.o_orderkey == cnt.l_orderkey, "left")
        .where((F.col("u") > -_Q346_BW) & (F.col("u") < _Q346_BW))
        .select(
            F.when(F.col("u") >= 0, "right").otherwise("left").alias("side"),
            "u",
            F.coalesce(F.col("y"), F.lit(0)).alias("y"),
        )
    )
    s = truncate_lineage(
        pts.groupBy("side").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("u").cast("long").alias("su"),
            F.sum(F.col("u") * F.col("u")).cast("long").alias("suu"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("u") * F.col("y")).cast("long").alias("suy"),
        )
    )
    det = (
        F.col("n").cast("double") * F.col("suu").cast("double")
        - F.col("su").cast("double") * F.col("su").cast("double")
    )
    a = (
        F.col("sy").cast("double") * F.col("suu").cast("double")
        - F.col("su").cast("double") * F.col("suy").cast("double")
    ) / det
    b = (
        F.col("n").cast("double") * F.col("suy").cast("double")
        - F.col("su").cast("double") * F.col("sy").cast("double")
    ) / det
    f = s.select("side", "n", a.alias("a"), b.alias("b"))
    left = f.where(F.col("side") == "left").select(
        F.col("n").alias("n_left"),
        F.col("a").alias("al"),
        F.col("b").alias("bl"),
    )
    right = f.where(F.col("side") == "right").select(
        F.col("n").alias("n_right"),
        F.col("a").alias("ar"),
        F.col("b").alias("br"),
    )
    return left.crossJoin(F.broadcast(right)).select(
        "n_left",
        "n_right",
        F.round("al", 6).alias("intercept_left"),
        F.round("ar", 6).alias("intercept_right"),
        F.round(F.col("bl") * 100000, 6).alias("slope_left_per_1kusd"),
        F.round(F.col("br") * 100000, 6).alias("slope_right_per_1kusd"),
        F.round(F.col("ar") - F.col("al"), 6).alias("rd_estimate"),
    )


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


# ---------------------------------------------------------------------------
# q349: offline bandit replay — off-policy evaluation (round 8)
# ---------------------------------------------------------------------------

# The replay method (Li et al., WSDM 2011): evaluate a target policy
# on LOGGED interaction data by keeping exactly the events where the
# logged action coincides with what the policy would have chosen, and
# averaging their rewards — the unbiased off-policy readout when the
# logging policy is uniform-ish.  Target policy here is day-level
# greedy: on day d recommend the event type with the highest
# cumulative mean value through day d-1 (pure exploitation — the
# baseline every bandit paper compares against).  The corpus reduces
# to a (type, day) integer rollup; cumulative sums run over the
# ~30-row calendar frame per type; the per-day argmax is a
# ROW_NUMBER over the 5-type frame with (mean desc, type) total
# order — means are exact-integer cents/count ratios, identical
# doubles both engines.  Day 0 has no history and is excluded.
_Q349_SQL = """
WITH e AS (
  SELECT event_type AS a,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
daily AS (
  SELECT a, d, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
  FROM e GROUP BY a, d
),
grid AS (
  SELECT t.a, dd.d FROM (SELECT DISTINCT a FROM daily) t
  CROSS JOIN (SELECT DISTINCT d FROM daily) dd
),
cum AS (
  SELECT g.a, g.d,
         CAST(COALESCE(SUM(daily.n) OVER w, 0) AS BIGINT) AS cn,
         CAST(COALESCE(SUM(daily.s) OVER w, 0) AS BIGINT) AS cs
  FROM grid g LEFT JOIN daily ON daily.a = g.a AND daily.d = g.d
  WINDOW w AS (PARTITION BY g.a ORDER BY g.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
pick AS (
  SELECT d, a FROM (
    SELECT d, a,
           ROW_NUMBER() OVER (PARTITION BY d
                              ORDER BY cs * 1.0 / NULLIF(cn, 0) DESC
                                       NULLS LAST, a) AS rn
    FROM cum WHERE cn > 0 OR d > 0
  ) WHERE rn = 1
),
matched AS (
  SELECT e.cents FROM e JOIN pick ON pick.d = e.d AND pick.a = e.a
  WHERE e.d > 0
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
         CAST(SUM(cents) AS BIGINT) AS s_all
  FROM e WHERE d > 0
)
SELECT (SELECT CAST(COUNT(DISTINCT d) AS BIGINT) FROM pick WHERE d > 0)
         AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_matched,
       ROUND(COUNT(*) * 1.0 / (SELECT n_all FROM tot), 6) AS match_rate,
       ROUND(SUM(cents) * 1.0 / COUNT(*) / 100, 4) AS replay_value,
       ROUND((SELECT s_all * 1.0 / n_all FROM tot) / 100, 4)
         AS logged_value
FROM matched
"""


@register(
    "q349_bandit_replay",
    _Q349_SQL,
    doc=(
        "offline bandit replay (Li et al. 2011) — off-policy "
        "evaluation joining the experimentation family from the "
        "COUNTERFACTUAL side: the day-level greedy policy (recommend "
        "the type with the best cumulative mean value through "
        "yesterday) is scored by keeping exactly the logged events "
        "it would have chosen and averaging their rewards, vs the "
        "logged average.  One (type, day) integer rollup, cumulative "
        "windows over the ~30-row calendar frame, per-day argmax on "
        "the 5-type frame with a (mean desc, type) total order — "
        "means are exact cents/count ratios, identical doubles both "
        "engines; day 0 (no history) excluded"
    ),
    tables=("events",),
)
def q349(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.iterutils import (
        truncate_lineage,
    )

    ev = load_table(spark, sf_dir, "events")
    e = truncate_lineage(
        ev.select(
            F.col("event_type").alias("a"),
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    daily = e.groupBy("a", "d").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    grid = daily.select("a").distinct().crossJoin(
        daily.select("d").distinct()
    )
    wprev = (
        Window.partitionBy("a")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        grid.join(daily, ["a", "d"], "left")
        .select(
            "a",
            "d",
            F.coalesce(F.sum("n").over(wprev), F.lit(0))
            .cast("long")
            .alias("cn"),
            F.coalesce(F.sum("s").over(wprev), F.lit(0))
            .cast("long")
            .alias("cs"),
        )
    )
    wpick = Window.partitionBy("d").orderBy(
        (F.col("cs") * F.lit(1.0) / F.nullif(F.col("cn"), F.lit(0)))
        .desc_nulls_last(),
        "a",
    )
    pick = (
        cum.where((F.col("cn") > 0) | (F.col("d") > 0))
        .withColumn("rn", F.row_number().over(wpick))
        .where(F.col("rn") == 1)
        .select("d", "a")
    )
    pick = truncate_lineage(pick)
    matched = e.where(F.col("d") > 0).join(pick, ["d", "a"])
    tot = e.where(F.col("d") > 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum("cents").cast("long").alias("s_all"),
    )
    nd = pick.where(F.col("d") > 0).agg(
        F.countDistinct("d").cast("long").alias("n_days")
    )
    return (
        matched.agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum("cents").cast("long").alias("s_m"),
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nd))
        .select(
            "n_days",
            "n_matched",
            F.round(
                F.col("n_matched") * F.lit(1.0) / F.col("n_all"), 6
            ).alias("match_rate"),
            F.round(
                F.col("s_m") * F.lit(1.0) / F.col("n_matched") / 100, 4
            ).alias("replay_value"),
            F.round(
                F.col("s_all") * F.lit(1.0) / F.col("n_all") / 100, 4
            ).alias("logged_value"),
        )
    )


# ---------------------------------------------------------------------------
# q350: Holt-Winters additive seasonal smoothing (round 8)
# ---------------------------------------------------------------------------

# Triple exponential smoothing (Winters 1960) completing the
# forecasting family: q236 tracks level+trend, q259 decomposes the
# weekly cycle, q321 backtests — this FITS level + trend + a 7-slot
# additive seasonal state and forecasts with it.  The q236 execution
# contract: the inherently sequential recursion runs per key inside
# ONE applyInPandas over the ~30-row daily rollup (the fact table
# reduces first), the oracle mirrors it as a recursive CTE carrying
# the rotating 7-slot seasonal queue as columns; alpha = beta =
# gamma = 1/2 keeps every smoothing op dyadic so both engines walk
# the identical IEEE sequence.  Textbook init (Hyndman): l0 = week-1
# mean, b0 = (week-2 mean - week-1 mean)/7, s_i = y_i - l0, recursion
# from t = 8; types need >= 14 observations (the fixtures' ~30
# qualify at every sf).
_Q350_SQL = """
WITH RECURSIVE daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
  FROM daily
),
nn AS (
  SELECT event_type, CAST(MAX(rn) AS BIGINT) AS n FROM idx GROUP BY 1
  HAVING MAX(rn) >= 14
),
wk AS (
  SELECT i1.event_type,
         (((((i1.y + i2.y) + i3.y) + i4.y) + i5.y) + i6.y) + i7.y AS w1,
         (((((i8.y + i9.y) + i10.y) + i11.y) + i12.y) + i13.y) + i14.y
           AS w2,
         i1.y AS y1, i2.y AS y2, i3.y AS y3, i4.y AS y4,
         i5.y AS y5, i6.y AS y6, i7.y AS y7
  FROM idx i1
  JOIN idx i2 ON i2.event_type = i1.event_type AND i2.rn = 2
  JOIN idx i3 ON i3.event_type = i1.event_type AND i3.rn = 3
  JOIN idx i4 ON i4.event_type = i1.event_type AND i4.rn = 4
  JOIN idx i5 ON i5.event_type = i1.event_type AND i5.rn = 5
  JOIN idx i6 ON i6.event_type = i1.event_type AND i6.rn = 6
  JOIN idx i7 ON i7.event_type = i1.event_type AND i7.rn = 7
  JOIN idx i8 ON i8.event_type = i1.event_type AND i8.rn = 8
  JOIN idx i9 ON i9.event_type = i1.event_type AND i9.rn = 9
  JOIN idx i10 ON i10.event_type = i1.event_type AND i10.rn = 10
  JOIN idx i11 ON i11.event_type = i1.event_type AND i11.rn = 11
  JOIN idx i12 ON i12.event_type = i1.event_type AND i12.rn = 12
  JOIN idx i13 ON i13.event_type = i1.event_type AND i13.rn = 13
  JOIN idx i14 ON i14.event_type = i1.event_type AND i14.rn = 14
  WHERE i1.rn = 1 AND i1.event_type IN (SELECT event_type FROM nn)
),
init AS (
  SELECT event_type, w1 / 7 AS l, (w2 / 7 - w1 / 7) / 7 AS b,
         y1 - w1 / 7 AS s1, y2 - w1 / 7 AS s2, y3 - w1 / 7 AS s3,
         y4 - w1 / 7 AS s4, y5 - w1 / 7 AS s5, y6 - w1 / 7 AS s6,
         y7 - w1 / 7 AS s7
  FROM wk
),
r(event_type, t, l, b, s1, s2, s3, s4, s5, s6, s7) AS (
  SELECT event_type, 7, l, b, s1, s2, s3, s4, s5, s6, s7 FROM init
  UNION ALL
  SELECT r.event_type, r.t + 1,
         0.5 * (d.y - r.s1) + 0.5 * (r.l + r.b),
         0.5 * ((0.5 * (d.y - r.s1) + 0.5 * (r.l + r.b)) - r.l)
           + 0.5 * r.b,
         r.s2, r.s3, r.s4, r.s5, r.s6, r.s7,
         0.5 * (d.y - (0.5 * (d.y - r.s1) + 0.5 * (r.l + r.b)))
           + 0.5 * r.s1
  FROM r JOIN idx d ON d.event_type = r.event_type AND d.rn = r.t + 1
)
SELECT r.event_type, nn.n AS n_days,
       ROUND(r.l, 4) AS level,
       ROUND(r.b, 4) AS trend,
       ROUND(r.l + r.b + r.s1, 4) AS forecast_next,
       ROUND(7 * r.l + 28 * r.b
             + ((((((r.s1 + r.s2) + r.s3) + r.s4) + r.s5) + r.s6)
                + r.s7), 4) AS forecast_7d_total
FROM r JOIN nn ON nn.event_type = r.event_type AND r.t = nn.n
ORDER BY r.event_type
"""


@register(
    "q350_holt_winters",
    _Q350_SQL,
    doc=(
        "Holt-Winters additive triple exponential smoothing (Winters "
        "1960, period 7) completing the forecasting family — q236 "
        "tracks level+trend, q259 decomposes the weekly cycle, q321 "
        "backtests, this FITS the seasonal state and forecasts with "
        "it: the sequential recursion runs per key in ONE "
        "applyInPandas over the ~30-row daily rollup (q236's "
        "contract; the Python stage sees kilobytes), the oracle "
        "mirrors it as a recursive CTE carrying the rotating 7-slot "
        "seasonal queue as columns; alpha=beta=gamma=1/2 keeps every "
        "op dyadic — identical IEEE walks both engines.  Textbook "
        "init (week-1 mean level, week-over-week trend, y_i - l0 "
        "seasonals), recursion from t=8, types need >= 14 days"
    ),
    tables=("events",),
)
def q350(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        ys = list(pdf.y)
        n = len(ys)
        if n < 14:
            return pd.DataFrame(
                columns=[
                    "event_type",
                    "n_days",
                    "level",
                    "trend",
                    "forecast_next",
                    "forecast_7d_total",
                ]
            )
        w1 = (((((ys[0] + ys[1]) + ys[2]) + ys[3]) + ys[4]) + ys[5]) + ys[6]
        w2 = (
            ((((ys[7] + ys[8]) + ys[9]) + ys[10]) + ys[11]) + ys[12]
        ) + ys[13]
        l = w1 / 7
        b = (w2 / 7 - w1 / 7) / 7
        s = [ys[i] - w1 / 7 for i in range(7)]
        for t in range(7, n):
            y = ys[t]
            l_new = 0.5 * (y - s[0]) + 0.5 * (l + b)
            b_new = 0.5 * (l_new - l) + 0.5 * b
            s_new = 0.5 * (y - l_new) + 0.5 * s[0]
            s = s[1:] + [s_new]
            l, b = l_new, b_new
        f1 = l + b + s[0]
        f7 = 7 * l + 28 * b + (
            (((((s[0] + s[1]) + s[2]) + s[3]) + s[4]) + s[5]) + s[6]
        )
        return pd.DataFrame(
            {
                "event_type": [pdf.event_type.iloc[0]],
                "n_days": [n],
                "level": [l],
                "trend": [b],
                "forecast_next": [f1],
                "forecast_7d_total": [f7],
            }
        )

    schema = (
        "event_type string, n_days long, level double, trend double, "
        "forecast_next double, forecast_7d_total double"
    )
    out = daily.groupBy("event_type").applyInPandas(fit, schema)
    return out.select(
        "event_type",
        "n_days",
        F.round("level", 4).alias("level"),
        F.round("trend", 4).alias("trend"),
        F.round("forecast_next", 4).alias("forecast_next"),
        F.round("forecast_7d_total", 4).alias("forecast_7d_total"),
    ).orderBy("event_type")
