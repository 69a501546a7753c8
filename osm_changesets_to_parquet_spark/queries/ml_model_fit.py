"""Model fitting as relational plans: NB, stumps, IRLS, EM, boosting.

The fitting half of the model family (round-10 regrouping; mechanical
relocation, zero behavior change — pre/post registry hash dump):
naive Bayes (q235), decision-stump splits (q303), logistic regression
via IRLS rounds (q311), GMM EM rounds (q334), and AdaBoost over
stumps (q344).  Every iterative fit unrolls a FIXED round count as
chained CTEs/DataFrame stages over bounded sufficient statistics
(per-class counts, per-bin moments, K-row parameter tables) — the
training data is scanned per round but never collected; oracles
replay the identical arithmetic so every fitted parameter is
hash-matched.
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
