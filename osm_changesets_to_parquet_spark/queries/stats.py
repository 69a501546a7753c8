"""Round-7 statistical / sampling / retrieval-infra queries (q206+).

House rules (SURVEY §2.B determinism discipline): every float output
is ROUND()ed on the same double both sides; integer arithmetic is
exact and engine-identical (the operators/quality.py Knuth-hash
authority); every result has a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.catalog import load_table
from osm_changesets_to_parquet_spark.operators.quality import (
    hash_bucket,
    sql_hash_bucket,
)
from osm_changesets_to_parquet_spark.queries import register

# ---------------------------------------------------------------------------
# q206: stratified sampling — per-stratum rates in one pushable predicate
# ---------------------------------------------------------------------------

# sampling percentage per event_type stratum: rare strata kept at a
# higher rate (the class-rebalancing shape of training-data curation)
_Q206_RATES = {"click": 5, "error": 10, "purchase": 50, "signup": 20, "view": 2}

_Q206_SQL = f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(SUM(value), 2) AS sum_value
FROM events
WHERE {sql_hash_bucket("event_id", 100)} < CASE event_type
  {" ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_Q206_RATES.items()))}
  ELSE 0 END
GROUP BY event_type ORDER BY event_type
"""


@register(
    "q206_stratified_sample",
    _Q206_SQL,
    doc=(
        "stratified sampling with per-stratum rates (the class-"
        "rebalancing draw of training-data curation: rare classes kept "
        "at higher rates): membership is ONE row-local predicate — "
        "deterministic id-hash bucket < rate[stratum] via a literal "
        "CASE map — so the sample is a pushable scan filter with no "
        "shuffle, no per-partition RNG seed drift, and stability under "
        "appends/repartitioning (the q69 contract, stratified)"
    ),
    tables=("events",),
)
def q206(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    rate = None
    for k, v in sorted(_Q206_RATES.items()):
        rate = (
            F.when(F.col("event_type") == k, F.lit(v))
            if rate is None
            else rate.when(F.col("event_type") == k, F.lit(v))
        )
    rate = rate.otherwise(F.lit(0))
    return (
        ev.where(hash_bucket("event_id", 100) < rate)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q207: fixed-k uniform "reservoir" sample as bottom-k-by-hash
# ---------------------------------------------------------------------------

_Q207_K = 20

_Q207_SQL = f"""
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars FROM documents
  ORDER BY {sql_hash_bucket("doc_id", 1000000007)}, doc_id
  LIMIT {_Q207_K}
) ORDER BY doc_id
"""


@register(
    "q207_reservoir_sample",
    _Q207_SQL,
    doc=(
        "fixed-size uniform sample (the distributed reservoir-sampling "
        "use case) spelled as bottom-k by deterministic id hash — "
        "executes as TakeOrderedAndProject (per-partition k-heap + "
        "O(k) driver merge, NEVER a global sort), is exactly "
        "reproducible across runs/engines unlike an actual reservoir "
        "(whose result depends on encounter order), and at 100 TB "
        "costs one scan with k rows per partition in flight; the "
        "operators/anchors.py fixed_k_anchors discipline as a "
        "user-facing sampler"
    ),
    tables=("documents",),
)
def q207(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "lang", "n_chars")
        .orderBy(hash_bucket("doc_id", 1_000_000_007), F.col("doc_id"))
        .limit(_Q207_K)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q209: per-user behavioral entropy (session diversity profile)
# ---------------------------------------------------------------------------

@register(
    "q209_session_entropy",
    """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
),
t AS (SELECT user_id, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY user_id)
SELECT c.user_id, ANY_VALUE(t.tot) AS n_events,
       ROUND(SUM(-(c.n * 1.0 / t.tot) * log2(c.n * 1.0 / t.tot)), 4) AS entropy
FROM c JOIN t ON c.user_id = t.user_id
GROUP BY c.user_id ORDER BY c.user_id
""",
    doc=(
        "per-user Shannon entropy of the event-type mix (bot/anomaly "
        "screening: near-zero entropy = single-action automation, "
        "high = organic browsing): two keyed aggregations — "
        "(user, type) counts, then the per-user -Σ p·log2 p fold — "
        "both with map-side partials; the shuffle carries one row per "
        "(user, observed type), bounded by users x |type vocabulary|, "
        "never the event stream"
    ),
    tables=("events",),
)
def q209(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    return (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(
            F.first("tot").cast("long").alias("n_events"),
            F.round(F.sum(-p * F.log2(p)), 4).alias("entropy"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q215: winsorized statistics (robust per-segment spend profile)
# ---------------------------------------------------------------------------

_Q215_SQL = """
WITH p AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.05) AS p05,
         quantile_cont(o_totalprice, 0.95) AS p95
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(ANY_VALUE(p.p05), 2) AS p05,
       ROUND(ANY_VALUE(p.p95), 2) AS p95,
       ROUND(AVG(LEAST(GREATEST(o.o_totalprice, p.p05), p.p95)), 2)
         AS winsorized_mean,
       ROUND(AVG(o.o_totalprice), 2) AS raw_mean
FROM orders o JOIN p ON o.o_orderpriority = p.o_orderpriority
GROUP BY o.o_orderpriority ORDER BY priority
"""


@register(
    "q215_winsorized_stats",
    _Q215_SQL,
    doc=(
        "winsorized (5%/95%-clamped) mean per order priority — the "
        "outlier-robust spend profile: pass 1 computes EXACT "
        "interpolated percentiles per group (F.percentile == "
        "quantile_cont, the q09 contract), pass 2 broadcast-joins the "
        "|groups|-row threshold frame back and folds the clamped "
        "mean — the fact table is scanned twice but shuffled only as "
        "map-side-partial aggregates on the group key"
    ),
    tables=("orders",),
)
def q215(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    p = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("p05"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
    )
    clamped = F.least(F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95"))
    return (
        o.join(F.broadcast(p), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("p05"), 2).alias("p05"),
            F.round(F.first("p95"), 2).alias("p95"),
            F.round(F.avg(clamped), 2).alias("winsorized_mean"),
            F.round(F.avg("o_totalprice"), 2).alias("raw_mean"),
        )
        .select(
            F.col("o_orderpriority").alias("priority"),
            "n",
            "p05",
            "p95",
            "winsorized_mean",
            "raw_mean",
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# q216: Bloom-filter-pruned anti-join (sketch-gated blocklist filtering)
# ---------------------------------------------------------------------------

_Q216_M = 4096  # bits
# second multiplicative constant: xxhash32's prime-2 (public), giving an
# independent-enough second hash over the same 31-bit-folded id
_Q216_C2 = 2246822519
_Q216_H1 = sql_hash_bucket("o_custkey", _Q216_M)
_Q216_H2 = f"(((o_custkey) % 2147483648) * {_Q216_C2}) % {_Q216_M}"
_Q216_B1 = sql_hash_bucket("c_custkey", _Q216_M)
_Q216_B2 = f"(((c_custkey) % 2147483648) * {_Q216_C2}) % {_Q216_M}"

_Q216_SQL = f"""
WITH block AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
bits AS (
  SELECT DISTINCT b FROM (
    SELECT {_Q216_B1} AS b FROM block
    UNION ALL SELECT {_Q216_B2} AS b FROM block
  )
),
o AS (SELECT o_orderkey, o_custkey FROM orders),
pass AS (
  SELECT * FROM o
  WHERE {_Q216_H1} IN (SELECT b FROM bits)
    AND {_Q216_H2} IN (SELECT b FROM bits)
),
hit AS (SELECT * FROM pass WHERE o_custkey IN (SELECT c_custkey FROM block))
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM o) AS n_orders,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM pass) AS bloom_pass,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS exact_blocked,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM pass)
         - (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS false_positives
"""


@register(
    "q216_bloom_antijoin",
    _Q216_SQL,
    doc=(
        "Bloom-filter-gated blocklist join (Bloom 1970 — the runtime-"
        "filter technique Spark itself applies as an opt-in rule): the "
        "blocklist's k=2 deterministic hash bits (m=4096) form a tiny "
        "DISTINCT frame that BROADCASTs; the fact side is pre-filtered "
        "by two broadcast semi-joins on row-local bit positions — no "
        "false negatives by construction, so the exact membership join "
        "only runs on the bloom-positive remnant (at 100 TB: the "
        "shuffle-free sketch absorbs ~bitload/m of the corpus, and "
        "false_positives REPORTS the sketch's realized error instead "
        "of hiding it); all arithmetic is 31-bit-folded integer "
        "multiplies — engine-exact"
    ),
    tables=("customer", "orders"),
)
def q216(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    block = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    h2 = lambda c: ((F.col(c) % F.lit(1 << 31)) * F.lit(_Q216_C2)) % F.lit(_Q216_M)
    bits = (
        block.select(hash_bucket("c_custkey", _Q216_M).alias("b"))
        .unionAll(block.select(h2("c_custkey").alias("b")))
        .distinct()
    )
    o = orders.select("o_orderkey", "o_custkey")
    passed = o.join(
        F.broadcast(bits), hash_bucket("o_custkey", _Q216_M) == F.col("b"), "semi"
    ).join(F.broadcast(bits), h2("o_custkey") == F.col("b"), "semi")
    hit = passed.join(
        F.broadcast(block), F.col("o_custkey") == F.col("c_custkey"), "semi"
    )
    counts = (
        o.agg(F.count(F.lit(1)).alias("n_orders"))
        .crossJoin(passed.agg(F.count(F.lit(1)).alias("bloom_pass")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("exact_blocked")))
    )
    return counts.select(
        "n_orders",
        "bloom_pass",
        "exact_blocked",
        (F.col("bloom_pass") - F.col("exact_blocked")).alias("false_positives"),
    )


# ---------------------------------------------------------------------------
# q210: bipartite co-occurrence projection (parts co-purchased in an order)
# ---------------------------------------------------------------------------

_Q210_K = 20

_Q210_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT p1, p2, CAST(COUNT(*) AS BIGINT) AS n_co_orders
FROM pairs GROUP BY p1, p2
ORDER BY n_co_orders DESC, p1, p2 LIMIT {_Q210_K}
"""


@register(
    "q210_bipartite_projection",
    _Q210_SQL,
    doc=(
        "bipartite graph projection (order-part incidence -> part-part "
        "co-purchase edges, the item-item collaborative-filtering "
        "precompute): DISTINCT incidence first, then a SELF-equi-join "
        "keyed on the order — pair volume is Σ k_i² over per-order "
        "basket sizes (bounded: ~4-13 lines/order), NOT |lineitem|², "
        "and the join shuffles on l_orderkey so each basket's pairs "
        "materialize on one task; top-k is TakeOrderedAndProject.  At "
        "100 TB the guard is the basket-size cap (a pathological "
        "mega-basket is the q133 skew-profile case first)"
    ),
    tables=("lineitem",),
)
def q210(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p1"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p2"))
    return (
        a.join(b, "k")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_co_orders"))
        .orderBy(F.col("n_co_orders").desc(), "p1", "p2")
        .limit(_Q210_K)
    )


# ---------------------------------------------------------------------------
# q212: Theil–Sen robust trend slope per event type
# ---------------------------------------------------------------------------

_Q212_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
         ROUND(SUM(value), 2) AS v
  FROM events GROUP BY 1, 2
),
slopes AS (
  SELECT a.event_type, (b.v - a.v) / (b.d - a.d) AS s
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
)
SELECT event_type,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM daily d
        WHERE d.event_type = slopes.event_type) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(quantile_cont(s, 0.5), 4) AS theil_sen_slope
FROM slopes GROUP BY event_type ORDER BY event_type
"""


@register(
    "q212_theil_sen",
    _Q212_SQL,
    doc=(
        "Theil–Sen robust trend estimator (median of all pairwise "
        "slopes — 29% outlier breakdown vs OLS's zero) per event type "
        "over DAILY rollups: the corpus-sized work is one keyed "
        "aggregate to (type, day, 2dp-rounded sum); the O(days²) pair "
        "set is built IN-ROW from the collected per-type day array "
        "(bounded by the calendar, ~30 elements — never a corpus "
        "self-join), exploded, and reduced by the exact interpolated "
        "median (F.percentile == quantile_cont).  Rounding the daily "
        "sums FIRST makes every slope the same double in both engines"
    ),
    tables=("events",),
)
def q212(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    arr = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("d", "v"))).alias("a")
    )
    # in-row pairwise slopes: for element i, slopes against every later
    # element — flatten(transform-with-index + slice)
    slopes = F.flatten(
        F.transform(
            "a",
            lambda x, i: F.transform(
                F.slice(F.col("a"), i + 2, F.size("a")),
                lambda y: (y["v"] - x["v"]) / (y["d"] - x["d"]),
            ),
        )
    )
    per = arr.select(
        "event_type",
        F.size("a").cast("long").alias("n_days"),
        F.explode(slopes).alias("s"),
    )
    return (
        per.groupBy("event_type")
        .agg(
            F.first("n_days").alias("n_days"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.percentile("s", F.lit(0.5)), 4).alias("theil_sen_slope"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q213: Mann–Whitney U test (click vs error value distributions)
# ---------------------------------------------------------------------------

_Q213_A, _Q213_B = "click", "error"

_Q213_SQL = f"""
WITH e AS (
  SELECT value AS score, CAST(event_type = '{_Q213_A}' AS BIGINT) AS g1
  FROM events WHERE event_type IN ('{_Q213_A}', '{_Q213_B}')
),
s AS (SELECT score, COUNT(*) AS cnt, SUM(g1) AS n1s FROM e GROUP BY score),
c AS (
  SELECT score, cnt, n1s,
         COALESCE(SUM(cnt) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM s
),
t AS (
  SELECT SUM(n1s * (below + (cnt + 1) / 2.0)) AS r1,
         CAST(SUM(n1s) AS BIGINT) AS n1,
         CAST(SUM(cnt - n1s) AS BIGINT) AS n2,
         SUM(CASE WHEN cnt > 1 THEN cnt*cnt*cnt - cnt ELSE 0 END) AS ties
  FROM c
)
SELECT n1, n2,
       ROUND(r1 - n1 * (n1 + 1) / 2.0, 1) AS u1,
       ROUND((r1 - n1 * (n1 + 1) / 2.0 - n1 * CAST(n2 AS DOUBLE) / 2.0)
             / SQRT(n1 * CAST(n2 AS DOUBLE) / 12.0
                    * ((n1 + n2 + 1) - ties / (CAST(n1 + n2 AS DOUBLE)
                                               * (n1 + n2 - 1)))), 4) AS z
FROM t
"""


@register(
    "q213_mann_whitney",
    _Q213_SQL,
    doc=(
        "Mann–Whitney U test (nonparametric two-sample location test) "
        "between click and error value distributions, with exact "
        "tie-averaged ranks and the tie-corrected normal "
        "approximation: the q172 discipline — scores reduce to "
        "per-distinct-score (cnt, group-1 count) first, the "
        "strictly-below prefix comes from the range-bucketed "
        "global_cumsum (never a single-task window), and rank sums "
        "are exact .5-increment doubles so U is engine-exact; only "
        "the final z divides/roots"
    ),
    tables=("events",),
)
def q213(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.packing import global_cumsum

    ev = load_table(spark, sf_dir, "events")
    e = ev.where(F.col("event_type").isin(_Q213_A, _Q213_B)).select(
        F.col("value").alias("score"),
        (F.col("event_type") == _Q213_A).cast("long").alias("g1"),
    )
    s = e.groupBy("score").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("g1").alias("n1s")
    )
    c = global_cumsum(
        s, "score", "cnt", out_col="below", exclusive=True,
        bounds=[16.0 * i for i in range(1, 32)],
    )
    t = c.agg(
        F.sum(
            F.col("n1s") * (F.col("below") + (F.col("cnt") + F.lit(1)) / F.lit(2.0))
        ).alias("r1"),
        F.sum("n1s").cast("long").alias("n1"),
        F.sum(F.col("cnt") - F.col("n1s")).cast("long").alias("n2"),
        F.sum(
            F.when(
                F.col("cnt") > 1,
                F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"),
            ).otherwise(F.lit(0))
        ).alias("ties"),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + F.lit(1)) / F.lit(2.0)
    n = F.col("n1") + F.col("n2")
    sigma = F.sqrt(
        F.col("n1") * F.col("n2").cast("double") / F.lit(12.0)
        * ((n + F.lit(1)) - F.col("ties") / (n.cast("double") * (n - F.lit(1))))
    )
    return t.select(
        "n1",
        "n2",
        F.round(u1, 1).alias("u1"),
        F.round(
            (u1 - F.col("n1") * F.col("n2").cast("double") / F.lit(2.0)) / sigma, 4
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# q214: chi-squared term/label association (feature selection)
# ---------------------------------------------------------------------------

_Q214_DF_TOP = 50
_Q214_OUT = 10

_Q214_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tk AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
lab AS (SELECT doc_id, CAST(lang = 'en' AS BIGINT) AS en FROM documents),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(en) AS BIGINT) AS n_en FROM lab),
df AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
         CAST(SUM(lab.en) AS BIGINT) AS a
  FROM tk JOIN lab USING (doc_id) GROUP BY tok
),
top AS (SELECT * FROM df ORDER BY df DESC, tok LIMIT {_Q214_DF_TOP}),
x AS (
  SELECT tok, df, a, df - a AS b, n_en - a AS c,
         n_docs - n_en - (df - a) AS d, n_docs
  FROM top, tot
)
SELECT tok, df, CAST(a AS BIGINT) AS n_term_en,
       ROUND(n_docs * CAST(a*d - b*c AS DOUBLE) * CAST(a*d - b*c AS DOUBLE)
             / NULLIF(CAST((a+b) AS DOUBLE) * (c+d) * (a+c) * (b+d), 0.0),
             4) AS chi2
FROM x
ORDER BY chi2 DESC NULLS LAST, tok LIMIT {_Q214_OUT}
"""


@register(
    "q214_chi2_feature_select",
    _Q214_SQL,
    doc=(
        "chi-squared term-vs-label feature selection (the classic "
        "text-classification feature ranker): distinct (doc, term) "
        "incidence -> one term-keyed aggregate joined with the "
        "broadcast per-doc label -> contingency cells A/B/C/D from "
        "integer counts and the 2x2 chi2 formula — all counts are "
        "engine-exact integers, the float formula is spelled "
        "identically both sides (CAST the AD-BC difference to DOUBLE "
        "before squaring: HUGEINT/overflow-proof), zero denominators "
        "NULLIF-guarded (ANSI Spark throws on double x/0); "
        "vocabulary-keyed shuffles only, top-df prefilter is "
        "TakeOrderedAndProject"
    ),
    tables=("documents",),
)
def q214(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )
    lab = docs.select("doc_id", (F.col("lang") == "en").cast("long").alias("en"))
    tot = lab.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("en").alias("n_en")
    )
    df = (
        tk.join(lab, "doc_id")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("en").alias("a"))
    )
    top = df.orderBy(F.col("df").desc(), "tok").limit(_Q214_DF_TOP)
    x = top.crossJoin(F.broadcast(tot)).select(
        "tok",
        "df",
        "a",
        (F.col("df") - F.col("a")).alias("b"),
        (F.col("n_en") - F.col("a")).alias("c"),
        (F.col("n_docs") - F.col("n_en") - (F.col("df") - F.col("a"))).alias("d"),
        "n_docs",
    )
    diff = (F.col("a") * F.col("d") - F.col("b") * F.col("c")).cast("double")
    denom = F.nullif(
        (F.col("a") + F.col("b")).cast("double")
        * (F.col("c") + F.col("d"))
        * (F.col("a") + F.col("c"))
        * (F.col("b") + F.col("d")),
        F.lit(0.0),
    )
    return x.select(
        "tok",
        "df",
        F.col("a").cast("long").alias("n_term_en"),
        F.round(F.col("n_docs") * diff * diff / denom, 4).alias("chi2"),
    ).orderBy(F.col("chi2").desc_nulls_last(), "tok").limit(_Q214_OUT)


# ---------------------------------------------------------------------------
# q217: recency-weighted engagement (exponential time-decay aggregate)
# ---------------------------------------------------------------------------

_Q217_HALFLIFE_DAYS = 7.0

_Q217_SQL = f"""
WITH m AS (SELECT MAX(epoch_us(ts)) AS mx FROM events),
w AS (
  SELECT event_type, value,
         POWER(0.5, (m.mx - epoch_us(ts)) / 86400000000.0
                    / {_Q217_HALFLIFE_DAYS}) AS wt
  FROM events, m
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(wt), 4) AS decayed_count,
       ROUND(SUM(wt * value) / SUM(wt), 4) AS decayed_mean_value
FROM w GROUP BY event_type ORDER BY event_type
"""


@register(
    "q217_recency_weighted_ctr",
    _Q217_SQL,
    doc=(
        "exponentially time-decayed engagement profile (halflife 7 "
        "days — the freshness weighting of ranking/CTR features): the "
        "global max timestamp is a 1-row broadcast scalar; every "
        "weight is row-local POWER(0.5, age/halflife) over integer "
        "epoch-micro age (the shared time domain), folded by one "
        "map-side-partial keyed aggregate — one scan, one tiny "
        "shuffle; the q83 EWMA discipline generalized to unordered "
        "decay"
    ),
    tables=("events",),
)
def q217(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = ev.agg(F.max("ts_us").alias("mx"))
    wt = F.pow(
        F.lit(0.5),
        (F.col("mx") - F.col("ts_us"))
        / F.lit(86400000000.0)
        / F.lit(_Q217_HALFLIFE_DAYS),
    )
    return (
        ev.crossJoin(F.broadcast(m))
        .select("event_type", "value", wt.alias("wt"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("wt"), 4).alias("decayed_count"),
            F.round(F.sum(F.col("wt") * F.col("value")) / F.sum("wt"), 4).alias(
                "decayed_mean_value"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q211: haversine radius join with lossless grid blocking
# ---------------------------------------------------------------------------
# Synthetic-but-deterministic coordinates derived from the keys (the
# cs10 geo-fixture recipe: exact multiples of 0.25, |lat| <= 70.25),
# spelled identically in both engines.  Distances are ROUND()ed to 6dp
# BEFORE any comparison/argmin: the lattice has mathematically
# equidistant pairs, and 6dp-rounding makes the tie EXPLICIT (broken by
# s_suppkey) instead of resting on cross-engine libm last-ulp agreement.

_Q211_RADIUS_KM = 500.0
_Q211_CELL_DEG = 5
# lossless neighbor envelope: dlat <= 500/111.19 = 4.5 deg (1 cell);
# dlon <= 4.5/cos(70.25 deg) = 13.3 deg (3 cells) — lats cap at 70.25
_Q211_LAT_OFF = (-1, 0, 1)
_Q211_LON_OFF = (-3, -2, -1, 0, 1, 2, 3)

_Q211_CLAT = "(((c_custkey * 7) % 140) - 70 + 0.25)"
_Q211_CLON = "(((c_custkey * 13) % 340) - 170 + 0.5)"
_Q211_SLAT = "(((s_suppkey * 11) % 140) - 70 + 0.25)"
_Q211_SLON = "(((s_suppkey * 17) % 340) - 170 + 0.5)"

_Q211_SQL = f"""
WITH c AS (SELECT c_custkey, {_Q211_CLAT} AS la, {_Q211_CLON} AS lo FROM customer),
s AS (SELECT s_suppkey, {_Q211_SLAT} AS la, {_Q211_SLON} AS lo FROM supplier),
d AS (
  SELECT c.c_custkey, s.s_suppkey,
         ROUND(2.0 * 6371.0 * asin(sqrt(
           pow(sin(radians(s.la - c.la) / 2), 2)
           + cos(radians(c.la)) * cos(radians(s.la))
             * pow(sin(radians(s.lo - c.lo) / 2), 2))), 6) AS km
  FROM c, s
),
near AS (SELECT * FROM d WHERE km <= {_Q211_RADIUS_KM}),
r AS (
  SELECT c_custkey, s_suppkey, km,
         ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY km, s_suppkey) AS rn
  FROM near
)
SELECT n.c_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_near,
       ANY_VALUE(r.s_suppkey) AS nearest_suppkey,
       ROUND(ANY_VALUE(r.km), 1) AS nearest_km
FROM near n JOIN r ON r.c_custkey = n.c_custkey AND r.rn = 1
GROUP BY n.c_custkey ORDER BY n.c_custkey
"""


@register(
    "q211_haversine_join",
    _Q211_SQL,
    doc=(
        "geo radius join (suppliers within 500 km of each customer, "
        "plus the nearest one) with LOSSLESS grid blocking: both sides "
        "key on floor(lat/5), floor(lon/5) cells; each customer probes "
        "its 3x7 neighbor envelope (provably covers the radius for "
        "|lat| <= 70.25 — dlat <= 4.5 deg, dlon <= 4.5/cos(70.25) = "
        "13.3 deg) so candidates come from ONE equi-join on cell "
        "coordinates — never the all-pairs cross join the brute-force "
        "oracle runs; the exact haversine verifies candidates in-row, "
        "and the per-customer count + min_by argmin are one keyed "
        "aggregation (map-side partials, zero windows)"
    ),
    tables=("customer", "supplier"),
)
def q211(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (((F.col("c_custkey") * 7) % 140) - 70 + F.lit(0.25)).alias("cla"),
        (((F.col("c_custkey") * 13) % 340) - 170 + F.lit(0.5)).alias("clo"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (((F.col("s_suppkey") * 11) % 140) - 70 + F.lit(0.25)).alias("sla"),
        (((F.col("s_suppkey") * 17) % 340) - 170 + F.lit(0.5)).alias("slo"),
    )
    cell = lambda c: F.floor(c / F.lit(_Q211_CELL_DEG)).cast("long")
    s_cells = supp.select(
        "*", cell(F.col("sla")).alias("gla"), cell(F.col("slo")).alias("glo")
    )
    offsets = F.array(
        *[
            F.struct(F.lit(a).alias("da"), F.lit(o).alias("do"))
            for a in _Q211_LAT_OFF
            for o in _Q211_LON_OFF
        ]
    )
    c_probes = cust.select(
        "*", F.explode(offsets).alias("off")
    ).select(
        "c_custkey",
        "cla",
        "clo",
        (cell(F.col("cla")) + F.col("off.da")).alias("gla"),
        (cell(F.col("clo")) + F.col("off.do")).alias("glo"),
    )
    km = F.round(
        F.lit(2.0)
        * F.lit(6371.0)
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("sla") - F.col("cla")) / 2), 2)
                + F.cos(F.radians("cla"))
                * F.cos(F.radians("sla"))
                * F.pow(F.sin(F.radians(F.col("slo") - F.col("clo")) / 2), 2)
            )
        ),
        6,
    )
    near = (
        c_probes.join(s_cells, ["gla", "glo"])
        .select("c_custkey", "s_suppkey", km.alias("km"))
        .where(F.col("km") <= _Q211_RADIUS_KM)
    )
    return (
        near.groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_near"),
            F.min_by(
                F.struct(F.col("s_suppkey").alias("sk"), F.col("km").alias("km")),
                F.struct(F.col("km").alias("k"), F.col("s_suppkey").alias("s")),
            ).alias("best"),
        )
        .select(
            "c_custkey",
            "n_near",
            F.col("best.sk").alias("nearest_suppkey"),
            F.round(F.col("best.km"), 1).alias("nearest_km"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q208: isotonic (PAV) score calibration per segment
# ---------------------------------------------------------------------------

_Q208_SQL = """
WITH e AS (
  SELECT user_id % 10 AS seg, value AS score, event_id,
         CAST(event_type = 'purchase' AS BIGINT) AS y
  FROM events
),
r AS (
  SELECT seg, y,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY score, event_id) AS i
  FROM e
),
cum AS (
  SELECT seg, i, y, SUM(y) OVER (PARTITION BY seg ORDER BY i) AS cy
  FROM r
),
m AS (
  SELECT a.seg, a.i AS j, b.i AS k,
         (b.cy - a.cy + a.y) * 1.0 / (b.i - a.i + 1) AS mean_jk
  FROM cum a JOIN cum b ON a.seg = b.seg AND a.i <= b.i
),
sfx AS (
  SELECT seg, j, k,
         MIN(mean_jk) OVER (PARTITION BY seg, j ORDER BY k DESC) AS m1
  FROM m
),
pm AS (
  SELECT seg, j, k, MAX(m1) OVER (PARTITION BY seg, k ORDER BY j) AS iso
  FROM sfx
),
fit AS (SELECT seg, k AS i, iso FROM pm WHERE j = k)
SELECT f.seg AS segment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(r2.y) AS BIGINT) AS n_pos,
       ROUND(AVG((f.iso - r2.y) * (f.iso - r2.y)), 6) AS brier
FROM fit f JOIN r r2 ON r2.seg = f.seg AND r2.i = f.i
GROUP BY f.seg ORDER BY segment
"""


@register(
    "q208_isotonic_calibration",
    _Q208_SQL,
    doc=(
        "isotonic score calibration (pool-adjacent-violators) per "
        "segment — the monotone probability-calibration step of a "
        "ranking pipeline — with the calibrated Brier score as the "
        "readout: the engine runs the O(n log n) PAV stack per segment "
        "in ONE applyInPandas pass (a calibration segment fits an "
        "executor; block pooling compares integer cross-products, so "
        "every fitted value is an exact int/int division both engines "
        "reproduce bit-for-bit); the oracle replays the minimax "
        "identity iso_i = max_{j<=i} min_{k>=i} mean(y[j..k]) "
        "(Robertson-Wright-Dykstra 1988) as two O(n^2) suffix-min / "
        "prefix-max windows over the pairwise-mean table — brute "
        "force the stack provably equals"
    ),
    tables=("events",),
)
def q208(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 10).alias("seg"),
        F.col("value").alias("score"),
        "event_id",
        (F.col("event_type") == "purchase").cast("long").alias("y"),
    )

    def pav(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["score", "event_id"])
        ys = pdf["y"].to_numpy()
        # PAV stack: merge while previous block mean > current block
        # mean — compared as INTEGER cross-products (labels are 0/1
        # counts), so pooling decisions are exact; fitted values are
        # int/int divisions emitted once per block at the end
        sums: list[int] = []
        cnts: list[int] = []
        for yi in ys:
            s, c = int(yi), 1
            while sums and sums[-1] * c > s * cnts[-1]:
                s += sums.pop()
                c += cnts.pop()
            sums.append(s)
            cnts.append(c)
        iso = np.repeat(
            np.array([s / c for s, c in zip(sums, cnts)], dtype="float64"),
            np.array(cnts),
        )
        return pd.DataFrame(
            {"seg": pdf["seg"].iloc[0], "iso": iso, "y": ys}
        )

    fitted = ev.groupBy("seg").applyInPandas(pav, "seg long, iso double, y long")
    return (
        fitted.groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            F.round(
                F.avg((F.col("iso") - F.col("y")) * (F.col("iso") - F.col("y"))), 6
            ).alias("brier"),
        )
        .select(F.col("seg").alias("segment"), "n", "n_pos", "brier")
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# q219: Kaplan–Meier survival (time to first purchase, right-censored)
# ---------------------------------------------------------------------------

_Q219_SQL = """
WITH per_user AS (
  SELECT user_id,
         MIN(epoch_us(ts)) AS t0,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp,
         MAX(epoch_us(ts)) AS tl
  FROM events GROUP BY user_id
),
dur AS (
  SELECT user_id,
         CAST(COALESCE(tp - t0, tl - t0) // 86400000000 AS BIGINT) AS t,
         CAST(tp IS NOT NULL AS BIGINT) AS died
  FROM per_user
),
day AS (
  SELECT t, CAST(SUM(died) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM dur GROUP BY t
),
risk AS (
  SELECT t, d,
         SUM(c) OVER (ORDER BY t DESC) AS n_risk
  FROM day
),
km AS (
  SELECT t, d, n_risk,
         CASE WHEN MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY t) = 1
              THEN 0.0
              ELSE ROUND(EXP(SUM(CASE WHEN d < n_risk
                                      THEN LN(1.0 - d * 1.0 / n_risk)
                                      ELSE 0.0 END)
                             OVER (ORDER BY t)), 4) END AS s_t
  FROM risk
)
SELECT t AS day, d AS n_events, CAST(n_risk AS BIGINT) AS n_at_risk, s_t
FROM km WHERE d > 0 ORDER BY day
"""


@register(
    "q219_kaplan_meier",
    _Q219_SQL,
    doc=(
        "Kaplan–Meier survival estimator (Kaplan & Meier 1958) for "
        "time from a user's first event to first purchase, right-"
        "censored at last observation: per-user durations are one "
        "keyed aggregate; the life table groups to DAILY granularity "
        "so the risk-set suffix sum and the survival prefix product "
        "(EXP-SUM-LN, spelled identically both engines) are windows "
        "over a CALENDAR-bounded frame (~30 rows — never the user "
        "population); integer micro-second durations keep the day "
        "index engine-exact"
    ),
    tables=("events",),
)
def q219(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts_us").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts_us"))
        ).alias("tp"),
        F.max("ts_us").alias("tl"),
    )
    dur = per_user.select(
        (
            F.coalesce(F.col("tp") - F.col("t0"), F.col("tl") - F.col("t0"))
            / F.lit(86400000000)
        )
        .cast("long")
        .alias("t"),
        F.col("tp").isNotNull().cast("long").alias("died"),
    )
    day = dur.groupBy("t").agg(
        F.sum("died").alias("d"), F.count(F.lit(1)).alias("c")
    )
    # calendar-bounded (~30-row) frame: a partitionless window here is
    # O(days), not O(users) — the documented exception (q190 pattern)
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = day.withColumn("n_risk", F.sum("c").over(w_desc))
    # the final risk group can die out entirely (d == n_risk): survival
    # is exactly 0 from there on — handled as an explicit flag so the
    # LN-sum never sees log(0) (mirrored in the oracle's CASE)
    dead = F.max((F.col("d") == F.col("n_risk")).cast("int")).over(w_asc)
    ln_term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(F.lit(1.0) - F.col("d") * F.lit(1.0) / F.col("n_risk")),
    ).otherwise(F.lit(0.0))
    km = risk.withColumn(
        "s_t",
        F.when(dead == 1, F.lit(0.0)).otherwise(
            F.round(F.exp(F.sum(ln_term).over(w_asc)), 4)
        ),
    )
    return (
        km.where(F.col("d") > 0)
        .select(
            F.col("t").alias("day"),
            F.col("d").cast("long").alias("n_events"),
            F.col("n_risk").cast("long").alias("n_at_risk"),
            "s_t",
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# q220: day-of-week seasonality profile
# ---------------------------------------------------------------------------

# 2024-01-01 is a Monday: dow = days-since % 7 (0 = Monday) — explicit
# integer arithmetic instead of engine dayofweek() (whose origin
# convention differs between engines)
_Q220_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
              AS BIGINT) AS dow,
         value
  FROM events
),
prof AS (
  SELECT event_type, dow,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         ROUND(AVG(value), 4) AS mean_value
  FROM e GROUP BY event_type, dow
),
tot AS (SELECT event_type, SUM(cnt) AS t FROM prof GROUP BY event_type)
SELECT p.event_type, p.dow, p.cnt,
       ROUND(p.cnt * 1.0 / tot.t, 4) AS share,
       p.mean_value
FROM prof p JOIN tot ON tot.event_type = p.event_type
ORDER BY p.event_type, p.dow
"""


@register(
    "q220_dow_seasonality",
    _Q220_SQL,
    doc=(
        "day-of-week seasonality profile per event type (the weekly-"
        "cycle feature of demand/traffic models): one (type, dow) "
        "keyed aggregate + a |types|-row broadcast share join; the dow "
        "index is explicit integer days-since-a-known-Monday % 7 — "
        "engine dayofweek() origins differ (Spark 1=Sunday, DuckDB "
        "0=Sunday), integer arithmetic doesn't"
    ),
    tables=("events",),
)
def q220(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        (
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) % 7
        )
        .cast("long")
        .alias("dow"),
        "value",
    )
    prof = e.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg("value"), 4).alias("mean_value"),
    )
    tot = prof.groupBy("event_type").agg(F.sum("cnt").alias("t"))
    return (
        prof.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "dow",
            "cnt",
            F.round(F.col("cnt") * F.lit(1.0) / F.col("t"), 4).alias("share"),
            "mean_value",
        )
        .orderBy("event_type", "dow")
    )


# ---------------------------------------------------------------------------
# q221: daily-volume anomaly flags (z-score over per-type daily counts)
# ---------------------------------------------------------------------------

# variance from integer power sums — (S2 - S1^2/n)/(n-1) — instead of
# STDDEV(): Spark's and DuckDB's stddev kernels use different
# summation algorithms (Welford vs two-pass) whose last-ulp results
# can differ; integer S1/S2 make every intermediate engine-exact
_Q221_Z = 2.0

_Q221_SQL = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
           AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         SUM(c) AS s1, SUM(c * c) AS s2
  FROM daily GROUP BY event_type
),
z AS (
  SELECT d.event_type, d.d, d.c,
         (d.c - s1 * 1.0 / n_days)
           / SQRT((s2 - s1 * 1.0 * s1 / n_days) / (n_days - 1)) AS zs
  FROM daily d JOIN m ON m.event_type = d.event_type
)
SELECT event_type,
       (SELECT CAST(ANY_VALUE(n_days) AS BIGINT) FROM m
        WHERE m.event_type = z.event_type) AS n_days,
       CAST(COUNT(*) FILTER (WHERE ABS(zs) >= {_Q221_Z}) AS BIGINT)
         AS n_anomalous,
       ROUND(MAX(ABS(zs)), 4) AS max_abs_z
FROM z GROUP BY event_type ORDER BY event_type
"""


@register(
    "q221_anomaly_zscore",
    _Q221_SQL,
    doc=(
        "volume-anomaly screening: per-type daily counts z-scored "
        "against the type's own mean/std, days with |z| >= 2 flagged; "
        "variance is computed from INTEGER power sums (S2 - S1²/n over "
        "n-1) rather than the engines' stddev kernels (Welford vs "
        "two-pass differ in the last ulp), so every z is the same "
        "double in both engines; shuffles carry (type, day) rollups "
        "and |types|-row moment frames only"
    ),
    tables=("events",),
)
def q221(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(F.count(F.lit(1)).alias("c"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    zs = (F.col("c") - F.col("s1") * F.lit(1.0) / F.col("n_days")) / F.sqrt(
        (F.col("s2") - F.col("s1") * F.lit(1.0) * F.col("s1") / F.col("n_days"))
        / (F.col("n_days") - F.lit(1))
    )
    return (
        daily.join(F.broadcast(m), "event_type")
        .select("event_type", "n_days", zs.alias("zs"))
        .groupBy("event_type")
        .agg(
            F.first("n_days").cast("long").alias("n_days"),
            F.sum((F.abs(F.col("zs")) >= _Q221_Z).cast("long")).alias(
                "n_anomalous"
            ),
            F.round(F.max(F.abs("zs")), 4).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q222: bigram language-model perplexity per document (add-1 smoothing)
# ---------------------------------------------------------------------------

_Q222_SQL = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
big AS (
  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
  FROM (SELECT doc_id, tk, generate_subscripts(tk, 1) AS i FROM tok)
  WHERE i < len(tk)
),
bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb FROM big GROUP BY w1, w2),
uc AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS cu FROM big GROUP BY w1),
v AS (
  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS nv
  FROM (SELECT w1 AS w FROM big UNION ALL SELECT w2 AS w FROM big)
),
scored AS (
  SELECT b.doc_id,
         -log2((bc.cb + 1) * 1.0 / (uc.cu + v.nv)) AS nll
  FROM big b JOIN bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
             JOIN uc ON uc.w1 = b.w1, v
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(nll), 4) AS mean_nll_bits
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


@register(
    "q222_bigram_perplexity",
    _Q222_SQL,
    doc=(
        "bigram language-model surprisal per document (add-1 "
        "smoothing; the q129 unigram quality scorer upgraded to "
        "conditional probabilities — the classic cheap-LM perplexity "
        "filter of corpus curation): bigrams are built IN-ROW from "
        "the token array (no self-join), counted by one vocabulary-"
        "keyed aggregate, and scored by joining each document bigram "
        "back to the (w1,w2) and (w1) count tables — every "
        "probability is an integer ratio, identical both engines, so "
        "only the per-doc mean of log2 terms is float-summed (4dp)"
    ),
    tables=("documents",),
)
def q222(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select("doc_id", F.split("text", " ").alias("tk"))
    idx = F.sequence(F.lit(1), F.size("tk") - 1)
    big = tk.where(F.size("tk") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("tk", i).alias("w1"),
                    F.element_at("tk", i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    uc = big.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    v = (
        big.select(F.col("w1").alias("w"))
        .unionAll(big.select(F.col("w2").alias("w")))
        .agg(F.countDistinct("w").alias("nv"))
    )
    nll = -F.log2((F.col("cb") + 1) * F.lit(1.0) / (F.col("cu") + F.col("nv")))
    return (
        big.join(bc, ["w1", "w2"])
        .join(uc, "w1")
        .crossJoin(F.broadcast(v))
        .select("doc_id", nll.alias("nll"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("nll"), 4).alias("mean_nll_bits"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q223: two-sample Kolmogorov–Smirnov drift test (en vs non-en lengths)
# ---------------------------------------------------------------------------

_Q223_SQL = """
WITH e AS (
  SELECT n_chars AS x, CAST(lang = 'en' AS BIGINT) AS g1 FROM documents
),
s AS (
  SELECT x, CAST(SUM(g1) AS BIGINT) AS c1,
         CAST(SUM(1 - g1) AS BIGINT) AS c2
  FROM e GROUP BY x
),
c AS (
  SELECT x,
         SUM(c1) OVER (ORDER BY x) AS f1,
         SUM(c2) OVER (ORDER BY x) AS f2
  FROM s
),
t AS (SELECT CAST(SUM(g1) AS BIGINT) AS n1,
             CAST(SUM(1 - g1) AS BIGINT) AS n2 FROM e),
d AS (
  SELECT c.x, ABS(f1 * 1.0 / n1 - f2 * 1.0 / n2) AS dd FROM c, t
),
best AS (SELECT x, dd, ROW_NUMBER() OVER (ORDER BY dd DESC, x) AS rn FROM d)
SELECT t.n1, t.n2,
       ROUND((SELECT dd FROM best WHERE rn = 1), 6) AS ks,
       (SELECT x FROM best WHERE rn = 1) AS ks_at,
       ROUND(SQRT(t.n1 * CAST(t.n2 AS DOUBLE) / (t.n1 + t.n2))
             * (SELECT dd FROM best WHERE rn = 1), 4) AS ks_scaled
FROM t
"""


@register(
    "q223_ks_drift",
    _Q223_SQL,
    doc=(
        "two-sample Kolmogorov–Smirnov statistic (en vs non-en "
        "document length distributions — the distribution-drift gate "
        "complementing q192's EMD): values reduce to per-distinct-"
        "value group counts, both empirical CDFs come from the range-"
        "bucketed global_cumsum (one wide shuffle, never a single-"
        "task window), and every CDF step is an integer ratio — the "
        "max |F1-F2| compares engine-exact doubles, argmax tie-broken "
        "by value; sqrt(n1 n2/(n1+n2))·D is the scaled statistic of "
        "the asymptotic test"
    ),
    tables=("documents",),
)
def q223(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.packing import global_cumsum

    docs = load_table(spark, sf_dir, "documents")
    e = docs.select(
        F.col("n_chars").alias("x"),
        (F.col("lang") == "en").cast("long").alias("g1"),
    )
    s = e.groupBy("x").agg(
        F.sum("g1").alias("c1"), F.sum(F.lit(1) - F.col("g1")).alias("c2")
    )
    c1 = global_cumsum(
        s, "x", "c1", out_col="f1", exclusive=False,
        bounds=[float(200 * i) for i in range(1, 32)],
    )
    c = global_cumsum(
        c1, "x", "c2", out_col="f2", exclusive=False,
        bounds=[float(200 * i) for i in range(1, 32)],
    )
    t = e.agg(
        F.sum("g1").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("g1")).cast("long").alias("n2"),
    )
    d = c.crossJoin(F.broadcast(t)).select(
        "x",
        "n1",
        "n2",
        F.abs(
            F.col("f1") * F.lit(1.0) / F.col("n1")
            - F.col("f2") * F.lit(1.0) / F.col("n2")
        ).alias("dd"),
    )
    best = d.orderBy(F.col("dd").desc(), "x").limit(1)
    return best.select(
        "n1",
        "n2",
        F.round("dd", 6).alias("ks"),
        F.col("x").alias("ks_at"),
        F.round(
            F.sqrt(
                F.col("n1") * F.col("n2").cast("double") / (F.col("n1") + F.col("n2"))
            )
            * F.col("dd"),
            4,
        ).alias("ks_scaled"),
    )


# ---------------------------------------------------------------------------
# q224: k-gram novelty profile (share of never-before-seen grams per doc)
# ---------------------------------------------------------------------------

_Q224_K = 8

_Q224_SQL = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
gl AS (
  SELECT doc_id, list_transform(range(1, len(tk) - {_Q224_K - 2}),
           i -> array_to_string(list_slice(tk, i, i + {_Q224_K - 1}), ' ')) AS gs
  FROM tok WHERE len(tk) >= {_Q224_K}
),
g AS (SELECT DISTINCT doc_id, unnest(gs) AS gram FROM gl),
fs AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(*) FILTER (WHERE fs.first_doc = g.doc_id) AS BIGINT)
         AS n_novel,
       ROUND(COUNT(*) FILTER (WHERE fs.first_doc = g.doc_id) * 1.0
             / COUNT(*), 4) AS novel_share
FROM g JOIN fs USING (gram)
GROUP BY g.doc_id ORDER BY g.doc_id
"""


@register(
    "q224_gram_novelty",
    _Q224_SQL,
    doc=(
        "k-gram novelty profile (Lee et al. 2022-adjacent: how much "
        "of each document's 8-gram content is FIRST seen there, in "
        "doc-id order — the marginal-contribution signal of "
        "sequential corpus construction): per-doc DISTINCT gram "
        "types, a gram-keyed MIN(doc_id) first-seen table, one join "
        "back — shuffles carry xxhash64 gram keys (the q86/q143 "
        "8-byte discipline; the oracle's raw-string grouping would "
        "surface any collision as a mismatch), never gram text"
    ),
    tables=("documents",),
)
def q224(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.quality import word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    g = (
        word_ngrams(docs.select("doc_id", "text"), _Q224_K, keep=["doc_id"])
        .select("doc_id", F.xxhash64("ngram").alias("gh"))
        .distinct()
    )
    fs = g.groupBy("gh").agg(F.min("doc_id").alias("first_doc"))
    novel = (F.col("first_doc") == F.col("doc_id")).cast("long")
    return (
        g.join(fs, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(novel).alias("n_novel"),
            F.round(F.sum(novel) * F.lit(1.0) / F.count(F.lit(1)), 4).alias(
                "novel_share"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q225: cross-source contamination matrix (shared gram types per source pair)
# ---------------------------------------------------------------------------

_Q225_K = 8
_Q225_TOP = 15

_Q225_SQL = f"""
WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
gl AS (
  SELECT source, list_transform(range(1, len(tk) - {_Q225_K - 2}),
           i -> array_to_string(list_slice(tk, i, i + {_Q225_K - 1}), ' ')) AS gs
  FROM tok WHERE len(tk) >= {_Q225_K}
),
g AS (SELECT DISTINCT source, unnest(gs) AS gram FROM gl),
pairs AS (
  SELECT a.gram, a.source AS s1, b.source AS s2
  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
)
SELECT s1, s2, CAST(COUNT(*) AS BIGINT) AS shared_grams
FROM pairs GROUP BY s1, s2
ORDER BY shared_grams DESC, s1, s2 LIMIT {_Q225_TOP}
"""


@register(
    "q225_source_overlap",
    _Q225_SQL,
    doc=(
        "cross-source contamination matrix: for each source pair, how "
        "many distinct 8-gram types they share (the q131 cross-source "
        "exact-dup check generalized to shingle overlap — the scraped-"
        "from-each-other signal): distinct (source, gram-hash) "
        "incidence, pairs from a gram-keyed self-equi-join (pair "
        "volume bounded by Σ sources-per-gram², sources <= corpus "
        "source count), one keyed count, TakeOrdered top-15; gram "
        "text never shuffles (xxhash64 keys, raw-string oracle)"
    ),
    tables=("documents",),
)
def q225(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.quality import word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    g = (
        word_ngrams(docs.select("source", "text"), _Q225_K, keep=["source"])
        .select("source", F.xxhash64("ngram").alias("gh"))
        .distinct()
    )
    a = g.select(F.col("gh").alias("k"), F.col("source").alias("s1"))
    b = g.select(F.col("gh").alias("k"), F.col("source").alias("s2"))
    return (
        a.join(b, "k")
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
        .orderBy(F.col("shared_grams").desc(), "s1", "s2")
        .limit(_Q225_TOP)
    )


# ---------------------------------------------------------------------------
# q226: correlated LATERAL subquery with per-row ORDER BY ... LIMIT
# ---------------------------------------------------------------------------

_Q226_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.price
FROM customer c, LATERAL (
  SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
) t
WHERE c.c_custkey <= 100
ORDER BY c.c_custkey, price DESC, o_orderkey
"""


@register(
    "q226_lateral_topn",
    _Q226_SQL,
    doc=(
        "correlated LATERAL subquery with per-row ORDER BY ... LIMIT "
        "(top-3 orders per customer) — run VERBATIM through spark.sql "
        "like q161/q200, witnessing the one correlation shape the "
        "registered surface didn't yet exercise: Catalyst's "
        "DecorrelateInnerQuery must rewrite the per-row limit into a "
        "partitioned rank filter over ONE join (the UDTF laterals "
        "u4/u6 cover function-valued laterals; this is the subquery "
        "form).  The same text runs unchanged on DuckDB"
    ),
    tables=("customer", "orders"),
)
def q226(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q226_SQL)


# ---------------------------------------------------------------------------
# q227: overlapping context-window chunking (RAG / pretraining prep)
# ---------------------------------------------------------------------------

_Q227_SIZE = 64
_Q227_STRIDE = 48

_Q227_SQL = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
n AS (SELECT doc_id, tk, len(tk) AS nt FROM tok),
c AS (
  SELECT doc_id, tk, nt, unnest(range(0,
           1 + CAST(ceil(greatest(nt - {_Q227_SIZE}, 0) / {_Q227_STRIDE}.0)
               AS BIGINT))) AS chunk_id
  FROM n
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(chunk_id * {_Q227_STRIDE} AS BIGINT) AS start_tok,
       CAST(LEAST(chunk_id * {_Q227_STRIDE} + {_Q227_SIZE}, nt)
            - chunk_id * {_Q227_STRIDE} AS BIGINT) AS n_tok,
       tk[chunk_id * {_Q227_STRIDE} + 1] AS head_tok,
       tk[LEAST(chunk_id * {_Q227_STRIDE} + {_Q227_SIZE}, nt)] AS tail_tok
FROM c ORDER BY doc_id, chunk_id
"""


@register(
    "q227_doc_chunking",
    _Q227_SQL,
    doc=(
        "overlapping context-window chunking (size 64, stride 48 — "
        "the RAG-indexing / pretraining-example prep step): chunk "
        "count and bounds are IN-ROW integer arithmetic over the "
        "token array (no shuffle at all until the presentation sort); "
        "the last chunk clamps to the document end so coverage is "
        "total and chunk starts stay on the stride grid.  DuckDB "
        "range() is end-EXCLUSIVE vs Spark sequence()'s inclusive "
        "end (the q205 trap) — the Spark side subtracts 1 from the "
        "chunk-count bound"
    ),
    tables=("documents",),
)
def q227(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select("doc_id", F.split("text", " ").alias("tk"))
    nt = F.size("tk")
    n_chunks = 1 + F.ceil(
        F.greatest(nt - F.lit(_Q227_SIZE), F.lit(0)) / F.lit(float(_Q227_STRIDE))
    ).cast("long")
    c = tk.select(
        "doc_id",
        "tk",
        nt.alias("nt"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * _Q227_STRIDE
    end = F.least(start + _Q227_SIZE, F.col("nt"))
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("start_tok"),
        (end - start).cast("long").alias("n_tok"),
        F.element_at("tk", (start + 1).cast("int")).alias("head_tok"),
        F.element_at("tk", end.cast("int")).alias("tail_tok"),
    ).orderBy("doc_id", "chunk_id")


# ---------------------------------------------------------------------------
# q228: dataset mixing to target language proportions
# ---------------------------------------------------------------------------

# target mixture shares (percent) — the pretraining data-mixing recipe
_Q228_TARGETS = {"en": 50, "de": 15, "es": 15, "fr": 10, "zh": 10}
_Q228_MOD = 1_000_000


def _q228_sql() -> str:
    tcase = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(_Q228_TARGETS.items())
    )
    return f"""
WITH n AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl FROM documents GROUP BY lang),
t AS (SELECT lang, nl, CASE lang {tcase} ELSE 0 END AS tgt FROM n),
sc AS (SELECT MIN(nl * 1.0 / tgt) AS scale FROM t WHERE tgt > 0),
r AS (
  SELECT t.lang, t.nl, t.tgt,
         CAST(FLOOR(t.tgt * sc.scale / t.nl * {_Q228_MOD}) AS BIGINT) AS thr
  FROM t, sc
),
kept AS (
  SELECT d.lang, COUNT(*) AS kept
  FROM documents d JOIN r ON r.lang = d.lang
  WHERE {sql_hash_bucket("d.doc_id", _Q228_MOD)} < r.thr
  GROUP BY d.lang
)
SELECT r.lang, r.nl AS n_docs, CAST(r.tgt AS BIGINT) AS target_pct,
       CAST(COALESCE(kept.kept, 0) AS BIGINT) AS n_kept
FROM r LEFT JOIN kept ON kept.lang = r.lang
ORDER BY r.lang
"""


@register(
    "q228_dataset_mixing",
    _q228_sql(),
    doc=(
        "dataset mixing to target language proportions (the "
        "pretraining mixture recipe: en 50 / de 15 / es 15 / fr 10 / "
        "zh 10): the binding language sets the scale "
        "(min nl/target), each language's acceptance THRESHOLD is a "
        "broadcast scalar, and membership is the row-local "
        "deterministic hash predicate — a pushable scan filter, no "
        "per-language exact-k window over the corpus (rate-based "
        "thresholding trades exact counts for a shuffle-free scan, "
        "the right trade at 100 TB; realized counts are reported "
        "for audit)"
    ),
    tables=("documents",),
)
def q228(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("nl"))
    tgt = None
    for k, v in sorted(_Q228_TARGETS.items()):
        tgt = (
            F.when(F.col("lang") == k, F.lit(v))
            if tgt is None
            else tgt.when(F.col("lang") == k, F.lit(v))
        )
    tgt = tgt.otherwise(F.lit(0))
    t = n.select("lang", "nl", tgt.alias("tgt"))
    sc = t.where(F.col("tgt") > 0).agg(
        F.min(F.col("nl") * F.lit(1.0) / F.col("tgt")).alias("scale")
    )
    r = t.crossJoin(F.broadcast(sc)).select(
        "lang",
        "nl",
        "tgt",
        F.floor(
            F.col("tgt") * F.col("scale") / F.col("nl") * F.lit(_Q228_MOD)
        )
        .cast("long")
        .alias("thr"),
    )
    kept = (
        docs.join(F.broadcast(r), "lang")
        .where(hash_bucket("doc_id", _Q228_MOD) < F.col("thr"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("kept"))
    )
    return (
        r.join(kept, "lang", "left")
        .select(
            "lang",
            F.col("nl").alias("n_docs"),
            F.col("tgt").cast("long").alias("target_pct"),
            F.coalesce(F.col("kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q229: batch sessionization (30-minute inactivity gaps)
# ---------------------------------------------------------------------------

_Q229_GAP_US = 30 * 60 * 1_000_000

_Q229_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t FROM events
),
flag AS (
  SELECT user_id, event_id, t,
         CASE WHEN LAG(t) OVER w IS NULL
                   OR t - LAG(t) OVER w > {_Q229_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
sess AS (
  SELECT user_id, t,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id) AS sid
  FROM flag
)
SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(t) - MIN(t) AS BIGINT) AS dur_us
FROM sess GROUP BY user_id, sid ORDER BY user_id, session_idx
"""


@register(
    "q229_batch_sessionize",
    _Q229_SQL,
    doc=(
        "batch sessionization by 30-minute inactivity gap (the batch "
        "twin of s3's streaming session_window, over the SAME gap "
        "semantics): per-user LAG flags session starts, a per-user "
        "running sum numbers them, one keyed aggregate rolls each "
        "session up — every window is PARTITIONED BY user_id (state "
        "bounded per key, the distributed-sessionization shape), and "
        "time arithmetic stays in integer epoch micros"
    ),
    tables=("events",),
)
def q229(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts_us").alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    new_s = (
        F.lag("t").over(w).isNull()
        | (F.col("t") - F.lag("t").over(w) > _Q229_GAP_US)
    ).cast("int")
    sess = ev.withColumn("new_s", new_s).withColumn(
        "sid", F.sum("new_s").over(w)
    )
    return (
        sess.groupBy("user_id", "sid")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("t") - F.min("t")).cast("long").alias("dur_us"),
        )
        .select(
            "user_id",
            F.col("sid").cast("long").alias("session_idx"),
            "n_events",
            "dur_us",
        )
        .orderBy("user_id", "session_idx")
    )


# ---------------------------------------------------------------------------
# q230: weighted sampling without replacement (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------

_Q230_K = 10
_Q230_MOD = 1_000_003  # prime: hash buckets hit every residue


def _q230_key_sql(id_expr: str, w_expr: str) -> str:
    u = f"(({sql_hash_bucket(id_expr, _Q230_MOD)}) + 1) * 1.0 / {_Q230_MOD + 1}"
    return f"LN({u}) / ({w_expr})"


_Q230_SQL = f"""
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars FROM documents
  ORDER BY {_q230_key_sql("doc_id", "n_chars")} DESC, doc_id
  LIMIT {_Q230_K}
) ORDER BY doc_id
"""


@register(
    "q230_weighted_reservoir",
    _Q230_SQL,
    doc=(
        "weighted sampling WITHOUT replacement, k=10, weight=n_chars "
        "(Efraimidis & Spirakis 2006 A-ES: each row keyed by "
        "u^(1/w) — equivalently ln(u)/w — and the top-k keys are the "
        "sample): u comes from the deterministic id hash instead of "
        "an RNG, so the draw is reproducible across runs, engines, "
        "and repartitioning — and the top-k is TakeOrderedAndProject "
        "(per-partition k-heap), the same one-scan shape as q207 but "
        "with inclusion probability proportional to weight"
    ),
    tables=("documents",),
)
def q230(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = (hash_bucket("doc_id", _Q230_MOD) + 1) * F.lit(1.0) / F.lit(_Q230_MOD + 1)
    key = F.log(u) / F.col("n_chars")
    return (
        d.select("doc_id", "lang", "n_chars")
        .orderBy(key.desc(), F.col("doc_id"))
        .limit(_Q230_K)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q231: week-over-week growth per event type
# ---------------------------------------------------------------------------

_Q231_SQL = """
WITH wk AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
              AS BIGINT) AS week,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT event_type, week, cnt,
       CAST(LAG(cnt) OVER (PARTITION BY event_type ORDER BY week) AS BIGINT)
         AS prev_cnt,
       ROUND((cnt - LAG(cnt) OVER (PARTITION BY event_type ORDER BY week))
             * 100.0
             / NULLIF(LAG(cnt) OVER (PARTITION BY event_type ORDER BY week), 0),
             2) AS wow_pct
FROM wk ORDER BY event_type, week
"""


@register(
    "q231_wow_growth",
    _Q231_SQL,
    doc=(
        "week-over-week growth per event type — the KPI-dashboard "
        "staple: the corpus reduces to one (type, week) keyed "
        "aggregate (map-side partials); LAG and the growth ratio run "
        "over |types| x |weeks| rows, integer week indexing from the "
        "fixed epoch Monday, NULLIF-guarded division"
    ),
    tables=("events",),
)
def q231(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    wk = ev.groupBy(
        "event_type",
        (
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            / F.lit(7)
        )
        .cast("long")
        .alias("week"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("cnt").over(w)
    return wk.select(
        "event_type",
        "week",
        "cnt",
        prev.cast("long").alias("prev_cnt"),
        F.round(
            (F.col("cnt") - prev) * F.lit(100.0) / F.nullif(prev, F.lit(0)), 2
        ).alias("wow_pct"),
    ).orderBy("event_type", "week")


# ---------------------------------------------------------------------------
# q306: Neyman allocation for stratified sampling (round 8)
# ---------------------------------------------------------------------------

_Q306_BUDGET = 100

# Neyman (1934): allocate a fixed sample budget n across strata
# proportionally to N_h * S_h — big and variable strata get more.
# Variance comes from integer cents power sums (the q221 discipline:
# engines' stddev kernels differ in the last ulp; an explicit
# (s2 - s1^2/N)/(N-1) double expression evaluated identically does
# not), and s1^2 is squared AS DOUBLE so sf0.1-scale sums cannot
# overflow a BIGINT mid-expression.
_Q306_SQL = f"""
WITH s AS (
  SELECT c_mktsegment AS segment,
         CAST(COUNT(*) AS BIGINT) AS n_h,
         CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s1,
         CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
                  * CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s2
  FROM customer GROUP BY 1
),
sd AS (
  SELECT segment, n_h,
         SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_h)
              / (n_h - 1)) AS s_h
  FROM s
)
SELECT segment, n_h,
       ROUND(s_h / 100.0, 4) AS sd_dollars,
       CAST(FLOOR({_Q306_BUDGET} * (n_h * s_h)
                  / (SELECT SUM(n_h * s_h) FROM sd) + 0.5) AS BIGINT)
         AS alloc
FROM sd ORDER BY segment
"""


@register(
    "q306_neyman_allocation",
    _Q306_SQL,
    doc=(
        f"Neyman-optimal allocation of a {_Q306_BUDGET}-unit sample "
        "budget across market-segment strata (allocation proportional "
        "to N_h x S_h, the minimum-variance split of a stratified "
        "mean estimate — the principled upgrade over q206's "
        "fixed-rate stratification): per-stratum variance from exact "
        "integer cents power sums, one keyed aggregation + one 5-row "
        "weight frame; rounding is FLOOR(x + 0.5) spelled identically "
        "both engines (never engine-native ROUND on a ratio)"
    ),
    tables=("customer",),
)
def q306(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    s = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_h"),
            F.sum(cents).cast("long").alias("s1"),
            F.sum(cents * cents).cast("long").alias("s2"),
        )
    )
    s_h = F.sqrt(
        (
            F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1") / F.col("n_h")
        )
        / (F.col("n_h") - 1)
    )
    from osm_changesets_to_parquet_spark.operators.iterutils import (
        truncate_lineage,
    )

    # the 5-row stratum frame feeds both the weight total and the final
    # select — materialize once (multi-consumer recompute discipline)
    sd = truncate_lineage(s.select("segment", "n_h", s_h.alias("s_h")))
    tot = sd.agg(F.sum(F.col("n_h") * F.col("s_h")).alias("w"))
    return (
        sd.crossJoin(F.broadcast(tot))
        .select(
            "segment",
            "n_h",
            F.round(F.col("s_h") / 100.0, 4).alias("sd_dollars"),
            F.floor(
                F.lit(_Q306_BUDGET) * (F.col("n_h") * F.col("s_h")) / F.col("w")
                + 0.5
            )
            .cast("long")
            .alias("alloc"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# q307: Kneser-Ney smoothed bigram probabilities (round 8)
# ---------------------------------------------------------------------------

# absolute discount (Kneser & Ney 1995); dyadic so the subtraction is
# exact in binary floating point on both engines
_Q307_D = 0.75
_Q307_TOPK = 20

_Q307_SQL = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
big AS (
  SELECT tk[i] AS w1, tk[i + 1] AS w2
  FROM (SELECT tk, generate_subscripts(tk, 1) AS i FROM tok)
  WHERE i < len(tk)
),
bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb FROM big GROUP BY w1, w2),
uc AS (
  SELECT w1, CAST(SUM(cb) AS BIGINT) AS cu,
         CAST(COUNT(*) AS BIGINT) AS nfol
  FROM bc GROUP BY w1
),
pre AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS npre FROM bc GROUP BY w2),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntypes FROM bc),
top AS (SELECT w1, w2, cb FROM bc ORDER BY cb DESC, w1, w2 LIMIT {_Q307_TOPK})
SELECT t.w1, t.w2, t.cb,
       ROUND(GREATEST(t.cb - {_Q307_D}, 0) / uc.cu
             + ({_Q307_D} * uc.nfol / uc.cu)
               * (CAST(pre.npre AS DOUBLE) / tot.ntypes), 6) AS p_kn
FROM top t JOIN uc ON uc.w1 = t.w1 JOIN pre ON pre.w2 = t.w2, tot
ORDER BY t.cb DESC, t.w1, t.w2
"""


@register(
    "q307_kneser_ney",
    _Q307_SQL,
    doc=(
        "Kneser-Ney smoothed bigram probabilities (the production LM "
        "smoother, upgrading q222's add-1: absolute discount D=0.75 "
        "with the discounted mass backed off to CONTINUATION "
        "probability — how many distinct contexts a word follows, not "
        "how often it occurs; the classic 'San Francisco' fix): one "
        "bigram rollup feeds all four count tables (materialized "
        "once — the bigram-type table is the sufficient statistic; "
        "raw bigrams are never rescanned), the top-k ranking is "
        "TakeOrdered, and the probability composes integer counts "
        "with a dyadic discount so both engines evaluate identical "
        "doubles.  Shuffles carry vocabulary keys only"
    ),
    tables=("documents",),
)
def q307(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.iterutils import (
        truncate_lineage,
    )

    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(F.split("text", " ").alias("tk")).where(F.size("tk") >= 2)
    big = tk.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - 1),
                lambda i: F.struct(
                    F.element_at("tk", i).alias("w1"),
                    F.element_at("tk", i + 1).alias("w2"),
                ),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bc = truncate_lineage(
        big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    uc = bc.groupBy("w1").agg(
        F.sum("cb").cast("long").alias("cu"),
        F.count(F.lit(1)).cast("long").alias("nfol"),
    )
    pre = bc.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("npre"))
    tot = bc.agg(F.count(F.lit(1)).cast("long").alias("ntypes"))
    top = bc.orderBy(F.col("cb").desc(), "w1", "w2").limit(_Q307_TOPK)
    p_kn = F.round(
        F.greatest(F.col("cb") - _Q307_D, F.lit(0.0)) / F.col("cu")
        + (F.lit(_Q307_D) * F.col("nfol") / F.col("cu"))
        * (F.col("npre").cast("double") / F.col("ntypes")),
        6,
    )
    return (
        top.join(uc, "w1")
        .join(pre, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "cb", p_kn.alias("p_kn"))
        .orderBy(F.col("cb").desc(), "w1", "w2")
    )


# ---------------------------------------------------------------------------
# q316: Brown-Forsythe variance-homogeneity test (round 8)
# ---------------------------------------------------------------------------

# Levene's test with the MEDIAN center (Brown & Forsythe 1974) — the
# robust pre-check before pooling variances across groups.  Per-group
# medians are exact value-domain rank selections (the q289/q312
# machinery): rank floor((n+1)/2) and ceil((n+1)/2) read from the
# per-group value cumulative, kept as the DOUBLED median m1+m2 so the
# even-n midpoint stays integer.  Deviations z = |2c - med2| are then
# exact BIGINTs and the ANOVA-F over z needs only the integer power
# sums (S_j, Q_j, n_j) — per-group sums CAST to DOUBLE before squaring
# (q214 lesson; S_j^2 would overflow BIGINT past sf~0.1).  The honest
# fixture answer: per-type value distributions share one generator, so
# F is small.
_Q316_SQL = """
WITH vals AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
),
gcnt AS (
  SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM vals GROUP BY 1, 2
),
gn AS (
  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n FROM gcnt GROUP BY 1
),
gcum AS (
  SELECT event_type, c,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY c
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM gcnt
),
med AS (
  SELECT x.event_type,
         CAST(MIN(CASE WHEN x.cum >= FLOOR((gn.n + 1) / 2.0) THEN x.c END)
              + MIN(CASE WHEN x.cum >= CEIL((gn.n + 1) / 2.0) THEN x.c END)
              AS BIGINT) AS med2
  FROM gcum x JOIN gn ON gn.event_type = x.event_type
  GROUP BY 1
),
z AS (
  SELECT v.event_type, ABS(2 * v.c - m.med2) AS z
  FROM vals v JOIN med m ON m.event_type = v.event_type
),
s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(z) AS BIGINT) AS sz,
         CAST(SUM(z * z) AS BIGINT) AS qz
  FROM z GROUP BY 1
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nn,
         SUM(CAST(sz AS DOUBLE) * sz / n) AS sq_over_n,
         SUM(CAST(sz AS DOUBLE)) AS stot,
         SUM(CAST(qz AS DOUBLE)) AS qtot
  FROM s
)
SELECT nn AS n, k AS k_groups,
       ROUND(sq_over_n - stot * stot / nn, 2) AS ssb,
       ROUND(qtot - sq_over_n, 2) AS ssw,
       ROUND(((sq_over_n - stot * stot / nn) / (k - 1))
             / NULLIF((qtot - sq_over_n) / (nn - k), 0.0), 6) AS bf_f
FROM t
"""


@register(
    "q316_brown_forsythe",
    _Q316_SQL,
    doc=(
        "Brown-Forsythe variance-homogeneity test across event types "
        "(median-centered Levene — the robust gate before pooled-"
        "variance tests): per-group exact medians via value-domain "
        "rank selection (doubled-median m1+m2 keeps even-n midpoints "
        "integer), absolute deviations z = |2c - med2| exact BIGINT, "
        "then the one-way F over z from integer power sums with "
        "per-group sums CAST to DOUBLE before squaring.  Shuffles "
        "carry (type, cents) value-domain rows and 5-row rollups; the "
        "only windows run over per-type value domains (q289 "
        "discipline); the median frame is a 5-row broadcast into the "
        "deviation scan"
    ),
    tables=("events",),
)
def q316(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    vals = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    )
    gcnt = vals.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    gn = gcnt.groupBy("event_type").agg(F.sum("cnt").cast("long").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gcum = gcnt.select("event_type", "c", F.sum("cnt").over(w).alias("cum"))
    med = (
        gcum.join(gn, "event_type")
        .groupBy("event_type")
        .agg(
            (
                F.min(
                    F.when(
                        F.col("cum") >= F.floor((F.col("n") + 1) / 2.0),
                        F.col("c"),
                    )
                )
                + F.min(
                    F.when(
                        F.col("cum") >= F.ceil((F.col("n") + 1) / 2.0),
                        F.col("c"),
                    )
                )
            )
            .cast("long")
            .alias("med2")
        )
    )
    z = vals.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(2 * F.col("c") - F.col("med2")).alias("z")
    )
    s = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("z").cast("long").alias("sz"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("qz"),
    )
    t = s.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum(F.col("sz").cast("double") * F.col("sz") / F.col("n")).alias(
            "sq_over_n"
        ),
        F.sum(F.col("sz").cast("double")).alias("stot"),
        F.sum(F.col("qz").cast("double")).alias("qtot"),
    )
    ssb = F.col("sq_over_n") - F.col("stot") * F.col("stot") / F.col("nn")
    ssw = F.col("qtot") - F.col("sq_over_n")
    return t.select(
        F.col("nn").alias("n"),
        F.col("k").alias("k_groups"),
        F.round(ssb, 2).alias("ssb"),
        F.round(ssw, 2).alias("ssw"),
        F.round(
            (ssb / (F.col("k") - 1))
            / F.nullif(ssw / (F.col("nn") - F.col("k")), F.lit(0.0)),
            6,
        ).alias("bf_f"),
    )


# ---------------------------------------------------------------------------
# q317: one-way ANOVA F + effect size from integer power sums (round 8)
# ---------------------------------------------------------------------------

# Parametric location test completing the comparison family (q289
# Kruskal-Wallis is its rank-based sibling, q316 Brown-Forsythe its
# scale-test gate): does mean line-item quantity differ by return
# flag?  l_quantity is integral, so the group statistics (n, sum,
# sum-of-squares) are EXACT BIGINTs with headroom to ~1e13 rows; the
# F ratio and eta^2 are one arithmetic expression over them, with
# per-group sums CAST to DOUBLE before squaring (q214 lesson).  The
# honest fixture answer is F ~ 1 (quantity is independent of flag).
_Q317_SQL = """
WITH g AS (
  SELECT l_returnflag AS grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS BIGINT) AS s2
  FROM lineitem GROUP BY 1
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nn,
         SUM(CAST(s1 AS DOUBLE) * s1 / n) AS sqn,
         SUM(CAST(s1 AS DOUBLE)) AS stot,
         SUM(CAST(s2 AS DOUBLE)) AS qtot
  FROM g
)
SELECT nn AS n, k AS k_groups,
       ROUND(sqn - stot * stot / nn, 4) AS ss_between,
       ROUND(qtot - sqn, 4) AS ss_within,
       ROUND(((sqn - stot * stot / nn) / (k - 1))
             / NULLIF((qtot - sqn) / (nn - k), 0.0), 6) AS f_stat,
       ROUND((sqn - stot * stot / nn)
             / NULLIF(qtot - stot * stot / nn, 0.0), 6) AS eta2
FROM t
"""


@register(
    "q317_anova_f",
    _Q317_SQL,
    doc=(
        "one-way ANOVA F plus eta^2 effect size across return-flag "
        "groups, assembled entirely from integer power sums (count, "
        "sum, sum-of-squares per group — the classic one-pass "
        "map-side-combinable sufficient statistic): one fact scan, one "
        "3-row group frame, one scalar row out; per-group sums CAST "
        "to DOUBLE before squaring, zero denominators NULLIF-guarded.  "
        "Completes the group-comparison family: q289 tests ranks "
        "(distribution), q316 tests spread, this tests means"
    ),
    tables=("lineitem",),
)
def q317(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    g = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(q).cast("long").alias("s1"),
        F.sum(q * q).cast("long").alias("s2"),
    )
    t = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum(F.col("s1").cast("double") * F.col("s1") / F.col("n")).alias("sqn"),
        F.sum(F.col("s1").cast("double")).alias("stot"),
        F.sum(F.col("s2").cast("double")).alias("qtot"),
    )
    ssb = F.col("sqn") - F.col("stot") * F.col("stot") / F.col("nn")
    ssw = F.col("qtot") - F.col("sqn")
    sst = F.col("qtot") - F.col("stot") * F.col("stot") / F.col("nn")
    return t.select(
        F.col("nn").alias("n"),
        F.col("k").alias("k_groups"),
        F.round(ssb, 4).alias("ss_between"),
        F.round(ssw, 4).alias("ss_within"),
        F.round(
            (ssb / (F.col("k") - 1))
            / F.nullif(ssw / (F.col("nn") - F.col("k")), F.lit(0.0)),
            6,
        ).alias("f_stat"),
        F.round(ssb / F.nullif(sst, F.lit(0.0)), 6).alias("eta2"),
    )


# ---------------------------------------------------------------------------
# q318: Cramér–von Mises two-sample test (round 8)
# ---------------------------------------------------------------------------

# Distribution-equality test that, unlike the q223 KS sup-norm, is
# sensitive across the WHOLE distribution: T = nm/N^2 * sum over the
# pooled sample of (F_n - G_m)^2.  The ECDF difference at value x is
# (a*m - b*n)/(n*m) with a,b the cumulative counts — an exact BIGINT
# cross-multiplication (headroom to ~3e9 rows/side), CAST to DOUBLE
# before squaring, weighted by the pooled multiplicity.  The honest
# fixture answer is small (click and view values share a generator).
_Q318_SQL = """
WITH v AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS c,
         CAST(event_type = 'click' AS BIGINT) AS is1
  FROM events WHERE event_type IN ('click', 'view')
),
cnt AS (
  SELECT c, CAST(SUM(is1) AS BIGINT) AS c1,
         CAST(COUNT(*) - SUM(is1) AS BIGINT) AS c2
  FROM v GROUP BY c
),
tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c2) AS BIGINT) AS n2 FROM cnt),
cum AS (
  SELECT c, c1 + c2 AS w,
         SUM(c1) OVER (ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a,
         SUM(c2) OVER (ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b
  FROM cnt
),
s AS (
  SELECT SUM(w * CAST(cum.a * t.n2 - cum.b * t.n1 AS DOUBLE)
               * CAST(cum.a * t.n2 - cum.b * t.n1 AS DOUBLE)) AS wsum,
         CAST(MAX(t.n1) AS BIGINT) AS n1, CAST(MAX(t.n2) AS BIGINT) AS n2
  FROM cum CROSS JOIN tot t
)
SELECT n1, n2,
       ROUND(wsum / (CAST(n1 AS DOUBLE) * n2 * (n1 + n2) * (n1 + n2)), 6)
         AS t_cvm
FROM s
"""


@register(
    "q318_cvm_two_sample",
    _Q318_SQL,
    doc=(
        "Cramér–von Mises two-sample statistic for click-vs-view "
        "value distributions — the integrated-squared-ECDF-difference "
        "complement to q223's KS sup-norm: per-value counts for both "
        "samples in ONE keyed aggregate, cumulatives over the value "
        "domain (the q289 value-domain-frame discipline; respell via "
        "operators/packing.global_cumsum past ~1e7 distinct values), "
        "ECDF differences cross-multiplied to exact BIGINT a*m - b*n "
        "and CAST to DOUBLE before squaring.  One fact scan, shuffles "
        "carry (cents, counts) only"
    ),
    tables=("events",),
)
def q318(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    v = ev.where(F.col("event_type").isin("click", "view")).select(
        F.round(F.col("value") * 100).cast("long").alias("c"),
        (F.col("event_type") == "click").cast("long").alias("is1"),
    )
    cnt = v.groupBy("c").agg(
        F.sum("is1").cast("long").alias("c1"),
        (F.count(F.lit(1)) - F.sum("is1")).cast("long").alias("c2"),
    )
    tot = F.broadcast(
        cnt.agg(
            F.sum("c1").cast("long").alias("n1"),
            F.sum("c2").cast("long").alias("n2"),
        )
    )
    w = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cnt.select(
        "c",
        (F.col("c1") + F.col("c2")).alias("w"),
        F.sum("c1").over(w).alias("a"),
        F.sum("c2").over(w).alias("b"),
    )
    diff = (F.col("a") * F.col("n2") - F.col("b") * F.col("n1")).cast("double")
    s = cum.crossJoin(tot).agg(
        F.sum(F.col("w") * diff * diff).alias("wsum"),
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
    )
    return s.select(
        "n1",
        "n2",
        F.round(
            F.col("wsum")
            / (
                F.col("n1").cast("double")
                * F.col("n2")
                * (F.col("n1") + F.col("n2"))
                * (F.col("n1") + F.col("n2"))
            ),
            6,
        ).alias("t_cvm"),
    )


# ---------------------------------------------------------------------------
# q320: Nelson–Aalen cumulative hazard (round 8)
# ---------------------------------------------------------------------------

# The hazard-scale complement to q219's Kaplan–Meier: H(t) = sum of
# d_i/n_i over event days <= t, with Aalen's variance sum d_i/n_i^2
# and the Fleming–Harrington survival exp(-H) (never exactly 0, unlike
# KM — no log(0) guard needed).  Same life table as q219: per-user
# durations in integer epoch micros, daily granularity, so every
# window runs over the ~30-row calendar frame.
_Q320_SQL = """
WITH per_user AS (
  SELECT user_id,
         MIN(epoch_us(ts)) AS t0,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp,
         MAX(epoch_us(ts)) AS tl
  FROM events GROUP BY user_id
),
dur AS (
  SELECT CAST(COALESCE(tp - t0, tl - t0) // 86400000000 AS BIGINT) AS t,
         CAST(tp IS NOT NULL AS BIGINT) AS died
  FROM per_user
),
day AS (
  SELECT t, CAST(SUM(died) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM dur GROUP BY t
),
risk AS (
  SELECT t, d, SUM(c) OVER (ORDER BY t DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS n_risk
  FROM day
),
na AS (
  SELECT t, d, n_risk,
         SUM(d * 1.0 / n_risk)
           OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h,
         SUM(d * 1.0 / (CAST(n_risk AS DOUBLE) * n_risk))
           OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vh
  FROM risk
)
SELECT t AS day, d AS n_events, CAST(n_risk AS BIGINT) AS n_at_risk,
       ROUND(h, 6) AS h_t, ROUND(vh, 6) AS var_h,
       ROUND(EXP(-h), 6) AS s_fleming
FROM na WHERE d > 0 ORDER BY day
"""


@register(
    "q320_nelson_aalen",
    _Q320_SQL,
    doc=(
        "Nelson–Aalen cumulative-hazard estimator with Aalen's "
        "variance and the Fleming–Harrington survival exp(-H) — the "
        "hazard-scale complement to q219's Kaplan–Meier on the same "
        "right-censored time-to-first-purchase life table: per-user "
        "durations are one keyed aggregate over integer epoch micros; "
        "the risk-set suffix sum and both cumulative hazard sums are "
        "windows over the CALENDAR-bounded (~30-row) day frame, never "
        "over users.  Unlike KM, H is a plain sum (no product), so no "
        "log(0) guard is needed even when the last risk set dies out"
    ),
    tables=("events",),
)
def q320(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts_us").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts_us"))
        ).alias("tp"),
        F.max("ts_us").alias("tl"),
    )
    dur = per_user.select(
        (
            F.coalesce(F.col("tp") - F.col("t0"), F.col("tl") - F.col("t0"))
            / F.lit(86400000000)
        )
        .cast("long")
        .alias("t"),
        F.col("tp").isNotNull().cast("long").alias("died"),
    )
    day = dur.groupBy("t").agg(
        F.sum("died").alias("d"), F.count(F.lit(1)).alias("c")
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = day.withColumn("n_risk", F.sum("c").over(w_desc))
    h = F.sum(F.col("d") * 1.0 / F.col("n_risk")).over(w_asc)
    vh = F.sum(
        F.col("d") * 1.0 / (F.col("n_risk").cast("double") * F.col("n_risk"))
    ).over(w_asc)
    na = risk.select(
        "t",
        "d",
        "n_risk",
        h.alias("h"),
        vh.alias("vh"),
    )
    return (
        na.where(F.col("d") > 0)
        .select(
            F.col("t").alias("day"),
            F.col("d").cast("long").alias("n_events"),
            F.col("n_risk").cast("long").alias("n_at_risk"),
            F.round("h", 6).alias("h_t"),
            F.round("vh", 6).alias("var_h"),
            F.round(F.exp(-F.col("h")), 6).alias("s_fleming"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# q321: seasonal-naive forecast backtest (MASE / sMAPE) (round 8)
# ---------------------------------------------------------------------------

_Q321_SEASON = 7  # weekly seasonality, the q220/q259 dow signal

# The missing eval half of the forecasting family (q236 Holt fits,
# q259 decomposes — this BACKTESTS): forecast each day's per-type
# event count with the seasonal-naive y[t-7] and score MAE, sMAPE and
# MASE (scaled by the in-sample naive-1 MAE, Hyndman & Koehler 2006).
# Counts are integers, so every error sum is exact BIGINT; the only
# float sums are the ~23 bounded sMAPE terms per type.  The day grid
# is DENSIFIED (types x days, zero-filled) so LAG(7) always aligns to
# the calendar, not to the previous observed row.
_Q321_SQL = f"""
WITH e AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS day
  FROM events
),
span AS (SELECT CAST(MAX(day) AS BIGINT) AS dmax FROM e),
days AS (SELECT UNNEST(generate_series(0, (SELECT dmax FROM span))) AS day),
types AS (SELECT DISTINCT event_type FROM e),
cnt AS (
  SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS y
  FROM e GROUP BY 1, 2
),
dense AS (
  SELECT t.event_type, d.day, COALESCE(c.y, 0) AS y
  FROM types t CROSS JOIN days d
  LEFT JOIN cnt c ON c.event_type = t.event_type AND c.day = d.day
),
lagged AS (
  SELECT event_type, day, y,
         LAG(y, {_Q321_SEASON})
           OVER (PARTITION BY event_type ORDER BY day) AS yhat,
         LAG(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS yprev
  FROM dense
),
m AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN yhat IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS h,
         CAST(SUM(CASE WHEN yhat IS NOT NULL THEN ABS(y - yhat) END)
              AS BIGINT) AS sae,
         SUM(CASE WHEN yhat IS NOT NULL THEN
               CASE WHEN y + yhat = 0 THEN 0.0
                    ELSE 2.0 * ABS(y - yhat) / (y + yhat) END END) AS ssm,
         CAST(SUM(CASE WHEN yprev IS NOT NULL THEN ABS(y - yprev) END)
              AS BIGINT) AS snv,
         CAST(SUM(CASE WHEN yprev IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS hn
  FROM lagged GROUP BY 1
)
SELECT event_type, h AS horizon,
       ROUND(CAST(sae AS DOUBLE) / h, 6) AS mae,
       ROUND(ssm / h, 6) AS smape,
       ROUND((CAST(sae AS DOUBLE) / h)
             / NULLIF(CAST(snv AS DOUBLE) / hn, 0.0), 6) AS mase
FROM m ORDER BY event_type
"""


@register(
    "q321_forecast_backtest",
    _Q321_SQL,
    doc=(
        "seasonal-naive forecast backtest per event type: the weekly "
        "lag-7 forecast scored with MAE, sMAPE and MASE (error scaled "
        "by the in-sample naive-1 MAE — the scale-free skill metric "
        "of Hyndman & Koehler 2006; MASE < 1 beats drift).  The day "
        "grid is densified types x calendar (zero-filled) so the lag "
        "is calendar-true; absolute-error sums are exact BIGINTs; "
        "windows run over per-type ~30-row calendar frames; one fact "
        "scan, shuffles carry (type, day, count) rollups only.  "
        "Completes the forecasting family: q236 fits, q259 "
        "decomposes, q321 backtests"
    ),
    tables=("events",),
)
def q321(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).cast("long").alias("day"),
    )
    span = e.agg(F.max("day").cast("long").alias("dmax"))
    days = span.select(
        F.explode(F.sequence(F.lit(0), F.col("dmax"))).alias("day")
    )
    types = e.select("event_type").distinct()
    cnt = e.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    dense = (
        types.crossJoin(F.broadcast(days))
        .join(cnt, ["event_type", "day"], "left")
        .select(
            "event_type", "day", F.coalesce("y", F.lit(0)).alias("y")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = dense.select(
        "event_type",
        "y",
        F.lag("y", _Q321_SEASON).over(w).alias("yhat"),
        F.lag("y", 1).over(w).alias("yprev"),
    )
    have = F.col("yhat").isNotNull()
    havep = F.col("yprev").isNotNull()
    smape_term = F.when(
        have,
        F.when(F.col("y") + F.col("yhat") == 0, F.lit(0.0)).otherwise(
            2.0 * F.abs(F.col("y") - F.col("yhat")) / (F.col("y") + F.col("yhat"))
        ),
    )
    m = lagged.groupBy("event_type").agg(
        F.sum(F.when(have, 1).otherwise(0)).cast("long").alias("h"),
        F.sum(F.when(have, F.abs(F.col("y") - F.col("yhat"))))
        .cast("long")
        .alias("sae"),
        F.sum(smape_term).alias("ssm"),
        F.sum(F.when(havep, F.abs(F.col("y") - F.col("yprev"))))
        .cast("long")
        .alias("snv"),
        F.sum(F.when(havep, 1).otherwise(0)).cast("long").alias("hn"),
    )
    return m.select(
        "event_type",
        F.col("h").alias("horizon"),
        F.round(F.col("sae").cast("double") / F.col("h"), 6).alias("mae"),
        F.round(F.col("ssm") / F.col("h"), 6).alias("smape"),
        F.round(
            (F.col("sae").cast("double") / F.col("h"))
            / F.nullif(F.col("snv").cast("double") / F.col("hn"), F.lit(0.0)),
            6,
        ).alias("mase"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q322: Simpson's-paradox audit (overall vs pooled-within slope) (round 8)
# ---------------------------------------------------------------------------

# The aggregation-reversal detector every metrics platform needs: the
# discount->quantity slope computed over ALL line items vs the
# pooled-WITHIN-return-flag slope (the weighted average of per-group
# regressions).  A sign flip between them is Simpson's paradox — the
# grouping variable is a confounder.  All sufficient statistics are
# exact BIGINT power sums; covariances become doubles only at the
# final expression (per-group sx*sy stays under 2^53 to ~sf1; beyond,
# both engines compute the identical IEEE product).
_Q322_SQL = """
WITH d AS (
  SELECT l_returnflag AS grp,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem
),
g AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM d GROUP BY 1
),
t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(sx) AS BIGINT) AS tsx,
         CAST(SUM(sy) AS BIGINT) AS tsy, CAST(SUM(sxy) AS BIGINT) AS tsxy,
         CAST(SUM(sxx) AS BIGINT) AS tsxx,
         SUM(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) AS wnum,
         SUM(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS wden,
         CAST(SUM(CASE WHEN CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n
                            > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM g
)
SELECT tn AS n, k AS n_groups, n_pos AS n_pos_groups,
       ROUND((CAST(tsxy AS DOUBLE) - CAST(tsx AS DOUBLE) * tsy / tn)
             / NULLIF(CAST(tsxx AS DOUBLE) - CAST(tsx AS DOUBLE) * tsx / tn,
                      0.0), 6) AS slope_overall,
       ROUND(wnum / NULLIF(wden, 0.0), 6) AS slope_within,
       ((CAST(tsxy AS DOUBLE) - CAST(tsx AS DOUBLE) * tsy / tn) * wnum) < 0
         AS reversal
FROM t
"""


@register(
    "q322_simpson_paradox",
    _Q322_SQL,
    doc=(
        "Simpson's-paradox audit: the discount-vs-quantity OLS slope "
        "over all line items against the pooled-within-return-flag "
        "slope (per-group regressions aggregated by their covariance "
        "weights) — a sign flip means the grouping confounds the "
        "aggregate trend and per-segment reporting would invert the "
        "conclusion.  One fact scan to 3-group integer power sums; "
        "everything after is scalar arithmetic; the reversal flag "
        "compares engine-identical doubles built from exact BIGINTs.  "
        "Fixture answer: no reversal (discount and quantity are "
        "independent everywhere); the reversal branch is pinned by a "
        "planted confounder test"
    ),
    tables=("lineitem",),
)
def q322(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    g = d.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    gcov = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / F.col("n")
    gden = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / F.col("n")
    t = g.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("sx").cast("long").alias("tsx"),
        F.sum("sy").cast("long").alias("tsy"),
        F.sum("sxy").cast("long").alias("tsxy"),
        F.sum("sxx").cast("long").alias("tsxx"),
        F.sum(gcov).alias("wnum"),
        F.sum(gden).alias("wden"),
        F.sum(F.when(gcov > 0, 1).otherwise(0)).cast("long").alias("n_pos"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    ocov = (
        F.col("tsxy").cast("double")
        - F.col("tsx").cast("double") * F.col("tsy") / F.col("tn")
    )
    oden = (
        F.col("tsxx").cast("double")
        - F.col("tsx").cast("double") * F.col("tsx") / F.col("tn")
    )
    return t.select(
        F.col("tn").alias("n"),
        F.col("k").alias("n_groups"),
        F.col("n_pos").alias("n_pos_groups"),
        F.round(ocov / F.nullif(oden, F.lit(0.0)), 6).alias("slope_overall"),
        F.round(F.col("wnum") / F.nullif(F.col("wden"), F.lit(0.0)), 6).alias(
            "slope_within"
        ),
        (ocov * F.col("wnum") < 0).alias("reversal"),
    )


# ---------------------------------------------------------------------------
# q330: Jensen-Shannon divergence matrix between source language mixes
# ---------------------------------------------------------------------------

# The symmetric, bounded (0..1 bit) distribution distance — the drift
# family's categorical member: q223's KS needs an ordered domain,
# q192's EMD a metric one, q120's PSI blows up on empty bins; JSD
# (Lin 1991) is finite for ANY pair of categorical mixes, which is
# why dataset cards report it.  Every probability is an exact
# BIGINT/BIGINT ratio, absent cells contribute exactly 0 (the
# CASE-guarded p*log2(2p/(p+q)) terms), and the per-pair sum runs
# over |langs| terms only (6dp absorbs the sub-ulp add-order drift).
_Q330_SQL = """
WITH c AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
),
n AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY source),
pairs AS (
  SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
  FROM n a JOIN n b ON a.source < b.source
),
langs AS (SELECT DISTINCT lang FROM documents),
terms AS (
  SELECT p.sa, p.sb, p.na, p.nb,
         COALESCE(ca.c, 0) * 1.0 / p.na AS pp,
         COALESCE(cb.c, 0) * 1.0 / p.nb AS qq
  FROM pairs p CROSS JOIN langs l
  LEFT JOIN c ca ON ca.source = p.sa AND ca.lang = l.lang
  LEFT JOIN c cb ON cb.source = p.sb AND cb.lang = l.lang
)
SELECT sa AS source_a, sb AS source_b,
       CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
       ROUND(SUM(
         CASE WHEN pp > 0
              THEN CAST(0.5 AS DOUBLE) * pp * log2(2 * pp / (pp + qq))
              ELSE CAST(0 AS DOUBLE) END
         + CASE WHEN qq > 0
                THEN CAST(0.5 AS DOUBLE) * qq * log2(2 * qq / (pp + qq))
                ELSE CAST(0 AS DOUBLE) END
       ), 6) AS jsd_bits
FROM terms GROUP BY sa, sb ORDER BY sa, sb
"""


@register(
    "q330_js_divergence",
    _Q330_SQL,
    doc=(
        "Jensen-Shannon divergence (Lin 1991, bits) between every "
        "source pair's language distribution — the categorical member "
        "of the drift family (q223 KS needs an ordered domain, q192 "
        "EMD a metric one, q120 PSI diverges on empty bins; JSD is "
        "symmetric, finite, bounded by 1 bit for ANY mix pair): one "
        "(source, lang) rollup feeds per-source totals, the "
        "|sources|^2 pair frame crosses the |langs| domain (both "
        "broadcast-sized — the corpus is reduced before any pair "
        "logic), probabilities are exact BIGINT ratios, absent cells "
        "contribute exactly 0"
    ),
    tables=("documents",),
)
def q330(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.iterutils import (
        truncate_lineage,
    )

    docs = load_table(spark, sf_dir, "documents")
    c = truncate_lineage(
        docs.groupBy("source", "lang").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
    )
    n = c.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    a = n.select(F.col("source").alias("sa"), F.col("n").alias("na"))
    b = n.select(F.col("source").alias("sb"), F.col("n").alias("nb"))
    pairs = a.join(b, F.col("sa") < F.col("sb"))
    langs = docs.select("lang").distinct()
    ca = c.select(
        F.col("source").alias("sa"), "lang", F.col("c").alias("cca")
    )
    cb = c.select(
        F.col("source").alias("sb"), "lang", F.col("c").alias("ccb")
    )
    grid = (
        pairs.crossJoin(F.broadcast(langs))
        .join(F.broadcast(ca), ["sa", "lang"], "left")
        .join(F.broadcast(cb), ["sb", "lang"], "left")
    )
    pp = F.coalesce(F.col("cca"), F.lit(0)) * F.lit(1.0) / F.col("na")
    qq = F.coalesce(F.col("ccb"), F.lit(0)) * F.lit(1.0) / F.col("nb")
    t = grid.select(
        "sa", "sb", "na", "nb", pp.alias("pp"), qq.alias("qq")
    )
    term = F.when(
        F.col("pp") > 0,
        F.lit(0.5)
        * F.col("pp")
        * F.log2(F.lit(2) * F.col("pp") / (F.col("pp") + F.col("qq"))),
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("qq") > 0,
        F.lit(0.5)
        * F.col("qq")
        * F.log2(F.lit(2) * F.col("qq") / (F.col("pp") + F.col("qq"))),
    ).otherwise(F.lit(0.0))
    return (
        t.select("sa", "sb", "na", "nb", term.alias("term"))
        .groupBy(F.col("sa").alias("source_a"), F.col("sb").alias("source_b"))
        .agg(
            F.max("na").cast("long").alias("n_a"),
            F.max("nb").cast("long").alias("n_b"),
            F.round(F.sum("term"), 6).alias("jsd_bits"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# q332: held-out LM comparison — add-1 vs interpolated Kneser-Ney
# ---------------------------------------------------------------------------

# The model-selection readout q222 (add-1 surprisal) and q307 (KN
# probabilities) build toward: train both bigram smoothers on the 80%
# id-hash split, score the SAME held-out bigrams, report mean NLL and
# perplexity side by side.  Unseen-event floors keep both models
# proper on the open vocabulary: add-1 backs an unseen context off to
# 1/V, KN interpolates max(c-D,0)/c(w1) with weight D*nfol/c(w1) into
# an add-1-smoothed continuation probability (npre+1)/(ntypes+V), and
# an unseen context backs off to the continuation alone.  Every
# probability composes exact integer counts with the dyadic D=0.75,
# so both engines score identical doubles; only the held-out mean is
# float-summed (4dp).
_Q332_D = 0.75

_Q332_TRAIN = "((doc_id % 2147483648) * 2654435761) % 100 < 80"

_Q332_SQL = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS tk,
         {_Q332_TRAIN} AS is_train
  FROM documents
),
big AS (
  SELECT is_train, tk[i] AS w1, tk[i + 1] AS w2
  FROM (SELECT is_train, tk, generate_subscripts(tk, 1) AS i FROM tok)
  WHERE i < len(tk)
),
bc AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb
  FROM big WHERE is_train GROUP BY w1, w2
),
uc AS (
  SELECT w1, CAST(SUM(cb) AS BIGINT) AS cu,
         CAST(COUNT(*) AS BIGINT) AS nfol
  FROM bc GROUP BY w1
),
pre AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS npre FROM bc GROUP BY w2),
sc AS (
  SELECT CAST((SELECT COUNT(*) FROM bc) AS BIGINT) AS ntypes,
         CAST((SELECT COUNT(DISTINCT w) FROM (
            SELECT w1 AS w FROM bc UNION ALL SELECT w2 AS w FROM bc))
            AS BIGINT) AS v
),
te AS (SELECT w1, w2 FROM big WHERE NOT is_train),
scored AS (
  SELECT -log2((COALESCE(bc.cb, 0) + 1) * 1.0
               / (COALESCE(uc.cu, 0) + sc.v)) AS nll_add1,
         -log2(CASE WHEN uc.cu IS NULL
                    THEN (COALESCE(pre.npre, 0) + 1) * 1.0
                         / (sc.ntypes + sc.v)
                    ELSE GREATEST(COALESCE(bc.cb, 0) - {_Q332_D}, 0) / uc.cu
                         + ({_Q332_D} * uc.nfol / uc.cu)
                           * ((COALESCE(pre.npre, 0) + 1) * 1.0
                              / (sc.ntypes + sc.v))
               END) AS nll_kn
  FROM te
  LEFT JOIN bc ON bc.w1 = te.w1 AND bc.w2 = te.w2
  LEFT JOIN uc ON uc.w1 = te.w1
  LEFT JOIN pre ON pre.w2 = te.w2
  CROSS JOIN sc
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         AVG(nll_add1) AS m1, AVG(nll_kn) AS m2
  FROM scored
)
SELECT model, n_bigrams, mean_nll_bits, ppl FROM (
  SELECT 'add1' AS model, n_bigrams,
         ROUND(m1, 4) AS mean_nll_bits, ROUND(POW(2, m1), 4) AS ppl
  FROM agg
  UNION ALL
  SELECT 'kneser_ney', n_bigrams, ROUND(m2, 4), ROUND(POW(2, m2), 4)
  FROM agg
)
ORDER BY model
"""


@register(
    "q332_lm_holdout",
    _Q332_SQL,
    doc=(
        "held-out language-model comparison — the model-selection "
        "readout behind q222/q307: add-1 and interpolated Kneser-Ney "
        "(D=0.75, add-1-smoothed continuation floor so both stay "
        "proper on the open vocabulary) train on the 80% id-hash "
        "split and score the SAME 20% held-out bigrams; output is "
        "mean NLL bits + perplexity per model.  One train bigram-type "
        "rollup feeds all count tables (materialized once), held-out "
        "bigrams score via three vocabulary-keyed left joins + one "
        "broadcast scalar frame, both models in ONE pass (the scored "
        "frame is aggregated once; model rows unpivot from the 1-row "
        "aggregate).  Honest fixture answer: a TIE (~4.93 bits both, "
        "within 0.002) — the synthetic near-uniform vocabulary has no "
        "burstiness for continuation probabilities to exploit; on "
        "natural corpora ('San Francisco') KN wins, which is exactly "
        "what this readout exists to measure"
    ),
    tables=("documents",),
)
def q332(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.iterutils import (
        truncate_lineage,
    )
    from osm_changesets_to_parquet_spark.operators.quality import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        F.split("text", " ").alias("tk"),
        (hash_bucket("doc_id", 100) < 80).alias("is_train"),
    ).where(F.size("tk") >= 2)
    big = tk.select(
        "is_train",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - 1),
                lambda i: F.struct(
                    F.element_at("tk", i).alias("w1"),
                    F.element_at("tk", i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("is_train", "bg.w1", "bg.w2")
    bc = truncate_lineage(
        big.where("is_train")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    uc = bc.groupBy("w1").agg(
        F.sum("cb").cast("long").alias("cu"),
        F.count(F.lit(1)).cast("long").alias("nfol"),
    )
    pre = bc.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("npre"))
    sc = (
        bc.agg(F.count(F.lit(1)).cast("long").alias("ntypes"))
        .crossJoin(
            bc.select(F.col("w1").alias("w"))
            .unionAll(bc.select(F.col("w2").alias("w")))
            .agg(F.countDistinct("w").cast("long").alias("v"))
        )
    )
    te = big.where(~F.col("is_train")).select("w1", "w2")
    j = (
        te.join(bc, ["w1", "w2"], "left")
        .join(uc, "w1", "left")
        .join(pre, "w2", "left")
        .crossJoin(F.broadcast(sc))
    )
    pc = (F.coalesce(F.col("npre"), F.lit(0)) + 1) * F.lit(1.0) / (
        F.col("ntypes") + F.col("v")
    )
    nll_add1 = -F.log2(
        (F.coalesce(F.col("cb"), F.lit(0)) + 1)
        * F.lit(1.0)
        / (F.coalesce(F.col("cu"), F.lit(0)) + F.col("v"))
    )
    nll_kn = -F.log2(
        F.when(F.col("cu").isNull(), pc).otherwise(
            F.greatest(
                F.coalesce(F.col("cb"), F.lit(0)) - F.lit(_Q332_D),
                F.lit(0),
            )
            / F.col("cu")
            + (F.lit(_Q332_D) * F.col("nfol") / F.col("cu")) * pc
        )
    )
    agg = j.select(nll_add1.alias("n1"), nll_kn.alias("n2")).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.avg("n1").alias("m1"),
        F.avg("n2").alias("m2"),
    )
    return (
        agg.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("add1").alias("model"),
                        F.col("n_bigrams").alias("n_bigrams"),
                        F.round(F.col("m1"), 4).alias("mean_nll_bits"),
                        F.round(F.pow(F.lit(2), F.col("m1")), 4).alias("ppl"),
                    ),
                    F.struct(
                        F.lit("kneser_ney").alias("model"),
                        F.col("n_bigrams").alias("n_bigrams"),
                        F.round(F.col("m2"), 4).alias("mean_nll_bits"),
                        F.round(F.pow(F.lit(2), F.col("m2")), 4).alias("ppl"),
                    ),
                )
            ).alias("r")
        )
        .select("r.model", "r.n_bigrams", "r.mean_nll_bits", "r.ppl")
        .orderBy("model")
    )


# ---------------------------------------------------------------------------
# q343: greedy decoding from the corpus bigram LM (round 8)
# ---------------------------------------------------------------------------

# The serving half of the LM family (q222/q307/q332 train and score;
# this DECODES): from a deterministic seed word — the corpus's most
# frequent token — follow the argmax next-word distribution for 16
# steps.  Each step is one keyed argmax over the bigram-count table
# (max count, tie-break to the lexicographically smallest word: the
# same composite-argmax-as-aggregation discipline as q257, spelled
# MAX(count)+MIN(word among maxima) so no window ever appears); the
# bigram-type rollup is computed ONCE and reused by all steps.  A
# repeated context re-emits its argmax deterministically, so loops in
# the output are the honest greedy-decoding behavior, not a bug.
_Q343_STEPS = 16


def _q343_step(k: int) -> str:
    prev = f"g{k - 1}"
    return f"""g{k} AS MATERIALIZED (
  SELECT bc.w2 AS w FROM bc, {prev} p
  WHERE bc.w1 = p.w
  ORDER BY bc.cb DESC, bc.w2 LIMIT 1
)"""


_Q343_SQL = f"""
WITH tok AS (SELECT string_split(text, ' ') AS tk FROM documents),
uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(tk) AS w FROM tok) GROUP BY w
),
bc AS MATERIALIZED (
  SELECT tk[i] AS w1, tk[i + 1] AS w2, CAST(COUNT(*) AS BIGINT) AS cb
  FROM (SELECT tk, generate_subscripts(tk, 1) AS i FROM tok)
  WHERE i < len(tk)
  GROUP BY 1, 2
),
g0 AS MATERIALIZED (SELECT w FROM uni ORDER BY c DESC, w LIMIT 1),
{", ".join(_q343_step(k) for k in range(1, _Q343_STEPS + 1))}
SELECT step, word FROM (
  {" UNION ALL ".join(
      f"SELECT {k} AS step, (SELECT w FROM g{k}) AS word"
      for k in range(_Q343_STEPS + 1)
  )}
)
ORDER BY step
"""


@register(
    "q343_greedy_decode",
    _Q343_SQL,
    doc=(
        "greedy decoding from the corpus bigram LM — the SERVING half "
        "of the LM family (q222/q307/q332 train and score; this "
        f"generates): from the most frequent token, {_Q343_STEPS} "
        "argmax next-word steps over the ONCE-computed bigram-type "
        "rollup, each step one keyed TakeOrdered argmax (max count, "
        "lexicographic tie-break — the q257 composite-argmax "
        "discipline, no windows); repeated contexts re-emit their "
        "argmax, so output loops are honest greedy behavior.  The "
        "corpus reduces to the vocabulary-keyed bigram table before "
        "any step; each step touches one context's candidate rows"
    ),
    tables=("documents",),
)
def q343(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.iterutils import (
        truncate_lineage,
    )

    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(F.split("text", " ").alias("tk"))
    uni = (
        tk.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    big = tk.where(F.size("tk") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - 1),
                lambda i: F.struct(
                    F.element_at("tk", i).alias("w1"),
                    F.element_at("tk", i + 1).alias("w2"),
                ),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bc = truncate_lineage(
        big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    seed = uni.orderBy(F.desc("c"), "w").limit(1).first().w
    words = [seed]
    cur = seed
    for _ in range(_Q343_STEPS):
        # bounded driver collect: ONE (step, word) row per step — the
        # argmax itself is a distributed TakeOrdered over bc
        row = (
            bc.where(F.col("w1") == cur)
            .orderBy(F.desc("cb"), "w2")
            .limit(1)
            .first()
        )
        if row is None:
            # dead-end context: the oracle's step CTEs go empty and
            # every later word is NULL — mirror that
            words.extend([None] * (_Q343_STEPS + 1 - len(words)))
            break
        cur = row.w2
        words.append(cur)
    structs = [
        F.struct(
            F.lit(i).cast("int").alias("step"),
            F.lit(w).cast("string").alias("word")
        )
        for i, w in enumerate(words)
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("r"))
        .select("r.step", "r.word")
        .orderBy("step")
    )
