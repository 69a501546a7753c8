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
