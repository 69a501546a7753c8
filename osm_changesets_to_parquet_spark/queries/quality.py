"""Corpus-curation queries Q86-Q93: benchmark decontamination,
repetition filters, stratified / rebalanced sampling, template
extraction, and adaptive length filtering.

The filter stages of a pretraining-data pipeline, downstream of dedup
(q34/q35) and upstream of the split/profile queries (q69-q72).  Every
query is oracle-backed; the sampling queries share the multiplicative
id-hash discipline of queries.curation (reproducible across engines,
partitionings, and appends).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.catalog import load_table
from osm_changesets_to_parquet_spark.operators import quality as QL
from osm_changesets_to_parquet_spark.operators import sketches as SK
from osm_changesets_to_parquet_spark.operators.dedup import HASH_MOD
from osm_changesets_to_parquet_spark.queries import register
from osm_changesets_to_parquet_spark.queries.dedup_sim import _sql_charhash

_K = QL.KNUTH
_P = HASH_MOD


# ---------------------------------------------------------------------------
# Q86: n-gram decontamination (train vs held-out eval split)
# ---------------------------------------------------------------------------

_Q86_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, (doc_id * {_K}) % 100 AS b, string_split(text, ' ') AS w
  FROM documents
),
ng AS (
  SELECT doc_id, b,
         unnest(list_transform(range(1, len(w) - 6),
                               i -> array_to_string(w[i:i+7], ' '))) AS g
  FROM t
),
ev AS (SELECT DISTINCT g FROM ng WHERE b >= 98),
contam AS (
  SELECT DISTINCT doc_id FROM ng
  WHERE b < 98 AND g IN (SELECT g FROM ev)
)
SELECT lang,
       COUNT(*) AS n_train,
       CAST(COUNT(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM contam)) AS BIGINT)
         AS n_contaminated
FROM t WHERE b < 98
GROUP BY lang ORDER BY lang
"""


@register(
    "q86_ngram_decontaminate",
    _Q86_SQL,
    doc=(
        "benchmark decontamination: flag train docs sharing any word "
        "8-gram with the 2% eval split; n-grams built in-row (no "
        "shuffle), semi-join keyed on xxhash64(ngram) (8-byte shuffle "
        "keys), eval side reduced to DISTINCT hashes first"
    ),
    tables=("documents",),
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = QL.hash_bucket("doc_id", 100)
    train = docs.where(b < 98)
    eval_df = docs.where(b >= 98)
    contam = QL.decontaminate(train, eval_df, n=8).withColumn("__c", F.lit(1))
    return (
        train.join(contam, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.count("__c").alias("n_contaminated"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Q87: in-row repetition metrics (Gopher-style duplicate-word filter)
# ---------------------------------------------------------------------------

_Q87_SQL = """
WITH m AS (
  SELECT lang,
         ROUND(1 - len(list_distinct(string_split(text, ' ')))
                   / len(string_split(text, ' ')), 6) AS dup_frac
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       ROUND(AVG(dup_frac), 4) AS avg_dup_frac,
       ROUND(MAX(dup_frac), 6) AS max_dup_frac,
       CAST(COUNT(*) FILTER (WHERE dup_frac > 0.5) AS BIGINT) AS n_repetitive
FROM m GROUP BY lang ORDER BY lang
"""


@register(
    "q87_repetition_filter",
    _Q87_SQL,
    doc=(
        "repetition quality signal: duplicate-word fraction computed "
        "inside the row (array_distinct/size folds — zero shuffle "
        "before the per-lang rollup); counts docs over the 0.5 "
        "repetition threshold"
    ),
    tables=("documents",),
)
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    m = QL.repetition_metrics(docs)
    return (
        m.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("dup_word_frac"), 4).alias("avg_dup_frac"),
            F.round(F.max("dup_word_frac"), 6).alias("max_dup_frac"),
            F.count_if(F.col("dup_word_frac") > 0.5).alias("n_repetitive"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Q88: top-word dominance histogram (explode -> two-level agg)
# ---------------------------------------------------------------------------

_Q88_SQL = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
),
pw AS (SELECT doc_id, lang, w, COUNT(*) AS c FROM tok GROUP BY 1, 2, 3),
dom AS (
  SELECT doc_id, lang, ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS f
  FROM pw GROUP BY 1, 2
)
SELECT lang, CAST(FLOOR(f * 10) AS INT) AS decile, COUNT(*) AS n_docs
FROM dom GROUP BY 1, 2 ORDER BY lang, decile
"""


@register(
    "q88_top_word_dominance",
    _Q88_SQL,
    doc=(
        "most-frequent-word share per doc, bucketed into deciles per "
        "lang: explode -> (doc, word) count -> per-doc max/sum; both "
        "aggs take map-side partials, second shuffle keyed on doc_id "
        "(uniform)"
    ),
    tables=("documents",),
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    dom = QL.top_word_dominance(docs, keep=["lang"])
    return (
        dom.select(
            "lang",
            F.floor(F.col("top_word_frac") * 10).cast("int").alias("decile"),
        )
        .groupBy("lang", "decile")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "decile")
    )


# ---------------------------------------------------------------------------
# Q89: stratified sampling with per-stratum rates
# ---------------------------------------------------------------------------

_RATES = {"en": 50, "de": 30}
_DEFAULT_RATE = 10

_Q89_SQL = f"""
SELECT lang,
       COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE (doc_id * {_K}) % 100 <
      CASE lang WHEN 'en' THEN {_RATES['en']} WHEN 'de' THEN {_RATES['de']}
                ELSE {_DEFAULT_RATE} END
GROUP BY lang ORDER BY lang
"""


@register(
    "q89_stratified_sample",
    _Q89_SQL,
    doc=(
        "per-stratum deterministic sampling (en 50%, de 30%, rest "
        "10%): rate lookup is a literal CASE chain, membership is "
        "id-hash arithmetic — the whole predicate evaluates in the "
        "scan stage, zero shuffle, stable under appends"
    ),
    tables=("documents",),
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    kept = QL.stratified_sample(docs, "lang", _RATES, _DEFAULT_RATE)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Q90: source rebalancing (cap any source at 4% of the corpus)
# ---------------------------------------------------------------------------

_Q90_SQL = f"""
WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
r AS (
  SELECT source, n_docs,
         LEAST(1000, FLOOR(1000.0 * FLOOR(SUM(n_docs) OVER () * 40 / 1000)
                           / n_docs)) AS rate
  FROM c
),
k AS (
  SELECT d.source, COUNT(*) AS n_kept
  FROM documents d JOIN r USING (source)
  WHERE (d.doc_id * {_K}) % 1000 < r.rate
  GROUP BY d.source
)
SELECT r.source, r.n_docs, CAST(r.rate AS BIGINT) AS rate_permille,
       COALESCE(k.n_kept, 0) AS n_kept
FROM r LEFT JOIN k USING (source)
ORDER BY source
"""


@register(
    "q90_rebalance_sources",
    _Q90_SQL,
    doc=(
        "domain-mixture rebalancing: cap each source at 40 permille of "
        "the corpus via deterministic downsampling; the rate table is "
        "|sources| rows and broadcasts back — the corpus shuffles once "
        "(the per-source count)"
    ),
    tables=("documents",),
)
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return QL.rebalance_sources(docs, max_share_permille=40).orderBy("source")


# ---------------------------------------------------------------------------
# Q91: template extraction (digit-run masking over JSON props)
# ---------------------------------------------------------------------------

_Q91_SQL = """
SELECT event_type,
       regexp_replace(props, '[0-9]+', '#', 'g') AS template,
       COUNT(*) AS cnt,
       ROUND(MIN(value), 4) AS min_v,
       ROUND(MAX(value), 4) AS max_v
FROM events
GROUP BY 1, 2 ORDER BY event_type, template
"""


@register(
    "q91_props_template",
    _Q91_SQL,
    doc=(
        "log-template extraction: mask digit runs in the JSON props "
        "payload (regexp_replace, JVM-side) and aggregate per "
        "(event_type, template); min/max are order-independent so the "
        "double columns hash-match exactly"
    ),
    tables=("events",),
)
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.regexp_replace("props", "[0-9]+", "#").alias("template"),
            "value",
        )
        .groupBy("event_type", "template")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.min("value"), 4).alias("min_v"),
            F.round(F.max("value"), 4).alias("max_v"),
        )
        .orderBy("event_type", "template")
    )


# ---------------------------------------------------------------------------
# Q92: Bloom pre-filter over a composite string key
# ---------------------------------------------------------------------------

_COMPOSITE = (
    "concat_ws('|', COALESCE(CAST(lang AS VARCHAR), chr(0)), "
    "COALESCE(CAST(source AS VARCHAR), chr(0)))"
)
_Q92_ARMS = " UNION ALL ".join(
    f"SELECT (({a} * h + {b}) % {_P}) % {SK.BLOOM_BITS} AS bit FROM kh"
    for a, b in zip(SK.BLOOM_A, SK.BLOOM_B)
)
_Q92_COND = " AND ".join(
    f"(({a} * h + {b}) % {_P}) % {SK.BLOOM_BITS} IN (SELECT bit FROM bloom)"
    for a, b in zip(SK.BLOOM_A, SK.BLOOM_B)
)

_Q92_SQL = f"""
WITH keys AS (
  SELECT DISTINCT lang, source FROM documents WHERE n_chars > 300
),
kh AS (SELECT {_sql_charhash(_COMPOSITE)} AS h FROM keys),
bloom AS (SELECT DISTINCT bit FROM ({_Q92_ARMS})),
ph AS (SELECT doc_id, lang, source, {_sql_charhash(_COMPOSITE)} AS h FROM documents),
passed AS (SELECT doc_id FROM ph WHERE {_Q92_COND}),
truth AS (
  SELECT doc_id FROM documents
  WHERE (lang, source) IN (SELECT (lang, source) FROM keys)
)
SELECT (SELECT COUNT(*) FROM passed) AS n_bloom_pass,
       (SELECT COUNT(*) FROM truth) AS n_true_match,
       (SELECT COUNT(*) FROM documents) AS n_probe_rows
"""


@register(
    "q92_bloom_composite_key",
    _Q92_SQL,
    doc=(
        "Bloom semi-join pre-filter over a composite (lang, source) "
        "string key: both sides fold the null-safe '|'-joined key "
        "through the portable char hash; every bit hash-matched vs the "
        "SQL-built filter"
    ),
    tables=("documents",),
)
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keys = docs.where(F.col("n_chars") > 300).select("lang", "source").distinct()
    bloom = SK.bloom_build(keys, ["lang", "source"])
    probe = docs.select("doc_id", "lang", "source")
    passed = SK.bloom_prefilter(probe, bloom, ["lang", "source"])
    truth = probe.join(keys, ["lang", "source"], "left_semi")
    return (
        passed.agg(F.count(F.lit(1)).alias("n_bloom_pass"))
        .crossJoin(truth.agg(F.count(F.lit(1)).alias("n_true_match")))
        .crossJoin(docs.agg(F.count(F.lit(1)).alias("n_probe_rows")))
    )


# ---------------------------------------------------------------------------
# Q93: adaptive length filter (exact percentile bounds, second pass)
# ---------------------------------------------------------------------------

_Q93_SQL = """
WITH b AS (
  SELECT quantile_cont(n_chars, 0.05) AS lo, quantile_cont(n_chars, 0.95) AS hi
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       ROUND((SELECT lo FROM b), 4) AS lo,
       ROUND((SELECT hi FROM b), 4) AS hi
FROM documents
WHERE n_chars >= (SELECT lo FROM b) AND n_chars <= (SELECT hi FROM b)
GROUP BY lang ORDER BY lang
"""


@register(
    "q93_adaptive_length_filter",
    _Q93_SQL,
    doc=(
        "two-pass adaptive filter: exact p5/p95 length percentiles "
        "(linear interpolation — identical definition in both "
        "engines), broadcast back as scalars, re-scan with the bounds "
        "predicate; the second scan's filter needs no shuffle"
    ),
    tables=("documents",),
)
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.expr("percentile(n_chars, 0.05)").alias("lo"),
        F.expr("percentile(n_chars, 0.95)").alias("hi"),
    )
    return (
        docs.crossJoin(F.broadcast(bounds))
        .where((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.first("lo"), 4).alias("lo"),
            F.round(F.first("hi"), 4).alias("hi"),
        )
        .orderBy("lang")
    )
