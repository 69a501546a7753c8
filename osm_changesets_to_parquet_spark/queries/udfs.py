"""UDF / UDAF / UDTF surface U1-U4 (SURVEY.md §2.B).

UDFs are the engine's slow path by policy: everything here is either
Arrow-vectorized (``pandas_udf``, ``applyInPandas``, grouped-agg
``pandas_udf``) or a UDTF — never row-at-a-time Python.  Each has a
pure-SQL oracle spelling, which doubles as documentation of exactly what
the Python computes.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from osm_changesets_to_parquet_spark.catalog import load_table
from osm_changesets_to_parquet_spark.queries import register


def _normalize_text_udf():
    @pandas_udf("string")
    def normalize_text(s: pd.Series) -> pd.Series:
        """lower + collapse whitespace + trim (Arrow-vectorized)."""
        return s.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()

    return normalize_text


@register(
    "u1_pandas_udf_normalize",
    r"""
    SELECT doc_id,
           TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')) AS norm
    FROM documents ORDER BY doc_id
    """,
    doc="scalar Arrow-vectorized UDF; oracle is the equivalent SQL spelling",
    tables=("documents",),
)
def u1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    normalize_text = _normalize_text_udf()
    return docs.select("doc_id", normalize_text("text").alias("norm")).orderBy("doc_id")


@register(
    "u2_grouped_map_zscore",
    """
    SELECT event_id,
           ROUND((value - AVG(value) OVER w) / STDDEV_SAMP(value) OVER w, 4) AS z
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    ORDER BY event_id
    """,
    doc="applyInPandas grouped-map: per-event-type z-score (sample stddev)",
    tables=("events",),
)
def u2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=1)
        mean = pdf["value"].mean()
        z = ((pdf["value"] - mean) / std).round(4)
        return pd.DataFrame({"event_id": pdf["event_id"], "z": z})

    return (
        ev.groupBy("event_type")
        .applyInPandas(zscore, schema="event_id bigint, z double")
        .orderBy("event_id")
    )


@register(
    "u3_udaf_geomean",
    """
    SELECT l_returnflag, ROUND(EXP(AVG(LN(l_quantity))), 6) AS geo_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="grouped-agg pandas UDF (UDAF): geometric mean",
    tables=("lineitem",),
)
def u3(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(geomean("l_quantity"), 6).alias("geo_qty"))
        .orderBy("l_returnflag")
    )


@register(
    "u4_udtf_tokenize",
    """
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS BIGINT) AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents ORDER BY doc_id, pos
    """,
    doc="Python UDTF: one (pos, token) row per whitespace token, lateral-joined",
    tables=("documents",),
)
def u4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, token: string")
    class SplitTokens:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield (i, tok)

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("u4_documents")
    spark.udtf.register("split_tokens", SplitTokens)
    return spark.sql(
        """
        SELECT doc_id, t.pos, t.token
        FROM u4_documents, LATERAL split_tokens(text) t
        ORDER BY doc_id, pos
        """
    )


@register(
    "u5_arrow_grouped_stats",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 4) AS mean_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
    doc=(
        "grouped-map via applyInArrow (Spark 4): the group arrives as "
        "a pyarrow Table — no pandas materialization, the zero-copy "
        "sibling of u2's applyInPandas; per-lang length stats computed "
        "with pyarrow.compute kernels.  Same Arrow-batch transfer "
        "economics as pandas UDFs, minus the pandas conversion cost — "
        "the right grouped-map API when the logic is columnar"
    ),
    tables=("documents",),
)
def u5(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        chars = tbl.column("n_chars")
        return pa.table(
            {
                "lang": [tbl.column("lang")[0].as_py()],
                "n_docs": [n],
                "mean_chars": [pc.mean(chars).as_py()],
                "max_chars": [pc.max(chars).as_py()],
            }
        )

    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    out = docs.groupBy("lang").applyInArrow(
        stats, schema="lang string, n_docs long, mean_chars double, max_chars long"
    )
    # round JVM-side, not with Python's round(): half-even vs SQL's
    # half-away-from-zero could flip an exact-half mean cross-engine
    return out.select(
        "lang", "n_docs", F.round("mean_chars", 4).alias("mean_chars"), "max_chars"
    ).orderBy("lang")


@register(
    "u6_udtf_analyze_dynamic_schema",
    """
    WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, toks[1] AS t0, toks[2] AS t1, toks[3] AS t2
    FROM s ORDER BY doc_id
    """,
    doc=(
        "POLYMORPHIC Python UDTF (Spark 4 analyze() API): the output "
        "schema — one column per leading token, t0..t{n-1} — is "
        "computed at PLAN time from the literal n argument by the "
        "static analyze() hook, the dynamic-schema half of the UDTF "
        "surface u4 doesn't exercise; rows evaluate lateral per "
        "document, padding short docs with NULLs"
    ),
    tables=("documents",),
)
def u6(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class LeadTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            k = int(n.value)
            return AnalyzeResult(
                StructType(
                    [StructField(f"t{i}", StringType()) for i in range(k)]
                )
            )

        def eval(self, text: str, n: int):
            toks = (text or "").split(" ")
            yield tuple(
                toks[i] if i < len(toks) else None for i in range(n)
            )

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("u6_documents")
    spark.udtf.register("lead_tokens", udtf(LeadTokens))
    return spark.sql(
        """
        SELECT doc_id, t.t0, t.t1, t.t2
        FROM u6_documents, LATERAL lead_tokens(text, 3) t
        ORDER BY doc_id
        """
    )


# ---------------------------------------------------------------------------
# u7: mapInArrow — raw Arrow RecordBatch transform (the last un-witnessed
# vectorized-Python entry point: u1 scalar pandas_udf, u2 grouped-agg,
# u3 applyInPandas, u4/u6 UDTF, u5 applyInArrow, m48-m50 mapInPandas)
# ---------------------------------------------------------------------------

_U7_SQL = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
            AS BIGINT) AS n_upper
FROM documents ORDER BY doc_id
"""


@register(
    "u7_map_in_arrow",
    _U7_SQL,
    doc=(
        "mapInArrow: per-RecordBatch transform computed entirely with "
        "pyarrow.compute kernels (count_substring for the token count "
        "— len(split) == spaces+1 including empties, the DuckDB "
        "string_split identity — and count_substring_regex for the "
        "uppercase tally): zero per-row Python, zero pandas "
        "conversion; the batch stays Arrow end-to-end, which is the "
        "cheapest possible Python execution path Spark offers"
    ),
    tables=("documents",),
)
def u7(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    def counts(batches):
        import pyarrow.compute as pc

        for b in batches:
            text = b.column(b.schema.get_field_index("text"))
            n_tok = pc.add(pc.count_substring(text, " "), 1)
            n_upper = pc.count_substring_regex(text, "[A-Z]")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("doc_id")),
                    pc.cast(n_tok, pa.int64()),
                    pc.cast(n_upper, pa.int64()),
                ],
                names=["doc_id", "n_tok", "n_upper"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        counts, "doc_id long, n_tok long, n_upper long"
    ).orderBy("doc_id")
