"""Approximate-nearest-neighbor queries A51-A52 (north star: similarity
search scale path; baseline exact top-k is q36_cosine_topk).

Both are approximate — their candidate sets depend on hash planes /
centroid geometry that ANSI SQL cannot reproduce, so they register
without an oracle (driver does the rows-only check; the H-mode anchor
is q36, and ``tests/test_ann.py`` asserts recall against it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.catalog import load_table
from osm_changesets_to_parquet_spark.operators.similarity import (
    ivf_build,
    ivf_topk,
    lsh_topk,
)
from osm_changesets_to_parquet_spark.queries import register

DIM = 64


@register(
    "a51_lsh_ann_topk",
    None,
    doc="SRP-LSH bucketed ANN top-10: bucket-join prunes the scan to "
    "~n_tables/2^bits of the corpus; exact rerank on candidates only",
    tables=("embeddings",),
)
def a51(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return lsh_topk(emb, query, k=10, dim=DIM, bits=4, n_tables=8)


@register(
    "a52_ivf_ann_topk",
    None,
    doc="IVF ANN top-10: 16-cell inverted file (1 distributed Lloyd "
    "step), probe 6 cells, exact rerank — partition-pruned scan at scale",
    tables=("embeddings",),
)
def a52(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_build(emb, n_cells=16)
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    return ivf_topk(assigned, centroids, qvec, k=10, nprobe=6)
