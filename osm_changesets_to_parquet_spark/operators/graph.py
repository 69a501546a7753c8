"""Iterative graph propagation: PageRank on a DataFrame edge list.

Companion to operators.clusters (connected components): the weighted
propagation pattern.  Each iteration is one join (ranks onto out-edges)
and one keyed aggregation (sum of incoming mass) — the standard
MapReduce PageRank, with lineage truncated per iteration (see
operators.iterutils — reliable checkpoint when a dir is configured) so
the plan stays constant-size.

Dangling nodes (no out-edges) are handled by redistributing their mass
uniformly — the rank vector keeps summing to 1, so results are
comparable across graphs.  Deterministic: fixed iteration count, no
sampling; the same unrolled arithmetic is expressible in SQL, which is
how the q84 oracle verifies every rank value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.operators.iterutils import truncate_lineage


def pagerank(
    edges: DataFrame,
    n_iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Ranks after exactly ``n_iters`` power iterations from a uniform
    start.  Returns (id, rank).  Edges are directed; duplicates count
    (weighted by multiplicity)."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = truncate_lineage(
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = nodes.count()
    outdeg = truncate_lineage(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    )

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iters):
        contribs = (
            e.join(ranks, e.src == ranks.id)
            .join(outdeg, "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inmass"))
        )
        # dangling mass: rank held by nodes with no out-edges
        dangling = (
            ranks.join(outdeg, ranks.id == outdeg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = truncate_lineage(
            nodes.join(contribs, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inmass"), F.lit(0.0)) + F.col("dm") / F.lit(n))
                ).alias("rank"),
            )
        )
    return ranks
