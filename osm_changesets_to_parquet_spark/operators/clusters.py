"""Near-duplicate cluster resolution: connected components over
candidate pairs, and canonical-representative selection.

The missing last step of every dedup pipeline: pair generation
(MinHash-LSH, SimHash, embedding-LSH — operators.dedup / .similarity)
emits *edges*; keeping one document per near-dup group needs the
*components* of that graph and a deterministic representative per
component (here: the minimum doc id).

Algorithm: iterative min-label propagation on the undirected edge set.
Each iteration is one shuffle (groupBy node id of the label+neighbor
union); labels monotonically decrease to the component minimum, so the
loop converges in O(graph diameter) iterations.  Near-dup graphs are
shallow (components are cliques-ish around shared buckets), so the
diameter is small in practice.  Per-iteration lineage is truncated with
:func:`operators.iterutils.truncate_lineage` — without it the plan
doubles every iteration; with a configured checkpoint dir the cut is a
reliable checkpoint (executor-loss-recoverable at 100 TB).

At 100 TB: every step is a keyed DataFrame op (no driver-side graph);
the driver holds only the converged/changed counter.  For adversarial
long-chain graphs swap the step for the alternating small-star /
large-star rounds of Kiveris et al. "Connected Components in MapReduce"
(O(log n) rounds) — same join/groupBy primitives, same storage shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.operators.iterutils import truncate_lineage


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """Resolve components of the undirected pair graph.

    Returns (id, cluster_id) for every node appearing in ``pairs``,
    where ``cluster_id`` is the smallest node id in the component.
    Deterministic for any edge order.
    """
    edges = pairs.select(
        F.col(src_col).cast("long").alias("src"), F.col(dst_col).cast("long").alias("dst")
    )
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = truncate_lineage(edges)

    labels = truncate_lineage(
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )

    for _ in range(max_iters):
        nbr = (
            edges.join(labels, edges.dst == labels.id)
            .select(F.col("src").alias("id"), F.col("label"))
        )
        new_labels = truncate_lineage(
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonical_docs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup verdict per document: (doc_id, cluster_id, keep).

    Documents in no pair form their own singleton cluster and are kept;
    in each near-dup component only the minimum doc id is kept.
    """
    comp = connected_components(pairs).withColumnRenamed("id", id_col)
    return (
        docs.select(id_col)
        .join(comp, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("label"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )
