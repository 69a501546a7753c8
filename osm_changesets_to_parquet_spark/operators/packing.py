"""Sequence packing: assign documents to fixed token-budget bins by
concatenate-then-chunk order (the standard pretraining packing layout:
documents are concatenated in a stable order and the stream is cut
every ``budget`` tokens; a document belongs to the chunk containing its
first token).

The core primitive is a GLOBAL running sum in a stable order — the
classic Spark scale trap, because the obvious spelling
(``Window.orderBy(...)`` with no partition key) collapses the whole
table into ONE task.  ``global_cumsum`` here is the two-pass spelling
that stays distributed:

1. range-repartition by the order key (so partition i holds a
   contiguous key range, all ranges in order);
2. per-partition running sum via a window PARTITIONED by the physical
   partition id (parallel, no global collapse);
3. per-partition totals (one tiny row per partition) are prefix-summed
   on a single small frame and broadcast back as offsets.

The result is independent of where the range boundaries land, so the
output is deterministic even though the partitioner samples.  Work is
O(n) with two narrow shuffles (range exchange + |partitions|-row agg);
nothing ever funnels through a single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    exclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Running sum of ``value_col`` in global ``order_col`` order,
    computed without a single-task global window (see module doc).

    ``exclusive=True`` returns the sum of *strictly preceding* rows
    (the first row gets 0).  ``order_col`` must be globally unique —
    it is the total order that defines "preceding".
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    in_part = Window.partitionBy("__pid").orderBy(order_col)
    local = ranged.withColumn("__local", F.sum(value_col).over(in_part))
    totals = (
        local.groupBy("__pid").agg(F.sum(value_col).alias("__tot"))
    )
    # prefix-sum the per-partition totals: |partitions| rows — windowing
    # this tiny frame globally is fine (it IS small by construction)
    off = totals.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__tot").over(
                Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("__pid", "__offset")
    shift = F.col(value_col) if exclusive else F.lit(0)
    return (
        local.join(F.broadcast(off), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__offset") - shift))
        .drop("__pid", "__local", "__offset")
    )


def pack_into_bins(
    docs: DataFrame,
    budget: int,
    token_col: str,
    order_col: str = "doc_id",
    bin_col: str = "bin",
) -> DataFrame:
    """Concatenate-then-chunk packing: bin = floor(exclusive-cumsum /
    budget) — the chunk that contains the document's first token."""
    cum = global_cumsum(
        docs, order_col, token_col, out_col="__cumx", exclusive=True
    )
    return cum.withColumn(
        bin_col, F.floor(F.col("__cumx") / F.lit(budget)).cast("long")
    ).drop("__cumx")
