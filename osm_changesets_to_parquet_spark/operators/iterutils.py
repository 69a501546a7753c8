"""Lineage control for iterative DataFrame chains (connected
components, PageRank, Lloyd iterations, shingle indexes).

Iterative algorithms double their logical plan every round unless the
lineage is cut.  Two ways to cut it, with different fault-tolerance:

- ``checkpoint()`` (reliable): writes the partitions to the configured
  checkpoint directory (HDFS/S3 on a real cluster).  An executor loss
  recomputes from the checkpoint — the right choice for long chains
  over 100 TB, at the price of a distributed write per cut.
- ``localCheckpoint()``: eager, executor-local block storage,
  unreplicated.  Fast (no remote write) but an executor loss makes the
  job fail instead of recover, and materialization happens at
  *operator-construction* time.

:func:`truncate_lineage` picks reliable checkpointing whenever the
session has a checkpoint dir configured (``spark.sparkContext.
setCheckpointDir(...)`` — the production setting) and falls back to
``localCheckpoint`` otherwise (local mode, tests), so operators written
against it get cluster-grade fault tolerance by configuration, not by
code change.

Storage hygiene: checkpoint files are only deleted when their RDD is
GC'd AND ``spark.cleaner.referenceTracking.cleanCheckpoints`` is true —
session.get_spark sets it, so a 20-iteration loop does not retain 20
dataset copies for the application lifetime.  Sessions built elsewhere
should set the same conf before configuring a checkpoint dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Cut the plan lineage of ``df``; see module docstring for policy."""
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc.getCheckpointDir() is not None
    except Exception:  # very old API fallback — treat as unset
        has_dir = False
    if has_dir:
        return df.checkpoint(eager=True)
    return df.localCheckpoint()
