"""MERGE INTO emulation on plain parquet tables (no Delta/Iceberg).

An evolving 100 TB dataset needs upserts; without a table format with
ACID merge, the standard emulation is:

    merged = base ANTI-JOIN updates ON key   (keep unmatched base rows)
             UNION ALL updates               (matched rows replaced,
                                              new rows inserted)

plus, for SCD2 history, window versioning over the union.  Both are
pure Catalyst plans: one keyed anti-join (the only shuffle of base) and
a union — no driver involvement, rewrite cost O(base + updates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(base: DataFrame, updates: DataFrame, key: str | list[str]) -> DataFrame:
    """Last-writer-wins merge: update rows replace base rows with the
    same key; unmatched update rows are inserts.  Columns must match."""
    keys = [key] if isinstance(key, str) else list(key)
    kept = base.join(updates.select(*keys), keys, "left_anti")
    return kept.unionByName(updates)


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    key: str | list[str],
    ts_col: str,
    current_flag: str = "is_current",
    valid_to: str = "valid_to_us",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out current versions that
    a change supersedes, append the new versions as current.

    ``history`` carries (key..., attributes..., ts_col, valid_to,
    current_flag); ``changes`` carries (key..., attributes..., ts_col).
    A closed version's ``valid_to`` is its successor's ``ts_col``; the
    newest version per key is current with valid_to null.  One window
    over (key, ts) — a single shuffle on key.

    Ties on ``ts_col`` are deterministic: a change carrying the same
    timestamp as an existing version (e.g. a reprocessed feed) ranks
    AFTER history, so the incoming row wins the current flag and the
    historical row is closed — lead() never flips between runs.
    """
    keys = [key] if isinstance(key, str) else list(key)
    incoming = changes.withColumn(valid_to, F.lit(None).cast("long")).withColumn(
        current_flag, F.lit(True)
    )
    # __src: 0 = history, 1 = incoming — the equal-ts tie-breaker.
    all_rows = history.withColumn("__src", F.lit(0)).unionByName(
        incoming.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(), F.col("__src").asc())
    nxt = F.lead(ts_col).over(w)
    return (
        all_rows.withColumn(valid_to, nxt)
        .withColumn(current_flag, nxt.isNull())
        .drop("__src")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Change-data-capture between two table snapshots.

    Full outer join on the key; every non-key column is compared
    null-safely.  Output = key columns + ``old_<c>`` / ``new_<c>`` for
    each compared column + ``change_type`` in {added, removed, changed,
    unchanged}.

    Scale: ONE co-partitioned full-outer shuffle on the key (both sides
    hash-partition identically, AQE handles skew); comparison is
    whole-stage-codegen null-safe equality, no UDFs.  At 100 TB this is
    the standard snapshot-reconciliation plan when no table format
    provides a changelog; if snapshots are bucketed on the key
    (see q111) even that shuffle disappears.
    """
    keys = [key] if isinstance(key, str) else list(key)
    o = old.select(
        *keys, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("__in_old", F.lit(1))
    n = new.select(
        *keys, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("__in_new", F.lit(1))
    j = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.withColumn("change_type", change).drop("__in_old", "__in_new")
