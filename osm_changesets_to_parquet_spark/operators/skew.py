"""Skew-handling join: deterministic salting.

AQE's skew-join split (enabled in session.py) handles moderate skew at
runtime by splitting oversized sort-merge partitions.  For *extreme*
hot keys — the OSM power-user problem: one `user` owning a double-digit
percentage of all changesets — pre-salting is the explicit fix: the big
side's hot key is scattered across ``n_salts`` sub-keys, and the small
side is replicated ``n_salts`` times, so no single task ever owns a
whole hot key.

Salting is deterministic (hash of the big side's row content, not a
random number): the same input always produces the same partitioning,
so runs are reproducible and the operator is oracle-testable.

Cost model: small side is replicated n_salts x (only acceptable because
it is small); big side gets one extra int column.  Use when one key
exceeds what a single task should hold; otherwise let AQE handle it.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def auto_salt_count(
    big: DataFrame, on: list[str], num_partitions: int | None = None
) -> int:
    """Derive the salt count from the PROFILED skew of ``on`` in ``big``
    (the q133 profiler's statistic, turned into a knob): the hottest
    key should spread across enough sub-keys that no task holds more
    than one balanced task's share of rows —

        n_salts = ceil(max_key_count / (total_rows / parallelism))

    clamped to [1, parallelism].  A uniform key profile yields 1 (no
    salting — don't pay the small-side replication when AQE alone
    copes); a key owning the whole table yields ``parallelism``.

    Cost: one map-side-partial count aggregate over the big side — a
    driver ACTION at construction time (the global_cumsum pattern);
    amortize by profiling once per dataset, not per join.
    """
    parts = num_partitions or big.sparkSession.sparkContext.defaultParallelism
    row = (
        big.groupBy(*on)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("max_c"), F.sum("c").alias("tot"))
        .first()
    )
    if row is None or row.max_c is None:
        return 1
    per_task = max(1.0, float(row.tot) / parts)
    return int(min(parts, max(1, math.ceil(float(row.max_c) / per_task))))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int | str = 8,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Join ``big`` with ``small`` on equi-keys ``on``, salted ``n_salts`` ways.

    ``n_salts="auto"`` derives the count from the measured key skew via
    :func:`auto_salt_count` (one profiling aggregate over the big side).

    ``salt_source``: a big-side column whose hash spreads the hot key
    (defaults to the first non-key column, falling back to the key).
    Result is row-identical to ``big.join(small, on, how)`` for inner
    and left joins (small-side rows with no match are replicated salt
    copies and vanish in both).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    if n_salts == "auto":
        n_salts = auto_salt_count(big, on)
    # bool is an int subclass: n_salts=True would silently mean 1 salt
    if isinstance(n_salts, bool) or not isinstance(n_salts, int) or n_salts < 1:
        raise ValueError("n_salts must be a positive int or 'auto'")
    non_key = [c for c in big.columns if c not in on]
    src = salt_source or (non_key[0] if non_key else on[0])
    big_s = big.withColumn(
        "__salt", F.pmod(F.hash(F.col(src)), F.lit(n_salts)).cast("int")
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, on + ["__salt"], how).drop("__salt")
