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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Join ``big`` with ``small`` on equi-keys ``on``, salted ``n_salts`` ways.

    ``salt_source``: a big-side column whose hash spreads the hot key
    (defaults to the first non-key column, falling back to the key).
    Result is row-identical to ``big.join(small, on, how)`` for inner
    and left joins (small-side rows with no match are replicated salt
    copies and vanish in both).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    non_key = [c for c in big.columns if c not in on]
    src = salt_source or (non_key[0] if non_key else on[0])
    big_s = big.withColumn(
        "__salt", F.pmod(F.hash(F.col(src)), F.lit(n_salts)).cast("int")
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, on + ["__salt"], how).drop("__salt")
