"""Declarative data-quality constraint checking (Deequ-style, minimal).

A 100 TB ingest without validation ships silent corruption downstream;
the standard tool shape (AWS Deequ, Great Expectations — public
designs) is a declarative constraint list compiled into as few passes
over the data as possible.  This module keeps that compilation
discipline:

- all ROW-LEVEL checks on a table (not-null, range, set-membership,
  custom predicate) fuse into ONE aggregate over ONE scan — each check
  is a ``count(CASE WHEN violated)`` column, whole-stage codegen, no
  extra passes;
- UNIQUENESS is its own aggregate (count - count(distinct key) needs a
  distinct);
- REFERENTIAL integrity is a left-anti join against the DISTINCT
  reference keys (the dimension side reduces before the join and
  broadcasts when small).

Output: one row per constraint — (check_name, n_violations, pass) — a
table you can gate a pipeline on or append to a run-history log.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return (f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo: float, hi: float) -> tuple[str, Column]:
    c = F.col(col)
    return (
        f"in_range({col},{lo},{hi})",
        c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi)),
    )


def in_set(col: str, values: list) -> tuple[str, Column]:
    c = F.col(col)
    return (f"in_set({col})", c.isNull() | ~c.isin(values))


def satisfies(name: str, violated: Column) -> tuple[str, Column]:
    """Custom row-level predicate; ``violated`` is TRUE on bad rows."""
    return (name, violated)


def check_constraints(
    df: DataFrame,
    row_checks: list[tuple[str, Column]] = (),
    unique: list[str] | None = None,
    foreign_keys: list[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Compile constraints into a (check_name, n_violations, pass) table.

    ``row_checks``: (name, violated-predicate) pairs — ONE fused scan.
    ``unique``: column list that must be a unique key.
    ``foreign_keys``: (fk_col, ref_df, ref_col) triples — each an
    anti-join against the distinct reference keys.
    """
    parts: list[DataFrame] = []
    if row_checks:
        aggs = [
            F.count(F.when(violated, F.lit(1))).alias(name)
            for name, violated in row_checks
        ]
        wide = df.agg(*aggs)
        names = [name for name, _ in row_checks]
        parts.append(
            wide.selectExpr(
                f"stack({len(names)}, "
                + ", ".join(f"'{n}', `{n}`" for n in names)
                + ") AS (check_name, n_violations)"
            )
        )
    if unique:
        key = ", ".join(unique)
        parts.append(
            df.groupBy(*unique)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(
                F.lit(f"unique({key})").alias("check_name"),
                F.sum(F.col("__c") - F.lit(1)).cast("long").alias("n_violations"),
            )
        )
    for fk_col, ref_df, ref_col in foreign_keys:
        refs = ref_df.select(F.col(ref_col).alias(fk_col)).distinct()
        parts.append(
            df.select(fk_col)
            .where(F.col(fk_col).isNotNull())
            .join(refs, fk_col, "left_anti")
            .agg(
                F.lit(f"foreign_key({fk_col})").alias("check_name"),
                F.count(F.lit(1)).alias("n_violations"),
            )
        )
    if not parts:
        raise ValueError("no constraints given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check_name",
        F.coalesce(F.col("n_violations"), F.lit(0)).cast("long").alias("n_violations"),
        (F.coalesce(F.col("n_violations"), F.lit(0)) == 0).alias("pass"),
    )
