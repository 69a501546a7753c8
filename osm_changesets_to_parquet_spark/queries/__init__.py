"""Declared query surface (SURVEY.md §2.B) — the executable contract.

Each :class:`QuerySpec` pairs a Spark implementation (a callable taking
``(spark, sf_dir)`` and returning a DataFrame) with the ANSI-SQL oracle
string DuckDB runs on the same parquet tables.  The driver hash-matches
the two at sf0.01 (CORRECTNESS_r{N}.json); ``tests/test_oracle_parity.py``
runs the same comparison locally at sf0.001.

Determinism discipline (SURVEY.md §2.B rules 1-5):
- every query's output has a unique total order key (for LIMIT queries,
  the ORDER BY is total);
- every floating aggregate is ROUND()ed, with the rounding applied to
  the *same* double on both sides;
- time arithmetic is over integer epoch micros (``events.ts`` is
  TIMESTAMP(NANOS) parquet; Spark truncates to micros, DuckDB keeps ns —
  integer micros is the shared domain);
- column names are aliased identically on both sides (the driver sorts
  columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => driver does a weaker rows-only check
    doc: str = ""
    tables: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tables: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tables=tables)
        return fn

    return deco


def load_all_modules() -> None:
    """Import every query module so REGISTRY is fully populated."""
    from osm_changesets_to_parquet_spark.queries import (  # noqa: F401
        ann,
        conversion,
        dedup_sim,
        llm_ops,
        multimodal,
        relational,
        relational_ext,
        sources_roundtrip,
        streaming_jobs,
        udfs,
        windows_streaming,
    )


def queries() -> dict[str, QueryFn]:
    load_all_modules()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    load_all_modules()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
