"""Every registered query must hash-match its DuckDB oracle at sf0.001
(the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from osm_changesets_to_parquet_spark import queries as Q
from tests.oracle_utils import compare

Q.load_all_modules()
ORACLE_QUERIES = sorted(
    name for name, spec in Q.REGISTRY.items() if spec.oracle is not None
)
NO_ORACLE = sorted(name for name, spec in Q.REGISTRY.items() if spec.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    spec = Q.REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    problems = compare(df, spec.oracle, sf_dir, name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only(spark, sf_dir, name):
    spec = Q.REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
