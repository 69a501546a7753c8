from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from osm_changesets_to_parquet_spark.session import get_spark

    import tempfile

    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    spark = get_spark("engine-tests", master=f"local[{cpus}]", extra_conf={
        "spark.sql.shuffle.partitions": cpus,
        "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_"),
    })
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
