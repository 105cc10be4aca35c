"""Every registered query must match its DuckDB oracle (driver's t2 gate)."""

from __future__ import annotations

import pytest

from eligibility_etl_airflow_spark import registry
from tests.oracle_utils import assert_parity, run_oracle

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_parity(spark, sf_dir, name):
    sdf = registry.QUERIES[name](spark, sf_dir).toPandas()
    if name not in registry.ORACLES:
        # rows-only check (non-SQL-expressible operator)
        assert sdf is not None
        return
    odf = run_oracle(registry.ORACLES[name], sf_dir)
    assert_parity(sdf, odf, name)
