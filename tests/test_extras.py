"""Invariants for the sketch-based extras."""

from __future__ import annotations

from eligibility_etl_airflow_spark import registry

registry.load_all()


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = registry.QUERIES["approx_distinct_sketch"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_customers - r.exact_customers) / max(r.exact_customers, 1)
        assert rel_err < 0.10, f"{r.o_orderstatus}: rel err {rel_err:.3f}"
