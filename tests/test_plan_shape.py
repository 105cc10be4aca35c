"""Physical-plan regression tests: the properties that matter at 100 TB
(scan pushdown, column pruning, broadcast dims, map-side partial
aggregation, no driver collects) asserted on the executed plans so a
refactor can't silently regress them."""

from __future__ import annotations

from eligibility_etl_airflow_spark import registry
from eligibility_etl_airflow_spark.catalog import Catalog

registry.load_all()


def _plan(spark, sf_dir, name):
    return registry.QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_flagship_pushdown_and_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "eligibility_flagship")
    # date-window predicate reaches the orders scan
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan or "GreaterThanOrEqual(o_orderdate" in plan
    # dims broadcast, no sort-merge for the star
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_flagship_column_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "eligibility_flagship")
    # customer scan must not read every column (c_acctbal etc. unused)
    for line in plan.splitlines():
        if "ReadSchema" in line and "c_custkey" in line:
            assert "c_acctbal" not in line and "c_address" not in line
            break
    else:
        raise AssertionError("customer ReadSchema not found")


def test_aggregation_is_partial(spark, sf_dir):
    plan = _plan(spark, sf_dir, "string_agg_per_group")
    # two HashAggregates around the exchange = map-side partial agg
    assert plan.count("HashAggregate") >= 2 or plan.count("ObjectHashAggregate") >= 2


def test_semi_join_stays_semi(spark, sf_dir):
    plan = _plan(spark, sf_dir, "semi_join_key_set")
    assert "LeftSemi" in plan


def test_lineitem_scan_prunes_for_pricing_sql(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary_sql")
    for line in plan.splitlines():
        if "ReadSchema" in line and "l_returnflag" in line:
            assert "l_comment" not in line and "l_shipinstruct" not in line
            break
    else:
        raise AssertionError("lineitem ReadSchema not found")


def test_catalog_scan_is_lazy_and_columnar(spark, sf_dir):
    df = Catalog(spark, sf_dir).lineitem.select("l_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan
    assert "l_comment" not in plan  # pruned at the scan
