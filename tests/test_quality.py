"""Quality-suite tests: planted violations counted per rule, null
semantics (nulls fail value rules but only non-null duplicates fail
uniqueness), the enforce gate, and the one-pass plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators import quality as q


def _df(spark):
    rows = [
        (1, 10.0, "F", "1-URGENT"),
        (2, -5.0, "O", "2-HIGH"),        # range violation
        (3, 20.0, "X", "3-MEDIUM"),      # membership violation
        (None, 30.0, "P", "bad"),        # null key + pattern violation
        (5, 40.0, "F", "5-LOW"),
        (5, 50.0, "O", "4-NOT SPECIFIED"),  # duplicate key
    ]
    return spark.createDataFrame(rows, "k long, v double, status string, prio string")


def _rules():
    # built lazily: some rule Columns invoke JVM functions, which need an
    # active SparkContext (absent at module import time)
    return [
        q.not_null("k"),
        q.in_range("v", 0, 100),
        q.isin("status", ("F", "O", "P")),
        q.matches("prio", "^[1-5]-"),
        q.unique("k"),
    ]


def test_violations_counted_per_rule(spark):
    report = {r.rule: r for r in q.check(_df(spark), _rules()).collect()}
    assert report["not_null(k)"].n_violations == 1
    assert report["in_range(v,0,100)"].n_violations == 1
    assert report["isin(status)"].n_violations == 1
    assert report["matches(prio)"].n_violations == 1
    # only the non-null duplicate pair counts: 5 appears twice -> 1 extra
    assert report["unique(k)"].n_violations == 1
    assert all(r.n_rows == 6 for r in report.values())
    assert not any(r.passed for r in report.values())


def test_clean_data_passes_and_enforce_returns(spark):
    clean = _df(spark).filter(F.col("k").isin(1)).limit(1)
    report = q.enforce(clean, _rules())
    assert report.filter(~F.col("passed")).count() == 0


def test_enforce_raises_with_named_failures(spark):
    with pytest.raises(q.QualitySuiteError, match="not_null"):
        q.enforce(_df(spark), _rules())
    try:
        q.enforce(_df(spark), _rules())
    except q.QualitySuiteError as e:
        assert ("unique(k)", 1) in e.failures and len(e.failures) == 5


def test_satisfies_custom_rule_null_is_fail(spark):
    df = spark.createDataFrame([(1, 2), (3, None), (5, 1)], "a long, b long")
    report = {r.rule: r for r in q.check(df, [q.satisfies("a>b", F.col("a") > F.col("b"))]).collect()}
    # (3, None) -> predicate null -> fail; (1,2) -> fail; (5,1) -> pass
    assert report["a>b"].n_violations == 2


def test_row_rules_share_one_aggregate(spark):
    from eligibility_etl_airflow_spark import diagnostics

    df = _df(spark)
    # the row-level half of the suite is one aggregate: build the agg
    # exactly as check() does, minus the driver collect
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(r.violated, 1).otherwise(0)).alias(f"v{i}")
        for i, r in enumerate(_rules())
        if r.unique_col is None
    ]
    s = diagnostics.plan_summary(df.agg(*aggs))
    assert s.exchanges <= 1  # partial agg + one final exchange, no more


def test_empty_rules_rejected(spark):
    with pytest.raises(ValueError, match="rules"):
        q.check(_df(spark), [])


def test_duplicate_rule_names_rejected(spark):
    with pytest.raises(ValueError, match="duplicate rule names"):
        q.check(_df(spark), [q.not_null("k"), q.not_null("k")])


def test_profile_stats_and_empty_table(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (None, "b"), (4, None)], "k long, s string"
    )
    prof = {r.column: r for r in q.profile(df, exact_distinct=True).collect()}
    assert prof["k"].n_rows == 4 and prof["k"].n_nulls == 1
    assert prof["k"].n_distinct == 3 and prof["k"].min_value == "1"
    assert prof["k"].max_value == "4"
    assert prof["s"].n_distinct == 2 and prof["s"].min_value == "a"
    # empty input: zero rows/nulls/distinct, null min/max
    empty = spark.createDataFrame([], "k long, s string")
    p0 = {r.column: r for r in q.profile(empty).collect()}
    assert p0["k"].n_rows == 0 == p0["k"].n_distinct and p0["k"].min_value is None
    with pytest.raises(ValueError, match="cols"):
        q.profile(df, [])


def test_check_on_empty_table_passes_all_rules(spark):
    empty = spark.createDataFrame([], "k long, v double, status string, prio string")
    report = q.enforce(empty, _rules())  # must not raise
    rows = report.collect()
    assert all(r.passed and r.n_violations == 0 and r.n_rows == 0 for r in rows)
