"""Plan-audit API tests: summaries count what they claim, the
discipline assert fires on row-Python and shuffle-budget violations and
passes on the engine's own flagship plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from eligibility_etl_airflow_spark import diagnostics, registry

registry.load_all()


def test_flagship_passes_discipline(spark, sf_dir):
    df = registry.QUERIES["eligibility_flagship"](spark, sf_dir)
    s = diagnostics.assert_scale_discipline(df)
    assert s.python_is_vectorized
    assert s.broadcast_hash_joins >= 3  # the dims broadcast
    assert s.exchanges == 0  # star join: no shuffle at all
    assert s.pushed_filter_scans == s.scans  # every scan got pushdown


def test_shuffle_budget_violation_raises(spark):
    a = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit(1).alias("x"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit(2).alias("y"))
    # force a shuffle join + an aggregate: at least 2 shuffle exchanges
    joined = (
        a.hint("merge").join(b.hint("merge"), "k").groupBy("x").agg(F.sum("y").alias("s"))
    )
    with pytest.raises(AssertionError, match="shuffle Exchange"):
        diagnostics.assert_scale_discipline(joined, max_exchanges=0)
    s = diagnostics.plan_summary(joined)
    assert s.exchanges >= 1 and s.sort_merge_joins == 1


def test_row_python_flagged_and_allowable(spark):
    @F.udf(LongType())
    def slow(v):
        return v + 1

    df = spark.range(0, 10).select(slow(F.col("id")).alias("v"))
    assert diagnostics.plan_summary(df).batch_eval_python == 1
    with pytest.raises(AssertionError, match="row-at-a-time"):
        diagnostics.assert_scale_discipline(df)
    s = diagnostics.assert_scale_discipline(df, allow_row_python=True)
    assert not s.python_is_vectorized


def test_arrow_python_is_not_flagged(spark, sf_dir):
    from eligibility_etl_airflow_spark.operators import bloom

    keys = spark.range(0, 50).select(F.col("id").alias("k"))
    sk = bloom.bloom_build(keys, "k", expected_items=50)
    fact = spark.range(0, 500).select(F.col("id").alias("fk"))
    s = diagnostics.assert_scale_discipline(bloom.bloom_prefilter(fact, "fk", sk))
    assert s.arrow_eval_python == 1 and s.batch_eval_python == 0


def test_pushed_filter_scans_counted(spark, sf_dir):
    from eligibility_etl_airflow_spark.catalog import Catalog

    df = Catalog(spark, sf_dir).orders.filter(F.col("o_orderkey") == 7).select("o_orderkey")
    s = diagnostics.plan_summary(df)
    assert s.scans >= 1 and s.pushed_filter_scans >= 1
