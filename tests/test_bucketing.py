"""Bucketed tables co-locate joins: writing both sides bucketed by the
join key lets the join run with NO shuffle exchange — the physical-plan
property that makes repeated large-large joins viable at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.catalog import Catalog


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    # explicit paths → external tables; the static warehouse dir is unused
    wh = str(tmp_path_factory.mktemp("warehouse"))
    c = Catalog(spark, sf_dir)
    (
        c.lineitem.select("l_orderkey", "l_extendedprice")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{wh}/li_b")
        .saveAsTable("li_bucketed")
    )
    (
        c.orders.select("o_orderkey", "o_orderstatus")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{wh}/o_b")
        .saveAsTable("o_bucketed")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_shuffle(bucketed, spark):
    li = spark.table("li_bucketed")
    o = spark.table("o_bucketed")
    # disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, "bucketed join must not shuffle"
        # and it still returns the right number of rows
        expected = li.count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_does_shuffle(bucketed, spark, sf_dir):
    c = Catalog(spark, sf_dir)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = c.lineitem.join(c.orders, c.lineitem.l_orderkey == c.orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan, "sanity: plain join shuffles"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
