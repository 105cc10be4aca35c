"""Analytics-plan regression tests beyond oracle parity: the pivot
zero-cell fill (absent pivot cells are NULL regardless of coalesce
inside agg) and bloom broadcast reuse."""

from __future__ import annotations

import datetime

from eligibility_etl_airflow_spark.plans import analytics


def test_pivot_fills_absent_cells_with_zero(spark, tmp_path):
    # a priority with NO 'P'-status orders: the P cell never aggregates,
    # so Spark emits NULL for it — the query must coalesce to 0.0 to
    # match the oracle's conditional sums
    rows = [
        (1, 1, "F", 10.0, datetime.datetime(1995, 1, 1), "1-URGENT"),
        (2, 1, "O", 20.0, datetime.datetime(1995, 1, 2), "1-URGENT"),
        (3, 2, "P", 30.0, datetime.datetime(1995, 1, 3), "5-LOW"),
    ]
    import pandas as pd

    # single-file parquet, the testdata layout the Catalog reads
    pd.DataFrame(
        rows,
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    ).to_parquet(str(tmp_path / "orders.parquet"))
    out = {
        r.o_orderpriority: r
        for r in analytics.pivot_status_matrix(spark, str(tmp_path)).collect()
    }
    urgent = out["1-URGENT"]
    assert urgent.rev_p == 0.0 and urgent.rev_f == 10.0 and urgent.rev_o == 20.0
    assert urgent.n_orders == 2
    low = out["5-LOW"]
    assert low.rev_f == 0.0 == low.rev_o and low.rev_p == 30.0 and low.n_orders == 1


def test_bloom_broadcast_reused_across_probes(spark):
    from pyspark.sql import functions as F

    from eligibility_etl_airflow_spark.operators import bloom

    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    fact = spark.range(0, 1000).select(F.col("id").alias("fk"))
    sk = bloom.bloom_build(keys, "k", expected_items=100)
    bloom.bloom_prefilter(fact, "fk", sk).count()
    bc = bloom._BROADCASTS.get(sk)
    assert bc is not None
    bloom.bloom_prefilter(fact, "fk", sk).count()
    # the second probe reused the same broadcast object, no new one made
    assert bloom._BROADCASTS.get(sk) is bc
