"""Incremental aggregate maintenance: merged state must be
indistinguishable from a one-shot aggregate, for any delta split."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators import incremental

MEASURES = {"v": ("count", "sum", "min", "max")}


def _rows(df):
    return {
        tuple(r[k] for k in ("k", "n_rows", "count_v", "sum_v", "min_v", "max_v"))
        for r in df.collect()
    }


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def test_incremental_equals_batch(spark):
    part1 = [("a", 1), ("a", 5), ("b", 10)]
    part2 = [("a", 3), ("b", 2), ("c", 7)]  # includes a brand-new key
    full = _mk(spark, part1 + part2)
    state = incremental.aggregate_state(_mk(spark, part1), ["k"], MEASURES)
    updated = incremental.ingest_delta(state, _mk(spark, part2), ["k"], MEASURES)
    batch = incremental.aggregate_state(full, ["k"], MEASURES)
    assert _rows(updated) == _rows(batch)


def test_chained_deltas(spark):
    deltas = [[("a", i), ("b", i * 2)] for i in range(1, 5)]
    state = incremental.aggregate_state(_mk(spark, deltas[0]), ["k"], MEASURES)
    for d in deltas[1:]:
        state = incremental.ingest_delta(state, _mk(spark, d), ["k"], MEASURES)
    batch = incremental.aggregate_state(
        _mk(spark, [r for d in deltas for r in d]), ["k"], MEASURES
    )
    assert _rows(state) == _rows(batch)


def test_null_measures_counted_correctly(spark):
    # count(col) skips nulls in both the state build and the batch agg;
    # n_rows counts them
    df = spark.createDataFrame([("a", 1), ("a", None)], "k string, v long")
    part = incremental.aggregate_state(df, ["k"], MEASURES).collect()[0]
    assert (part.n_rows, part.count_v, part.sum_v) == (2, 1, 1)


def test_finalize_avg_and_validation(spark):
    df = _mk(spark, [("a", 2), ("a", 4)])
    state = incremental.aggregate_state(df, ["k"], MEASURES)
    fin = incremental.finalize(state, MEASURES, avg_cols=["v"]).collect()[0]
    assert fin.avg_v == 3.0
    with pytest.raises(ValueError):
        incremental.finalize(
            incremental.aggregate_state(df, ["k"], {"v": ("sum",)}),
            {"v": ("sum",)},
            avg_cols=["v"],
        )


def test_unsupported_op_raises(spark):
    with pytest.raises(ValueError):
        incremental.aggregate_state(_mk(spark, [("a", 1)]), ["k"], {"v": ("avg",)})
