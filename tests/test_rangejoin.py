"""Bucketized range-join invariants: exact tolerance boundary, no
duplicate pairs from replication, cross-bucket matches, and plan shape
(equi-join, not nested-loop)."""

from __future__ import annotations

from datetime import datetime

from eligibility_etl_airflow_spark.operators.rangejoin import range_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_range_join_boundary_and_no_dupes(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:10:00"))], "lid long, lt timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T00:08:00")),  # inside (120 s exactly)
            (11, _ts("2024-01-01T00:07:59")),  # just outside
            (12, _ts("2024-01-01T00:10:30")),  # inside, other direction
            (13, _ts("2024-01-01T00:12:00")),  # boundary above
            (14, _ts("2024-01-01T00:12:01")),  # outside above
        ],
        "rid long, rt timestamp",
    )
    out = range_join(left, right, "lt", "rt", tolerance_s=120)
    rids = sorted(r.rid for r in out.collect())
    assert rids == [10, 12, 13], rids  # each match exactly once


def test_range_join_crosses_bucket_edges(spark):
    """Matches spanning a bucket boundary must still be found."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:02:00"))], "lid long, lt timestamp"
    )
    # 00:02:00 epoch bucket (width 60) differs from 00:01:30's
    right = spark.createDataFrame(
        [(20, _ts("2024-01-01T00:01:30")), (21, _ts("2024-01-01T00:02:45"))],
        "rid long, rt timestamp",
    )
    out = range_join(left, right, "lt", "rt", tolerance_s=60)
    assert sorted(r.rid for r in out.collect()) == [20, 21]


def test_range_join_plan_is_equi_join(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"))], "lid long, lt timestamp"
    )
    right = spark.createDataFrame(
        [(2, _ts("2024-01-01T00:00:30"))], "rid long, rt timestamp"
    )
    plan = range_join(left, right, "lt", "rt", 60)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
