"""Unit tests for SCD2 construction and CDC snapshot diff."""

from __future__ import annotations

import datetime as dt

import pytest

from eligibility_etl_airflow_spark.operators import history


def _ts(h):
    return dt.datetime(2024, 1, 1, h)


def test_scd2_compacts_heartbeats_and_closes_intervals(spark):
    rows = [
        # user 1: A (heartbeat A) -> B -> (heartbeat B) -> A
        (1, _ts(1), 10, "A"),
        (1, _ts(2), 11, "A"),
        (1, _ts(3), 12, "B"),
        (1, _ts(4), 13, "B"),
        (1, _ts(5), 14, "A"),
        # user 2: single status
        (2, _ts(1), 20, "X"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    hist = history.scd2_from_changelog(
        df, ["user_id"], "ts", ["event_type"], tiebreak_cols=["event_id"]
    )
    got = {
        (r.user_id, r.valid_from): (r.event_type, r.valid_to, r.is_current)
        for r in hist.collect()
    }
    assert got == {
        (1, _ts(1)): ("A", _ts(3), False),
        (1, _ts(3)): ("B", _ts(5), False),
        (1, _ts(5)): ("A", None, True),
        (2, _ts(1)): ("X", None, True),
    }


def test_scd2_tiebreak_orders_same_timestamp(spark):
    # two changes at the same ts: event_id decides version order
    rows = [(1, _ts(1), 2, "B"), (1, _ts(1), 1, "A")]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    hist = history.scd2_from_changelog(
        df, ["user_id"], "ts", ["event_type"], tiebreak_cols=["event_id"]
    ).collect()
    current = [r for r in hist if r.is_current]
    assert len(hist) == 2 and len(current) == 1
    assert current[0].event_type == "B"


def test_scd2_null_attr_transitions(spark):
    # null -> value and value -> null are both real changes; null -> null
    # is compacted
    rows = [
        (1, _ts(1), 1, None),
        (1, _ts(2), 2, None),
        (1, _ts(3), 3, "A"),
        (1, _ts(4), 4, None),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    hist = history.scd2_from_changelog(
        df, ["user_id"], "ts", ["event_type"], tiebreak_cols=["event_id"]
    ).collect()
    assert [(r.event_type, r.valid_from) for r in sorted(hist, key=lambda r: r.valid_from)] == [
        (None, _ts(1)),
        ("A", _ts(3)),
        (None, _ts(4)),
    ]


def test_snapshot_diff_classifies_changes(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "k long, v string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d"), (5, "e")], "k long, v string"
    )
    got = {
        r.k: (r.change_type, r.old_v, r.new_v)
        for r in history.snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        1: ("delete", "a", None),
        3: ("update", "c", "C"),
        4: ("update", None, "d"),  # null -> value is an update (null-safe)
        5: ("insert", None, "e"),
    }  # key 2 unchanged -> absent


def test_snapshot_diff_two_nulls_equal_and_validation(spark):
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, None)], "k long, v string")
    assert history.snapshot_diff(old, new, ["k"]).count() == 0
    with pytest.raises(ValueError):
        history.snapshot_diff(old, new, ["k"], compare_cols=["nope"])
