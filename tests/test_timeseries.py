"""Gap-fill/LOCF tests: planted gaps filled from the last observation,
leading gaps stay null, grid spans first..last bucket, last-in-bucket
is deterministic under timestamp ties."""

from __future__ import annotations

import datetime

from eligibility_etl_airflow_spark.operators import timeseries


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


def test_gaps_filled_and_grid_spans(spark):
    rows = [
        (1, _ts(0), 10.0),    # bucket 00:00
        (1, _ts(50), 20.0),   # bucket 00:45 -> 00:15 and 00:30 are gaps
        (2, _ts(20), 5.0),    # single-bucket key: grid of one row
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, value double")
    out = timeseries.gap_fill_locf(df, "user_id", "ts", "value", "15 minutes")
    got = {(r.user_id, r.bucket_start.minute): r for r in out.collect()}
    assert len(got) == 5  # 4 buckets for key 1 + 1 for key 2
    assert got[(1, 0)].value == 10.0 and not got[(1, 0)].is_gap
    for gap_min in (15, 30):
        r = got[(1, gap_min)]
        assert r.is_gap and r.value is None and r.filled_value == 10.0
    assert got[(1, 45)].filled_value == 20.0
    assert got[(2, 15)].value == 5.0  # 00:20 buckets to 00:15


def test_last_in_bucket_deterministic_on_ties(spark):
    # same timestamp twice in one bucket: the higher tiebreak value wins
    rows = [(1, _ts(0), 1.0), (1, _ts(0), 9.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, value double")
    out = timeseries.gap_fill_locf(df, "user_id", "ts", "value").collect()
    assert len(out) == 1 and out[0].value == 9.0


def test_leading_gap_stays_null(spark):
    # key 1's first bucket has data, so no leading gap exists by
    # construction (grid starts at the first OBSERVED bucket); assert
    # the contract: first grid row is never a gap
    rows = [(1, _ts(14), 3.0), (1, _ts(59), 4.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, value double")
    out = sorted(
        timeseries.gap_fill_locf(df, "user_id", "ts", "value").collect(),
        key=lambda r: r.bucket_start,
    )
    assert not out[0].is_gap and out[0].filled_value == 3.0
    assert all(r.filled_value is not None for r in out)


def test_interpolation_between_locf_after(spark):
    rows = [
        (1, _ts(0), 10.0),   # 00:00
        (1, _ts(45), 40.0),  # 00:45 -> 00:15 and 00:30 interpolate
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, value double")
    out = {
        r.bucket_start.minute: r
        for r in timeseries.gap_fill_interpolate(
            df, "user_id", "ts", "value", "15 minutes"
        ).collect()
    }
    assert out[0].filled_value == 10.0
    assert out[15].filled_value == 20.0  # 1/3 of the way 10 -> 40
    assert out[30].filled_value == 30.0
    assert out[45].filled_value == 40.0
    assert out[15].is_gap and not out[0].is_gap
