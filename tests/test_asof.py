"""As-of join invariants: latest-prior-row semantics, inclusive bound,
inner vs left behavior, and key isolation."""

from __future__ import annotations

from datetime import datetime

from eligibility_etl_airflow_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),   # after two quotes
            (2, 10, _ts("2024-01-01T08:00:00")),   # exactly at a quote ts
            (3, 10, _ts("2024-01-01T05:00:00")),   # before any quote
            (4, 20, _ts("2024-01-01T12:00:00")),   # other key
        ],
        "trade_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T08:00:00"), 1.0),
            (10, _ts("2024-01-01T09:30:00"), 2.0),
            (10, _ts("2024-01-01T11:00:00"), 3.0),  # later than trade 1
            (20, _ts("2024-01-01T11:59:00"), 9.0),
        ],
        "k long, ts timestamp, px double",
    )
    return left, right


def test_asof_inner_latest_prior(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    right_cols=["ts", "px"], how="inner")
    got = {r.trade_id: (r.ts_asof, r.px_asof) for r in out.collect()}
    assert got[1] == (_ts("2024-01-01T09:30:00"), 2.0)  # latest <= 10:00
    assert got[2] == (_ts("2024-01-01T08:00:00"), 1.0)  # inclusive bound
    assert 3 not in got                                  # no prior quote
    assert got[4] == (_ts("2024-01-01T11:59:00"), 9.0)  # key isolation


def test_asof_left_keeps_unmatched(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    right_cols=["px"], how="left")
    got = {r.trade_id: r.px_asof for r in out.collect()}
    assert len(got) == 4
    assert got[3] is None


def test_asof_null_right_ts_never_matches(spark):
    """A right row with NULL timestamp must not be treated as infinitely
    old (DuckDB ASOF: right_ts <= left_ts is never true for NULL)."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T10:00:00"))], "trade_id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, None, 7.0), (10, _ts("2024-01-01T09:00:00"), 2.0)],
        "k long, ts timestamp, px double",
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    right_cols=["px"], how="inner").collect()
    assert [(r.trade_id, r.px_asof) for r in out] == [(1, 2.0)]

    only_null = right.filter(right.ts.isNull())
    got = asof_join(left, only_null, on="k", left_ts="ts", right_ts="ts",
                    right_cols=["px"], how="inner").collect()
    assert got == []  # nothing to match: inner drops the left row


def test_asof_matches_duckdb_oracle(spark, sf_dir):
    """The registered query's Spark plan equals DuckDB's native ASOF JOIN
    on the same events parquet."""
    from eligibility_etl_airflow_spark import registry
    from tests.oracle_utils import assert_parity, run_oracle

    registry.load_all()
    sdf = registry.QUERIES["asof_join_events"](spark, sf_dir).toPandas()
    odf = run_oracle(registry.ORACLES["asof_join_events"], sf_dir)
    assert_parity(sdf, odf, "asof_join_events")
