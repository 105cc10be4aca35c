"""salted_join semantics: parity with a plain join for every allowed
``how``, and rejection of join types that replication would corrupt."""

from __future__ import annotations

import pytest

from eligibility_etl_airflow_spark.operators.skew import salted_join


@pytest.fixture
def frames(spark):
    big = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, big_v string"
    )
    small = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (9, 90.0)], "k long, small_v double"
    )
    return big, small


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_matches_plain_join(spark, frames, how):
    big, small = frames
    got = sorted(map(tuple, salted_join(big, small, "k", how=how, salt=4).collect()))
    want = sorted(map(tuple, big.join(small, "k", how).collect()))
    assert got == want, how


@pytest.mark.parametrize("how", ["right", "full", "outer", "full_outer"])
def test_salted_rejects_replication_breaking_how(spark, frames, how):
    big, small = frames
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(big, small, "k", how=how)
