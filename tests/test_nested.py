"""Recursive struct flattening."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.functions import nested


def test_flatten_nested_structs(spark):
    df = spark.createDataFrame(
        [(1, (("x", 2), [1, 2]))],
        "id long, a struct<b: struct<c: string, d: long>, arr: array<long>>",
    )
    out = nested.flatten_structs(df)
    assert out.columns == ["id", "a_b_c", "a_b_d", "a_arr"]
    (r,) = out.collect()
    assert (r.id, r.a_b_c, r.a_b_d, list(r.a_arr)) == (1, "x", 2, [1, 2])


def test_flatten_preserves_arrays_and_grain(spark):
    df = spark.createDataFrame(
        [(1, [(1, "a"), (2, "b")])],
        "id long, items array<struct<k: long, v: string>>",
    )
    out = nested.flatten_structs(df)
    # array of structs stays one row — exploding is the caller's call
    assert out.count() == 1
    assert out.columns == ["id", "items"]


def test_flatten_collision_raises(spark):
    df = spark.createDataFrame(
        [(1, ("x",), "y")], "id long, a struct<b: string>, a_b string"
    )
    with pytest.raises(ValueError, match="collision"):
        nested.flatten_structs(df)


def test_flatten_handles_dotted_and_spaced_field_names(spark):
    df = spark.createDataFrame([((1, 2),)], "s struct<`x y`: long, `p.q`: long>")
    out = nested.flatten_structs(df)
    assert out.columns == ["s_x y", "s_p.q"]
    (r,) = out.collect()
    assert r["s_x y"] == 1 and r["s_p.q"] == 2
