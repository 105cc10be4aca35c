"""Z-order clustering tests: the layout must make parquet min/max
statistics selective on EVERY z-ordered column, where range clustering
is selective only on the leading key."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators import zorder
from eligibility_etl_airflow_spark.sources import sinks


def _file_spans(path, col):
    """Per-file (min, max) of ``col`` from parquet footer statistics."""
    import pyarrow.parquet as pq

    spans = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = next(
            i for i in range(len(md.schema)) if md.schema.column(i).name == col
        )
        mins = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        maxs = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        spans.append((mins, maxs))
    return spans


def _avg_norm_span(spans, lo, hi):
    return sum((b - a) for a, b in spans) / (len(spans) * (hi - lo))


def _grid_df(spark):
    # two independent uniform dimensions, 64x64 grid x 4 rows
    return (
        spark.range(0, 16384)
        .withColumn("x", (F.col("id") % 64).cast("double"))
        .withColumn("y", ((F.col("id") / 64).cast("long") % 64).cast("double"))
    )


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    df = _grid_df(spark)
    zpath = str(tmp_path / "zord")
    zorder.write_zordered(df, zpath, ["x", "y"], bits=6, num_files=16)
    x_spans = _file_spans(zpath, "x")
    y_spans = _file_spans(zpath, "y")
    assert len(x_spans) > 4
    # each file covers a sub-square of the grid: both dimensions
    # selective (a perfect 16-file z-layout has span 0.25 per dim)
    assert _avg_norm_span(x_spans, 0, 63) < 0.6
    assert _avg_norm_span(y_spans, 0, 63) < 0.6

    # contrast: range clustering by x leaves y unprunable
    rpath = str(tmp_path / "ranged")
    sinks.write_clustered(df, rpath, ["x"], num_files=16)
    ry = _file_spans(rpath, "y")
    assert _avg_norm_span(ry, 0, 63) > 0.9


def test_interleave_reference(spark):
    # 2-bit interleave of (x=0b10, y=0b01) -> bits: y0 at 0, x0 at 1,
    # y1 at 2, x1 at 3 -> x=10 contributes bit1(0)<<1, bit0... check
    # against a python Morton reference over all 4-bit pairs
    import itertools

    rows = [(x, y) for x, y in itertools.product(range(4), range(4))]
    df = spark.createDataFrame(rows, "x long, y long")
    out = zorder._interleave([F.col("x"), F.col("y")], bits=2)
    got = {
        (r.x, r.y): r.z for r in df.withColumn("z", out).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(2):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y) for x, y in rows}


def test_zorder_validation(spark):
    df = spark.range(10).withColumn("x", F.col("id").cast("double"))
    with pytest.raises(ValueError):
        zorder.with_zorder(df, [], bits=6)
    with pytest.raises(ValueError):
        zorder.with_zorder(df, ["x"], bits=0)


def test_zorder_skew_resistance(spark, tmp_path):
    """Equal-population bucketing: 90% of rows in a hot x-range must not
    collapse the curve — files still split the hot range."""
    hot = spark.range(0, 9000).withColumn("x", (F.col("id") % 10).cast("double"))
    cold = (
        spark.range(9000, 10000)
        .withColumn("x", (10 + F.col("id") % 1000).cast("double"))
    )
    df = hot.unionByName(cold).withColumn("y", (F.col("id") % 97).cast("double"))
    zpath = str(tmp_path / "skewed")
    zorder.write_zordered(df, zpath, ["x", "y"], bits=6, num_files=8)
    x_spans = _file_spans(zpath, "x")
    # the hot range [0,10) must be split across multiple files, not
    # bucketed into one (equal-width bucketing would put 90% of rows in
    # one bucket)
    hot_files = [s for s in x_spans if s[0] < 10]
    assert len(hot_files) >= 3


def test_zorder_guards(spark):
    df = (
        spark.range(100)
        .withColumn("x", F.col("id").cast("double"))
        .withColumn("dead", F.lit(None).cast("double"))
        .withColumn("z_key", F.lit(1))
    )
    # k*bits must fit a long's 63 value bits
    with pytest.raises(ValueError, match="63"):
        zorder.with_zorder(df, ["x", "x", "x", "x", "x"], bits=16, key_col="zz")
    # an all-NULL z-column is an error, not a silent constant bucket
    with pytest.raises(ValueError, match="no non-null"):
        zorder.with_zorder(df, ["x", "dead"], bits=4, key_col="zz")
    # existing key_col name rejected
    with pytest.raises(ValueError, match="already exists"):
        zorder.with_zorder(df, ["x"], bits=4)


def test_write_zordered_preserves_user_dunder_z_column(spark, tmp_path):
    df = (
        spark.range(0, 256)
        .withColumn("x", (F.col("id") % 16).cast("double"))
        .withColumn("y", ((F.col("id") / 16).cast("long")).cast("double"))
        .withColumn("__z", F.lit("keep-me"))
    )
    out = str(tmp_path / "userz")
    zorder.write_zordered(df, out, ["x", "y"], bits=4, num_files=4)
    back = spark.read.parquet(out)
    assert "__z" in back.columns
    assert back.filter(F.col("__z") == "keep-me").count() == 256


def test_lex_prefix_code_preserves_byte_order(spark):
    rows = [
        ("",), ("a",), ("aa",), ("ab",), ("abcdef",), ("b",), ("zz",),
        ("é",), ("日本語テスト",),
    ]
    df = spark.createDataFrame(rows, "s string")
    got = {r.s: r.v for r in df.select(
        "s", zorder.lex_prefix_code(F.col("s")).alias("v")
    ).collect()}
    ordered = sorted(rows, key=lambda r: r[0].encode()[:6])
    vals = [got[s] for (s,) in ordered]
    assert vals == sorted(vals)
    assert len(set(vals)) == len(vals)  # distinct 6-byte prefixes stay distinct
    with pytest.raises(ValueError):
        zorder.lex_prefix_code(F.col("s"), nbytes=8)


def test_zorder_string_dimension_end_to_end(spark, tmp_path):
    df = (
        spark.range(0, 4096)
        .withColumn("s", F.concat(F.lit("key"), F.lpad((F.col("id") % 64).cast("string"), 3, "0")))
        .withColumn("x", ((F.col("id") / 64).cast("long") % 64).cast("double"))
        .withColumn("s_code", zorder.lex_prefix_code(F.col("s")))
    )
    out = str(tmp_path / "strz")
    zorder.write_zordered(df, out, ["s_code", "x"], bits=6, num_files=16)
    # the string dimension prunes: each file's span of s is a subrange
    spans = _file_spans(out, "s")
    assert len(spans) > 4
    full = {f"key{i:03d}" for i in range(64)}
    avg_cover = sum(
        len([s for s in full if a <= s <= b]) for a, b in spans
    ) / (len(spans) * len(full))
    assert avg_cover < 0.6
