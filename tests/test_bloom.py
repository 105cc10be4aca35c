"""Bloom join-pruning tests: no false negatives (exactness of the
composed semi join), fpp-bounded pruning, null-key semantics, string
keys, parameter validation, and JVM-side position computation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.catalog import Catalog
from eligibility_etl_airflow_spark.operators import bloom


def test_prefilter_is_superset_and_semi_join_exact(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    keys = cat.orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    fact = cat.lineitem.select("l_orderkey", "l_linenumber")
    exact = fact.join(
        keys.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", "left_semi"
    )
    sk = bloom.bloom_build(keys, "o_orderkey", fpp=0.01)
    pruned = bloom.bloom_prefilter(fact, "l_orderkey", sk)
    n_exact, n_pruned = exact.count(), pruned.count()
    assert n_pruned >= n_exact  # no false negatives, ever
    composed = bloom.bloom_semi_join(fact, "l_orderkey", keys, "o_orderkey", fpp=0.01)
    assert composed.count() == n_exact
    # the composed rows ARE the exact rows (both directions empty)
    assert composed.exceptAll(exact).count() == 0
    assert exact.exceptAll(composed).count() == 0


def test_false_positive_rate_within_bound(spark):
    # disjoint key spaces: every retained fact row is a false positive
    keys = spark.range(0, 5000).select(F.col("id").alias("k"))
    fact = spark.range(100_000, 200_000).select(F.col("id").alias("fk"))
    sk = bloom.bloom_build(keys, "k", fpp=0.01)
    kept = bloom.bloom_prefilter(fact, "fk", sk).count()
    # 3x slack on the configured 1% — observed ~1% (binomial, n=100k)
    assert kept <= 3 * 0.01 * 100_000


def test_null_keys_are_dropped_like_semi_join(spark):
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    fact = spark.range(0, 1000).select(
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id")).alias("fk")
    )
    sk = bloom.bloom_build(keys, "k")
    pruned = bloom.bloom_prefilter(fact, "fk", sk)
    assert pruned.filter(F.col("fk").isNull()).count() == 0
    # 0..99 minus the 20 nulled multiples of 5, plus at most a few Bloom
    # false positives from the 800 out-of-range keys (fpp 1%)
    n = pruned.count()
    assert 80 <= n <= 80 + 3 * 0.01 * 800
    exact = bloom.bloom_semi_join(fact, "fk", keys, "k")
    assert exact.count() == 80


def test_string_keys_round_trip(spark):
    keys = spark.range(0, 500).select(F.concat(F.lit("doc-"), F.col("id")).alias("k"))
    fact = spark.range(0, 5000).select(F.concat(F.lit("doc-"), F.col("id")).alias("fk"))
    got = bloom.bloom_semi_join(fact, "fk", keys, "k").count()
    assert got == 500


def test_sizing_bounds_and_validation(spark):
    keys = spark.range(0, 10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="fpp"):
        bloom.bloom_build(keys, "k", fpp=0.0)
    sk = bloom.bloom_build(keys, "k", expected_items=10)
    assert sk.num_bits % 64 == 0
    assert 1 <= sk.num_hashes <= 30
    # cap respected even when the request would exceed it
    sk2 = bloom.bloom_build(keys, "k", expected_items=10**9, fpp=1e-6, max_bits=1 << 20)
    assert sk2.num_bits == 1 << 20
    assert sk2.size_bytes == (1 << 20) // 8


def test_positions_computed_jvm_side(spark):
    """The only Python in the probe is the bit test: the plan contains
    exactly one ArrowEvalPython and no row-at-a-time BatchEvalPython."""
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    fact = spark.range(0, 1000).select(F.col("id").alias("fk"))
    sk = bloom.bloom_build(keys, "k")
    plan = bloom.bloom_prefilter(fact, "fk", sk)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("ArrowEvalPython") == 1


def test_resume_filter_bloom_matches_plain_resume(spark, tmp_path):
    """Bloom-accelerated resume is result-identical to the plain
    anti-join resume, and the returned sketch is reusable."""
    from pyspark.sql import functions as F

    from eligibility_etl_airflow_spark.sources import sinks

    sink = str(tmp_path / "sink")
    spark.range(0, 500).select(F.col("id").alias("k"), F.lit("old").alias("v")).write.parquet(sink)
    batch = spark.range(250, 1000).select(F.col("id").alias("k"), F.lit("new").alias("v"))

    plain = sinks.resume_filter(batch, spark, sink, ["k"])
    fast, sketch = sinks.resume_filter_bloom(batch, spark, sink, "k")
    assert sketch is not None
    assert sorted(r.k for r in fast.collect()) == sorted(r.k for r in plain.collect())
    # second batch reuses the sketch (the cross-micro-batch shape)
    batch2 = spark.range(400, 1200).select(F.col("id").alias("k"), F.lit("new").alias("v"))
    fast2, sketch2 = sinks.resume_filter_bloom(batch2, spark, sink, "k", sketch=sketch)
    assert sketch2 is sketch
    assert sorted(r.k for r in fast2.collect()) == list(range(500, 1200))
    # missing sink: batch passes through untouched
    passthrough, sk = sinks.resume_filter_bloom(batch, spark, str(tmp_path / "nope"), "k")
    assert sk is None and passthrough.count() == batch.count()


def test_bloom_add_keeps_cross_batch_resume_exact(spark, tmp_path):
    """The stale-sketch trap: keys appended to the sink AFTER the sketch
    was built are bloom-negative and would bypass the anti-join —
    bloom_add folds them in, restoring exactness for the next batch."""
    from pyspark.sql import functions as F

    from eligibility_etl_airflow_spark.sources import sinks

    sink = str(tmp_path / "sink")
    spark.range(0, 300).select(F.col("id").alias("k")).write.parquet(sink)
    b1 = spark.range(200, 600).select(F.col("id").alias("k"))
    new1, sketch = sinks.resume_filter_bloom(b1, spark, sink, "k")
    new1.write.mode("append").parquet(sink)  # sink now holds 0..599

    # STALE sketch: batch 2 overlaps what batch 1 just appended
    b2 = spark.range(400, 800).select(F.col("id").alias("k"))
    stale, _ = sinks.resume_filter_bloom(b2, spark, sink, "k", sketch=sketch)
    assert stale.count() > 200  # duplicates leak past the stale sketch

    refreshed = bloom.bloom_add(sketch, new1, "k")
    fresh, _ = sinks.resume_filter_bloom(b2, spark, sink, "k", sketch=refreshed)
    assert sorted(r.k for r in fresh.collect()) == list(range(600, 800))
    # membership of the ORIGINAL keys is preserved exactly in the new sketch
    orig = spark.range(0, 300).select(F.col("id").alias("k"))
    kept = bloom.bloom_prefilter(orig, "k", refreshed).count()
    assert kept == 300


def test_assign_split_full_test_fraction(spark):
    from pyspark.sql import functions as F

    from eligibility_etl_airflow_spark.operators import sampling

    df = spark.range(0, 200).select(F.col("id").alias("k"))
    out = sampling.assign_split(df, "k", test_frac=1.0)
    assert out.filter(F.col("split") == "test").count() == 200
    assert sampling.assign_split(df, "k", test_frac=0.0).filter(
        F.col("split") == "test"
    ).count() == 0
