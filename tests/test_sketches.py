"""Count-Min heavy-hitter tests: sketch one-sided error bound, no
missed heavy hitter, determinism, and the candidate-cap contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.catalog import Catalog
from eligibility_etl_airflow_spark.operators import sketches


def test_sketch_never_undercounts_and_bounds_overcount(spark, sf_dir):
    e = Catalog(spark, sf_dir).events
    n = e.count()
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    cms = sketches.count_min(e, "event_type", eps=1e-3, confidence=0.99)
    for v, true_n in exact.items():
        est = cms.estimateCount(v)
        assert est >= true_n  # CMS is one-sided
        assert est <= true_n + 2 * 1e-3 * n  # 2x slack on the eps bound


def test_heavy_hitters_match_exact_top_set(spark, sf_dir):
    d = Catalog(spark, sf_dir).documents
    n = d.count()
    exact = {
        r.lang: r.n
        for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    share = 0.05
    truth = {k for k, v in exact.items() if v >= share * n}
    hh = sketches.heavy_hitters(d, "lang", min_share=share, eps=1e-3)
    got = {r.value for r in hh.collect()}
    # never misses a true heavy hitter; borderline extras only within
    # the eps band
    assert truth <= got
    for r in hh.collect():
        assert exact[r.value] + 2 * 1e-3 * n >= r.est_count >= exact[r.value]


def test_heavy_hitters_deterministic_and_validated(spark, sf_dir):
    d = Catalog(spark, sf_dir).documents
    a = sketches.heavy_hitters(d, "lang", min_share=0.05).collect()
    b = sketches.heavy_hitters(d, "lang", min_share=0.05).collect()
    assert a == b
    with pytest.raises(ValueError):
        sketches.heavy_hitters(d, "lang", min_share=0.0)
    with pytest.raises(ValueError, match="candidate_cap"):
        sketches.heavy_hitters(d, "doc_id", min_share=0.001, candidate_cap=10)


def test_heavy_hitters_empty_input(spark):
    df = spark.createDataFrame([], "v string")
    assert sketches.heavy_hitters(df, "v", min_share=0.1).count() == 0
