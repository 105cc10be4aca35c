"""Learned quality classifier: AUC floor, determinism, scoring plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators import quality_model


def _planted_corpus(spark, n=400, seed=7):
    """Positives contain quality-marker vocabulary, negatives contain
    junk-marker vocabulary, both over a shared filler vocabulary —
    separable, but not on any single token."""
    import random

    rng = random.Random(seed)
    good = ["research", "analysis", "method", "result", "evidence", "study"]
    bad = ["click", "winner", "free", "prize", "buy", "casino"]
    filler = [f"word{i}" for i in range(50)]
    rows = []
    for i in range(n):
        y = i % 2
        markers = good if y else bad
        toks = [rng.choice(filler) for _ in range(20)] + [
            rng.choice(markers) for _ in range(6)
        ]
        rng.shuffle(toks)
        rows.append((i, " ".join(toks), float(y)))
    return spark.createDataFrame(rows, "doc_id long, text string, y double")


def test_planted_label_auc_floor(spark):
    docs = _planted_corpus(spark)
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)
    model = quality_model.train_quality_classifier(
        train, "doc_id", "text", "y", dim=256, sample_size=300, iters=200
    )
    scored = (
        quality_model.score_quality(test, "doc_id", "text", model)
        .join(test.select(F.col("doc_id").alias("id"), "y"), "id")
        .collect()
    )
    pos = sorted(r["score"] for r in scored if r["y"] == 1.0)
    neg = sorted(r["score"] for r in scored if r["y"] == 0.0)
    # exact AUC = P(pos > neg) over all pairs
    import bisect

    wins = sum(bisect.bisect_left(neg, p) for p in pos)
    ties = sum(
        bisect.bisect_right(neg, p) - bisect.bisect_left(neg, p) for p in pos
    )
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert auc >= 0.95, auc


def test_training_is_layout_stable(spark):
    docs = _planted_corpus(spark, n=200)
    m1 = quality_model.train_quality_classifier(
        docs, "doc_id", "text", "y", dim=128, sample_size=150, iters=50
    )
    m2 = quality_model.train_quality_classifier(
        docs.repartition(13), "doc_id", "text", "y", dim=128, sample_size=150, iters=50
    )
    assert m1["bias"] == pytest.approx(m2["bias"], abs=1e-12)
    assert m1["weights"] == pytest.approx(m2["weights"], abs=1e-12)


def test_tokenless_docs_score_prior(spark):
    docs = _planted_corpus(spark, n=100)
    model = quality_model.train_quality_classifier(
        docs, "doc_id", "text", "y", dim=128, sample_size=100, iters=50
    )
    import math

    empty = spark.createDataFrame(
        [(999, ""), (1000, None)], "doc_id long, text string"
    )
    got = {
        r["id"]: r["score"]
        for r in quality_model.score_quality(empty, "doc_id", "text", model).collect()
    }
    prior = 1.0 / (1.0 + math.exp(-model["bias"]))
    assert got[999] == pytest.approx(prior, abs=1e-9)
    assert got[1000] == pytest.approx(prior, abs=1e-9)


def test_scoring_path_has_no_python_udf(spark):
    docs = _planted_corpus(spark, n=50)
    model = quality_model.train_quality_classifier(
        docs, "doc_id", "text", "y", dim=64, sample_size=50, iters=10
    )
    plan = (
        quality_model.score_quality(docs, "doc_id", "text", model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "FlatMapsInPandas" not in plan and "MapInPandas" not in plan


def test_null_labels_excluded_and_empty_raises(spark):
    docs = _planted_corpus(spark, n=60).withColumn(
        "y", F.when(F.col("doc_id") < 30, F.col("y"))
    )
    model = quality_model.train_quality_classifier(
        docs, "doc_id", "text", "y", dim=64, sample_size=100, iters=10
    )
    assert len(model["weights"]) == 64
    nolab = docs.withColumn("y", F.lit(None).cast("double"))
    with pytest.raises(ValueError, match="no labeled rows"):
        quality_model.train_quality_classifier(
            nolab, "doc_id", "text", "y", dim=64, sample_size=100, iters=10
        )


def test_curation_learned_quality_stage(spark, sf_dir, tmp_path):
    """A trained model gates the curation funnel: a marker-word model
    drops low-scoring docs; threshold 0 drops nothing."""
    from eligibility_etl_airflow_spark import pipelines

    docs = _planted_corpus(spark, n=200)
    model = quality_model.train_quality_classifier(
        docs, "doc_id", "text", "y", dim=256, sample_size=200, iters=200
    )
    base = pipelines.run_corpus_curation_pipeline(
        spark, sf_dir, str(tmp_path / "plain"), min_quality=0.0,
        neardup_removal="pair",
    )
    gated = pipelines.run_corpus_curation_pipeline(
        spark, sf_dir, str(tmp_path / "gated"), min_quality=0.0,
        neardup_removal="pair", quality_model=model, quality_model_min=0.999,
    )
    # real documents contain none of the planted good-marker vocabulary:
    # a near-1 threshold must remove (almost) everything
    assert gated["n_after_learned_quality"] < base["n_after_quality_lang"]
    lax = pipelines.run_corpus_curation_pipeline(
        spark, sf_dir, str(tmp_path / "lax"), min_quality=0.0,
        neardup_removal="pair", quality_model=model, quality_model_min=0.0,
    )
    assert lax["n_after_learned_quality"] == base["n_after_quality_lang"]
    assert lax["n_curated"] == base["n_curated"]
