"""Decontamination + repetition-filter tests: planted contamination is
caught, clean docs stay clean, hashed and string n-grams agree, short
docs are safe, and crafted repetitive docs are rejected."""

from __future__ import annotations

from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators import decontam, repetition

BENCH_SENT = "the quick brown fox jumps over the lazy sleeping dog tonight"
CLEAN = "completely unrelated prose about distributed query engines and shuffles"


def _docs(spark):
    rows = [
        (1, f"some padding words here {BENCH_SENT} and trailing context text"),
        (2, CLEAN + " with even more harmless filler tokens appended here"),
        (3, "tiny doc"),  # < n tokens: zero n-grams
        (4, None),  # null text
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame([(BENCH_SENT,)], "text string")


def test_planted_contamination_flagged(spark):
    out = decontam.contamination_flags(_docs(spark), _bench(spark), n=8)
    by_id = {r.doc_id: r for r in out.collect()}
    assert by_id[1].contaminated and by_id[1].n_matched >= 1
    assert not by_id[2].contaminated and by_id[2].n_matched == 0
    assert by_id[3].n_ngrams == 0 and not by_id[3].contaminated
    assert by_id[4].n_ngrams == 0 and not by_id[4].contaminated
    assert 0.0 < by_id[1].overlap <= 1.0


def test_hashed_and_string_ngrams_agree(spark):
    a = decontam.contamination_flags(_docs(spark), _bench(spark), n=8, hash_ngrams=True)
    b = decontam.contamination_flags(_docs(spark), _bench(spark), n=8, hash_ngrams=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_self_overlap_is_total(spark):
    docs = _docs(spark).filter(F.col("doc_id") == 1)
    out = decontam.contamination_flags(docs, docs.select("text"), n=8).head()
    assert out.overlap == 1.0 and out.n_matched == out.n_ngrams > 0


def test_repetition_rejects_loops_keeps_prose(spark):
    natural = (
        "a genuinely varied sentence mentioning shuffles partitions catalyst "
        "codegen arrow pandas executors drivers stages tasks metrics plans"
    )
    looping = "spam ham " * 50  # dup tokens + dup bigrams + top share all high
    stuffed = "keyword " * 30 + "other words here"  # one dominant token
    df = spark.createDataFrame(
        [(1, natural), (2, looping), (3, stuffed), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition.repetition_metrics(df).collect()}
    assert out[1].keep
    assert not out[2].keep and out[2].dup_bigram_ratio > 0.9
    assert not out[3].keep and out[3].top_token_share > 0.5
    # empty / null docs: all ratios zero, kept (length filters own those)
    for i in (4, 5):
        assert out[i].n_tokens == 0 and out[i].keep
        assert out[i].dup_token_ratio == 0.0 == out[i].dup_bigram_ratio


def test_repetition_single_token_doc(spark):
    df = spark.createDataFrame([(1, "word")], "doc_id long, text string")
    r = repetition.repetition_metrics(df).head()
    assert r.n_tokens == 1 and r.dup_token_ratio == 0.0
    assert r.dup_bigram_ratio == 0.0  # no bigrams → ratio 0, not null
    assert r.top_token_share == 1.0 and not r.keep  # one token IS the mode
