"""Corpus drift: JSD math vs a python reference, bounds, edge cases."""

from __future__ import annotations

import math
import re
from collections import Counter

from eligibility_etl_airflow_spark.operators import drift


def _py_jsd(slice_texts, all_texts):
    tok = lambda t: [w for w in re.split("[^a-z]+", t.lower()) if w]
    p_cnt = Counter(w for t in slice_texts for w in tok(t))
    q_cnt = Counter(w for t in all_texts for w in tok(t))
    np_, nq = sum(p_cnt.values()), sum(q_cnt.values())
    js = 0.0
    for w, qc in q_cnt.items():
        p = p_cnt.get(w, 0) / np_
        q = qc / nq
        m = (p + q) / 2
        if p:
            js += p / 2 * math.log2(p / m)
        js += q / 2 * math.log2(q / m)
    return js


def _run(spark, rows):
    df = spark.createDataFrame(rows, "source string, text string")
    return {
        r["slice"]: r
        for r in drift.js_divergence_by_slice(df, "source", "text").collect()
    }


def test_jsd_matches_python_reference(spark):
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("a", "the dog sleeps in the quiet house"),
        ("b", "stochastic gradient descent optimizes the loss surface"),
        ("b", "the loss decreases as training proceeds"),
        ("c", "quick quick quick fox fox the"),
    ]
    got = _run(spark, rows)
    all_texts = [t for _, t in rows]
    for s in ("a", "b", "c"):
        want = _py_jsd([t for src, t in rows if src == s], all_texts)
        assert abs(got[s]["js_divergence"] - want) < 1e-6, s
        assert 0.0 <= got[s]["js_divergence"] <= 1.0


def test_single_slice_corpus_has_zero_divergence(spark):
    rows = [("only", "alpha beta gamma"), ("only", "beta gamma delta")]
    got = _run(spark, rows)
    assert got["only"]["js_divergence"] == 0.0
    assert got["only"]["n_tokens"] == 6
    assert got["only"]["vocab_size"] == 4


def test_disjoint_vocab_slice_diverges_most(spark):
    rows = [
        ("en", "the cat sat on the mat"),
        ("en", "the dog ate the bone"),
        ("xx", "zzz qqq www yyy zzz qqq"),
    ]
    got = _run(spark, rows)
    # the disjoint slice must diverge strictly more than the dominant
    # one (the ceiling is well below 1: the corpus INCLUDES the slice,
    # so q already covers a third of xx's mass)
    assert got["xx"]["js_divergence"] > got["en"]["js_divergence"]
    assert got["xx"]["js_divergence"] > 0.3


def test_token_less_slice_emits_no_row(spark):
    rows = [("a", "real words here"), ("punct", "!!! ... 123")]
    got = _run(spark, rows)
    # a slice with zero tokens has no distribution — absent, not NaN
    assert set(got) == {"a"}


def test_pairwise_jsd_matches_python_and_bounds(spark):
    import itertools

    a_texts = ["the quick brown fox", "the lazy dog sleeps", "the fox runs"]
    b_texts = ["gradient descent converges", "the loss decreases", "the model trains"]

    def cnt(ts):
        return Counter(w for t in ts for w in re.split("[^a-z]+", t.lower()) if w)

    pa, pb = cnt(a_texts), cnt(b_texts)
    na, nb = sum(pa.values()), sum(pb.values())
    want = 0.0
    for w in set(pa) | set(pb):
        p, q = pa.get(w, 0) / na, pb.get(w, 0) / nb
        m = (p + q) / 2
        if p:
            want += p / 2 * math.log2(p / m)
        if q:
            want += q / 2 * math.log2(q / m)
    da = spark.createDataFrame([(t,) for t in a_texts], "text string")
    db = spark.createDataFrame([(t,) for t in b_texts], "text string")
    got = drift.js_divergence_pair(da, db).collect()[0]
    assert abs(got["js_divergence"] - want) < 1e-6
    assert 0 <= got["js_divergence"] <= 1
    assert got["vocab_shared"] == len(set(pa) & set(pb))
    # identical corpora: zero divergence
    same = drift.js_divergence_pair(da, da).collect()[0]
    assert same["js_divergence"] == 0.0
    # fully disjoint vocabularies: the maximum, exactly 1 bit
    dc = spark.createDataFrame([("zzz qqq www",)], "text string")
    disj = drift.js_divergence_pair(da, dc).collect()[0]
    assert disj["js_divergence"] == 1.0 and disj["vocab_shared"] == 0


def test_token_index_merge_fold_equals_recount_random_sequences(spark):
    """Property over random batch sequences: folding unigram counts
    forward (adds for arriving text, subtracts for replaced text) lands
    exactly on a from-scratch recount of the surviving corpus — the
    invariant the continuous pipelines' index_tokens relation rides."""
    import random

    from eligibility_etl_airflow_spark.operators import drift

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(8)]

    def text():
        return " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 12)))

    def counts(texts):
        if not texts:
            return spark.createDataFrame([], "tok string, c long")
        return drift.unigram_counts(
            spark.createDataFrame([(t,) for t in texts], "text string")
        )

    for _ in range(3):
        corpus: dict[int, str] = {}
        index = spark.createDataFrame([], "tok string, c long")
        next_id = 0
        for _step in range(4):
            arriving = {next_id + i: text() for i in range(rng.randrange(1, 4))}
            next_id += len(arriving)
            replaced = {
                d: text()
                for d in rng.sample(sorted(corpus), k=min(len(corpus), 1))
            }
            add = counts(list(arriving.values()) + list(replaced.values()))
            sub = counts([corpus[d] for d in replaced]) if replaced else None
            index = spark.createDataFrame(
                drift.token_index_merge(index, add=add, subtract=sub).collect(),
                "tok string, c long",
            )
            corpus.update(arriving)
            corpus.update(replaced)
            got = {r["tok"]: r["c"] for r in index.collect()}
            want = {
                r["tok"]: r["c"]
                for r in counts(list(corpus.values())).collect()
            }
            assert got == want
