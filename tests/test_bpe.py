"""BPE tokenizer: pure-core properties + Spark integration."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from eligibility_etl_airflow_spark.operators import bpe


def test_train_merges_deterministic_and_frequency_ordered():
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    m1 = bpe.train_merges_core(freqs, 10)
    m2 = bpe.train_merges_core(dict(reversed(list(freqs.items()))), 10)
    assert m1 == m2  # dict order must not leak into the vocabulary
    # 'es'+'t' dominate: 9 occurrences of (e,s) and (es,t)
    assert m1[0] == ("e", "s")
    assert ("es", "t") in m1[:3]


def test_apply_merges_follows_rank_order_not_greedy():
    # ranks force 'b'+'c' first even though 'a'+'b' appears earlier in
    # the word — inference must pick the LOWEST rank, not leftmost match
    ranks = {("b", "c"): 0, ("a", "bc"): 1}
    assert bpe.apply_merges_word("abc", ranks) == ["abc"]
    assert bpe.apply_merges_word("abx", ranks) == ["a", "b", "x"]


def test_segmentation_concatenates_to_word():
    freqs = {"hello": 4, "help": 3, "yellow": 2}
    ranks = {p: i for i, p in enumerate(bpe.train_merges_core(freqs, 8))}
    for w in ("hello", "help", "yellow", "unseen"):
        assert "".join(bpe.apply_merges_word(w, ranks)) == w


@settings(max_examples=50, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=0, max_value=20),
)
def test_more_merges_never_increase_token_count(freqs, n):
    few = {p: i for i, p in enumerate(bpe.train_merges_core(freqs, n))}
    more = {p: i for i, p in enumerate(bpe.train_merges_core(freqs, n + 5))}
    for w in freqs:
        assert len(bpe.apply_merges_word(w, more)) <= len(
            bpe.apply_merges_word(w, few)
        )
        assert "".join(bpe.apply_merges_word(w, more)) == w


def test_spark_segment_counts(spark):
    df = spark.createDataFrame(
        [(1, "the cat the cat the cat"), (2, "dog"), (3, None)],
        "doc_id long, text string",
    )
    merges = bpe.train_bpe_merges(df, "text", num_merges=10)
    # 'the' and 'cat' repeat -> they must fully merge to single tokens
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.apply_merges_word("the", ranks) == ["the"]
    assert bpe.apply_merges_word("cat", ranks) == ["cat"]
    out = {r.id: (r.n_words, r.n_tokens) for r in
           bpe.bpe_segment(df, "doc_id", "text", merges).collect()}
    assert out[1] == (6, 6)
    # 'dog' unseen pairs never merged (each pair count = 1 < 2)
    assert out[2] == (1, 3)
    assert out[3] == (0, 0)


def test_spark_segment_string_ids(spark):
    df = spark.createDataFrame([("a", "x y"), ("b", "z")], "doc_id string, text string")
    out = bpe.bpe_segment(df, "doc_id", "text", []).collect()
    assert sorted((r.id, r.n_tokens) for r in out) == [("a", 2), ("b", 1)]
