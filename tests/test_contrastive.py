"""Contrastive triplet mining: planted positives/negatives, determinism."""

from __future__ import annotations

import pytest

from eligibility_etl_airflow_spark.operators import contrastive

BASE = (
    "the quick brown fox jumps over the lazy dog while the evening sun "
    "sets slowly over the winding river bank near the old stone bridge"
)
# paraphrase: small edits — high but sub-exact overlap
PARA = (
    "the quick brown fox leaps over the lazy dog while the evening sun "
    "sets slowly over the winding river bank near the new stone bridge"
)
# lexical collider: shares words/phrases, different content
COLLIDER = (
    "a lazy dog sleeps near the stone bridge all evening while the "
    "market opens and the fishermen argue about the price of salmon"
)
UNRELATED = (
    "quarterly gross margin expanded despite elevated logistics costs "
    "as the segment mix shifted toward subscription revenue streams"
)


def _mine(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw.setdefault("num_perm", 32)
    kw.setdefault("bands", 32)  # r=1: low-jaccard collisions surface
    return contrastive.contrastive_triplets(df, "doc_id", "text", **kw).collect()


@pytest.fixture(scope="module")
def mined(spark):
    rows = [(0, BASE), (1, PARA), (2, COLLIDER), (3, UNRELATED)]
    return _mine(spark, rows, pos_min=0.4, neg_max=0.25)


def test_planted_paraphrase_is_the_positive(mined):
    by_anchor = {r["anchor_id"]: r for r in mined}
    assert 0 in by_anchor and 1 in by_anchor
    assert by_anchor[0]["positive_id"] == 1
    assert by_anchor[1]["positive_id"] == 0
    assert 0.4 <= by_anchor[0]["pos_jaccard"] <= 0.98


def test_collider_is_the_hard_negative(mined):
    by_anchor = {r["anchor_id"]: r for r in mined}
    assert by_anchor[0]["negative_id"] == 2
    assert 0 < by_anchor[0]["neg_jaccard"] <= 0.25


def test_triplet_roles_are_distinct(mined):
    for r in mined:
        assert len({r["anchor_id"], r["positive_id"], r["negative_id"]}) == 3
        assert r["neg_jaccard"] < r["pos_jaccard"]


def test_anchor_without_both_sides_emits_nothing(mined):
    # UNRELATED shares (almost) nothing: no positive, so no triplet
    assert all(r["anchor_id"] != 3 for r in mined)


def test_deterministic(spark):
    rows = [(0, BASE), (1, PARA), (2, COLLIDER), (3, UNRELATED)]
    a = sorted(map(tuple, _mine(spark, rows, pos_min=0.4, neg_max=0.25)))
    b = sorted(map(tuple, _mine(spark, rows, pos_min=0.4, neg_max=0.25)))
    assert a == b


def test_exact_duplicate_is_not_a_positive(spark):
    rows = [(0, BASE), (1, BASE), (2, COLLIDER)]
    got = _mine(spark, rows, pos_min=0.4, pos_max=0.98, neg_max=0.25)
    for r in got:
        assert r["pos_jaccard"] <= 0.98
        assert r["positive_id"] != r["anchor_id"]
    # the identical pair (jaccard 1.0) must not appear as a positive
    assert all(
        not (r["anchor_id"] in (0, 1) and r["positive_id"] in (0, 1)) for r in got
    )


def test_threshold_validation(spark):
    rows = [(0, BASE)]
    with pytest.raises(ValueError, match="neg_max"):
        _mine(spark, rows, pos_min=0.3, neg_max=0.5)
