"""BM25 retrieval, exact set-similarity join, unigram-LM fluency scoring."""

from __future__ import annotations

import pytest

from eligibility_etl_airflow_spark.operators import lm, neardup, search


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- BM25


def test_bm25_rare_term_outranks_common(spark):
    # 'zebra' appears in one doc, 'data' in all — the zebra doc must win
    # a {zebra, data} query on idf alone.
    d = _docs(
        spark,
        [
            (1, "data data data data"),
            (2, "zebra data"),
            (3, "data data"),
            (4, "data"),
        ],
    )
    top = search.bm25_topk(d, "doc_id", "text", ["zebra", "data"], k=4).collect()
    assert top[0].id == 2
    assert top[0].n_matched == 2
    # every doc matches 'data', so all 4 rows come back, ranked 1..4
    assert sorted(r.rnk for r in top) == [1, 2, 3, 4]


def test_bm25_length_normalization(spark):
    # same tf for the query term; the shorter doc scores higher (b > 0)
    d = _docs(
        spark,
        [
            (1, "merge scan"),
            (2, "merge scan scan scan scan scan scan scan scan scan"),
        ],
    )
    top = search.bm25_topk(d, "doc_id", "text", ["merge"], k=2).collect()
    assert [r.id for r in top] == [1, 2]


def test_bm25_only_matching_docs_return(spark):
    d = _docs(spark, [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha")])
    top = search.bm25_topk(d, "doc_id", "text", ["alpha"], k=10).collect()
    assert sorted(r.id for r in top) == [1, 3]


def test_bm25_empty_query_raises(spark):
    d = _docs(spark, [(1, "alpha")])
    with pytest.raises(ValueError, match="at least one query term"):
        search.bm25_topk(d, "doc_id", "text", [], k=5)


# ----------------------------------------------- set-similarity join


def test_set_similarity_planted_pair_found_exactly(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank"
    near = base + " today"  # one extra trailing token → J just below 1
    other = "completely different words about spark shuffles and parquet files"
    d = _docs(spark, [(1, base), (2, near), (3, other)])
    rows = neardup.set_similarity_join(d, "doc_id", "text", threshold=0.5).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]
    (r,) = rows
    # trigram shingle sets: 12 shared, near has one extra shingle chain
    assert 0.5 <= r.inter_size / r.union_size < 1.0


def test_set_similarity_identical_docs_full_overlap(spark):
    t = "alpha beta gamma delta epsilon zeta"
    d = _docs(spark, [(1, t), (2, t)])
    (r,) = neardup.set_similarity_join(d, "doc_id", "text", threshold=0.9).collect()
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.inter_size == r.union_size


def test_set_similarity_short_docs_no_crash(spark):
    # docs shorter than shingle_k produce no shingles and no pairs
    d = _docs(spark, [(1, "one two"), (2, "one two"), (3, "x")])
    assert neardup.set_similarity_join(d, "doc_id", "text", threshold=0.5).count() == 0


def test_set_similarity_bad_threshold_raises(spark):
    d = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="threshold"):
        neardup.set_similarity_join(d, "doc_id", "text", threshold=0.0)
    with pytest.raises(ValueError, match="shingle_k"):
        neardup.set_similarity_join(d, "doc_id", "text", shingle_k=0)


def test_set_similarity_string_ids(spark):
    # id contract is type-generic (round-3 advice): string ids must work
    t = "alpha beta gamma delta epsilon zeta"
    d = spark.createDataFrame([("a", t), ("b", t)], "doc_id string, text string")
    (r,) = neardup.set_similarity_join(d, "doc_id", "text", threshold=0.9).collect()
    assert (r.id_a, r.id_b) == ("a", "b")


# ------------------------------------------------- unigram LM scoring


def test_lm_gibberish_scores_worse(spark):
    common = "data table scan join data table scan join"
    d = _docs(
        spark,
        [
            (1, common),
            (2, common),
            (3, common),
            (4, "xqzvk wfjpt bzzrl qqvnm"),  # singleton tokens → high NLL
        ],
    )
    scores = {r.id: r.mean_nll for r in lm.unigram_nll_scores(d, "doc_id", "text").collect()}
    assert scores[4] > scores[1]
    assert scores[1] == pytest.approx(scores[2])


def test_lm_external_model_and_oov_floor(spark):
    train = _docs(spark, [(1, "alpha beta alpha beta alpha beta")])
    model = lm.unigram_model(train, "doc_id", "text")
    score_df = _docs(spark, [(10, "alpha beta"), (11, "unseen tokens only")])
    scores = {
        r.id: r.mean_nll
        for r in lm.unigram_nll_scores(score_df, "doc_id", "text", model=model).collect()
    }
    # fully-OOV doc takes the smoothed floor — finite, and worse than in-vocab
    assert scores[11] > scores[10]


def test_lm_token_counts(spark):
    d = _docs(spark, [(1, "One, two... THREE!"), (2, "")])
    rows = {r.id: r.n_tokens for r in lm.unigram_nll_scores(d, "doc_id", "text").collect()}
    assert rows[1] == 3
    assert 2 not in rows  # no tokens → no score row


def test_bm25_batch_matches_single_query_loop(spark):
    d = _docs(
        spark,
        [
            (1, "data table scan join merge"),
            (2, "zebra data stream stream"),
            (3, "merge merge stream data table"),
            (4, "vector scan"),
            (5, "unrelated words entirely"),
        ],
    )
    qs = spark.createDataFrame(
        [(100, ["zebra", "data"]), (200, ["merge", "stream"]), (300, ["vector"])],
        "query_id long, terms array<string>",
    )
    batch = {
        (r.query_id, r.id): (r.n_matched, r.total_tf, r.rnk)
        for r in search.bm25_topk_batch(d, "doc_id", "text", qs, k=3).collect()
    }
    single = {}
    for qid, terms in [(100, ["zebra", "data"]), (200, ["merge", "stream"]), (300, ["vector"])]:
        for r in search.bm25_topk(d, "doc_id", "text", terms, k=3).collect():
            single[(qid, r.id)] = (r.n_matched, r.total_tf, r.rnk)
    assert batch == single


def test_bm25_batch_queries_are_independent(spark):
    # a term appearing in two queries scores identically in both
    d = _docs(spark, [(1, "alpha beta"), (2, "alpha alpha"), (3, "beta")])
    qs = spark.createDataFrame(
        [(1, ["alpha"]), (2, ["alpha", "beta"])],
        "query_id long, terms array<string>",
    )
    rows = search.bm25_topk_batch(d, "doc_id", "text", qs, k=10).collect()
    q1 = sorted((r.id, r.rnk) for r in rows if r.query_id == 1)
    assert q1 == [(1, 2), (2, 1)]  # doc 2 has tf=2 for alpha, same length


def test_bigram_lm_penalizes_scrambled_order(spark):
    # same unigram distribution, different order: the scrambled doc must
    # score worse under the bigram model (and identically under unigram)
    fluent = "the cat sat on the mat " * 5
    scrambled = "mat the on sat cat the " * 5
    d = _docs(spark, [(1, fluent.strip()), (2, scrambled.strip()), (3, fluent.strip())])
    bi = {r.id: r.mean_nll for r in lm.bigram_nll_scores(d, "doc_id", "text").collect()}
    uni = {r.id: r.mean_nll for r in lm.unigram_nll_scores(d, "doc_id", "text").collect()}
    assert bi[2] > bi[1]
    assert uni[1] == pytest.approx(uni[2])


def test_bigram_lm_lambda_validation_and_short_docs(spark):
    d = _docs(spark, [(1, "solo"), (2, "two words")])
    with pytest.raises(ValueError, match="lam"):
        lm.bigram_nll_scores(d, "doc_id", "text", lam=1.0)
    rows = {r.id: r.n_bigrams for r in lm.bigram_nll_scores(d, "doc_id", "text").collect()}
    assert 1 not in rows  # <2 tokens → no bigrams → no row
    assert rows[2] == 1


# --------------------------------------- centroids / nearest prototype


def test_label_centroids_and_assignment_roundtrip(spark):
    from eligibility_etl_airflow_spark.operators import similarity

    # two well-separated clusters; every member must come back to its own
    rows = [
        (1, [1.0, 0.0, 0.1], "a"),
        (2, [0.9, 0.1, 0.0], "a"),
        (3, [0.0, 1.0, 0.1], "b"),
        (4, [0.1, 0.9, 0.0], "b"),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    cents = similarity.label_centroids(e, "label", "embedding")
    got = {r.label: (r.centroid, r.n_members) for r in cents.collect()}
    assert got["a"][1] == 2 and got["b"][1] == 2
    assert got["a"][0] == pytest.approx([0.95, 0.05, 0.05])
    assigned = similarity.nearest_centroid_assign(e, cents, "vec_id", "embedding")
    out = {r.id: r.assigned_label for r in assigned.collect()}
    assert out == {1: "a", 2: "a", 3: "b", 4: "b"}
    assert all(r.n_candidates == 2 for r in assigned.collect())


def test_nearest_centroid_tie_breaks_on_label(spark):
    from eligibility_etl_airflow_spark.operators import similarity

    e = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [("b", [2.0, 0.0]), ("a", [3.0, 0.0])],
        "label string, centroid array<double>",
    )
    # both centroids are cosine-identical to the vector → label asc wins
    (r,) = similarity.nearest_centroid_assign(e, cents, "vec_id").collect()
    assert r.assigned_label == "a"
    assert r.sim == pytest.approx(1.0)


def test_nearest_centroid_null_vector_gets_null_row(spark):
    """A NULL embedding cannot be scored but must not crash the Arrow
    batch (np.asarray over mixed None/vector is inhomogeneous) nor drop
    the row: it comes back with null label + null sim, preserving the
    every-id-appears-once invariant."""
    from eligibility_etl_airflow_spark.operators import similarity

    e = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "label int, centroid array<double>"
    )
    out = {r.id: r for r in similarity.nearest_centroid_assign(e, cents, "vec_id").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].assigned_label == 0 and out[3].assigned_label == 1
    assert out[2].assigned_label is None and out[2].sim is None
    assert out[2].n_candidates == 2


def test_nearest_centroid_zero_norm_centroid_never_wins(spark):
    """Defined NaN semantics: a zero-norm centroid's NaN sim is masked
    to −inf before the argmax, so it cannot beat any real score; a
    zero-norm QUERY vector (all sims NaN) falls to the lowest label
    with a null sim (NaN collapses to null at the Arrow boundary)."""
    from eligibility_etl_airflow_spark.operators import similarity

    e = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        # zero-norm centroid carries the LOWEST label — the old
        # NaN-sorts-greatest accident would have handed it every row
        [(0, [0.0, 0.0]), (1, [0.9, 0.1])],
        "label int, centroid array<double>",
    )
    out = {r.id: r for r in similarity.nearest_centroid_assign(e, cents, "vec_id").collect()}
    assert out[1].assigned_label == 1 and out[1].sim > 0.9
    assert out[2].assigned_label == 0 and out[2].sim is None


def test_nearest_centroid_chunked_fallback_bit_identical(spark):
    """Closure byte ceiling: forcing the SparkFiles-chunked shape (tiny
    max_closure_bytes → several centroid chunk files) must reproduce
    the in-closure result exactly — same winners, same sims, same
    tie-breaks across chunk boundaries."""
    import random

    from eligibility_etl_airflow_spark.operators import similarity

    rng = random.Random(7)
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)
    ] + [(200, None)]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(17)],
        "label int, centroid array<double>",
    )
    flat = similarity.nearest_centroid_assign(e, cents, "vec_id")
    # 8 dims × 8 B = 64 B/centroid; 192-byte ceiling → 3 rows per chunk,
    # 6 chunk files — every cross-chunk combine path exercised
    chunked = similarity.nearest_centroid_assign(
        e, cents, "vec_id", max_closure_bytes=192
    )
    a = sorted(map(tuple, flat.collect()))
    b = sorted(map(tuple, chunked.collect()))
    assert a == b and len(a) == 201


# --------------------------------------------------- skew diagnostics


def test_skew_stats_flags_hot_key(spark):
    from eligibility_etl_airflow_spark.operators import skew

    rows = [(1, "hot")] * 90 + [(i, "cold") for i in range(2, 12)]
    df = spark.createDataFrame(
        [(k, i) for i, (k, _) in enumerate(rows)], "k long, v long"
    )
    (s,) = skew.skew_stats(df, "k").collect()
    assert s.n_rows == 100 and s.n_keys == 11 and s.max_key_rows == 90
    assert s.skew_ratio > 9
    top = skew.hot_keys(df, "k", k=3).collect()
    assert top[0].k == 1 and top[0].cnt == 90 and top[0].rnk == 1
    assert abs(top[0].share - 0.9) < 1e-9


def test_set_similarity_matches_python_bruteforce_on_random_corpus(spark):
    """Prefix-filter completeness on a seeded random corpus: the operator
    must return EXACTLY the pairs a Python brute force finds."""
    import itertools
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 18))))
        for i in range(60)
    ]
    # plant a few near-dups
    docs.append((100, docs[0][1] + " extra"))
    docs.append((101, docs[1][1]))
    k, t = 3, 0.5

    def shingles(text):
        toks = text.split()
        return {
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        } if len(toks) >= k else set()

    sh = {i: shingles(txt) for i, txt in docs}
    expect = set()
    for (a, sa), (b, sb) in itertools.combinations(sorted(sh.items()), 2):
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        if inter >= t * union:
            expect.add((a, b, inter, union))

    d = _docs(spark, docs)
    got = {
        (r.id_a, r.id_b, r.inter_size, r.union_size)
        for r in neardup.set_similarity_join(
            d, "doc_id", "text", threshold=t, shingle_k=k
        ).collect()
    }
    assert got == expect
    assert (0, 100) in {(a, b) for a, b, *_ in got}


def test_set_similarity_exact_at_float_hostile_threshold(spark):
    """t=0.55 boundary: 0.55*20 = 11.000000000000002 in IEEE double —
    float ceil/compare would shorten the prefix and drop the
    J-exactly-0.55 pair. The integer-arithmetic comparisons must keep it."""
    shared = [f"s{i:02d}" for i in range(11)]
    only_a = [f"a{i:02d}" for i in range(9)]
    a_words = shared + only_a          # |A| = 20
    b_words = shared                   # |B| = 11 → inter=11, union=20, J=0.55
    # C: 10 shared + 10 unique → J(A,C)=10/30, J(B,C)=10/21 — both < 0.55
    c_words = shared[:10] + [f"c{i:02d}" for i in range(10)]
    d = _docs(
        spark,
        [(1, " ".join(a_words)), (2, " ".join(b_words)), (3, " ".join(c_words))],
    )
    rows = neardup.set_similarity_join(
        d, "doc_id", "text", threshold=0.55, shingle_k=1
    ).collect()
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 2)}
    (r,) = [x for x in rows if (x.id_a, x.id_b) == (1, 2)]
    assert (r.inter_size, r.union_size) == (11, 20)


def test_bm25_matches_python_reference_on_random_corpus(spark):
    """Rank-for-rank equivalence with a from-scratch Python BM25 on a
    seeded random corpus."""
    import math
    import random

    rng = random.Random(11)
    vocab = ["".join(chr(97 + (i + j) % 26) for j in range(3)) for i in range(15)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25))))
        for i in range(40)
    ]
    terms = [vocab[0], vocab[3], vocab[7]]
    k1, b = 1.2, 0.75

    toks = {i: t.split() for i, t in docs}
    dl = {i: len(t) for i, t in toks.items()}
    with_tokens = [i for i in toks if dl[i] > 0]
    avgdl = sum(dl[i] for i in with_tokens) / len(with_tokens)
    n = len(docs)
    scores = {}
    for i, ts in toks.items():
        s, matched, total_tf = 0.0, 0, 0
        for term in terms:
            tf = ts.count(term)
            if tf == 0:
                continue
            dfreq = sum(1 for j in toks.values() if term in j)
            idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl[i] / avgdl))
            matched += 1
            total_tf += tf
        if matched:
            scores[i] = (s, matched, total_tf)
    order = sorted(scores, key=lambda i: (-scores[i][0], i))[:10]
    expect = {
        i: (scores[i][1], scores[i][2], rnk + 1) for rnk, i in enumerate(order)
    }

    d = _docs(spark, docs)
    got = {
        r.id: (r.n_matched, r.total_tf, r.rnk)
        for r in search.bm25_topk(d, "doc_id", "text", terms, k=10).collect()
    }
    assert got == expect


def test_unigram_lm_matches_python_reference(spark):
    import math
    import random

    rng = random.Random(3)
    vocab = ["".join(chr(97 + (i + j) % 26) for j in range(4)) for i in range(8)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
        for i in range(25)
    ]
    toks = {i: t.split() for i, t in docs}
    counts = {}
    for ts in toks.values():
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    total, v = sum(counts.values()), len(counts)
    expect = {
        i: sum(-math.log((counts[t] + 1.0) / (total + v + 1.0)) for t in ts) / len(ts)
        for i, ts in toks.items()
    }
    d = _docs(spark, docs)
    got = {r.id: r.mean_nll for r in lm.unigram_nll_scores(d, "doc_id", "text").collect()}
    assert set(got) == set(expect)
    for i in got:
        assert got[i] == pytest.approx(expect[i], rel=1e-12)


# ---------------------------------------------------------------- RRF fusion


def test_rrf_fuse_hand_computed_single_query(spark):
    # lex ranks docs (1,2,3)=(1,2,3); sem ranks (3,4)=(1,2).
    # RRF(60): doc3 = 1/63 + 1/61 ≈ 0.032264 wins over doc1 = 1/61,
    # doc4 = 1/62, doc2 = 1/62 — doc2/doc4 tie on score, id breaks it.
    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rnk long"
    )
    sem = spark.createDataFrame([(3, 1), (4, 2)], "doc_id long, rnk long")
    out = search.rrf_fuse(
        [("lex", lex), ("sem", sem)], k=10, by=None, id_col="doc_id"
    ).collect()
    got = {r["doc_id"]: (r["n_systems"], r["rrf_rank"]) for r in out}
    assert got[3] == (2, 1)  # ranked by both systems → fused winner
    assert got[1] == (1, 2)  # 1/61 beats the 1/62 pair
    assert got[2] == (1, 3) and got[4] == (1, 4)  # tie → lower id first


def test_rrf_fuse_per_query_partitioning(spark):
    # two queries fused independently: ranks never leak across queries
    a = spark.createDataFrame(
        [("q1", 10, 1), ("q2", 20, 1)], "query_id string, id long, rnk long"
    )
    b = spark.createDataFrame(
        [("q1", 10, 1), ("q2", 30, 1)], "query_id string, id long, rnk long"
    )
    out = search.rrf_fuse([("a", a), ("b", b)], k=1).collect()
    got = {r["query_id"]: (r["id"], r["n_systems"]) for r in out}
    assert got == {"q1": (10, 2), "q2": (20, 1)}  # q2 tie → lower id


def test_rrf_fuse_contracts(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id long, rnk long")
    with pytest.raises(ValueError, match="at least one"):
        search.rrf_fuse([])
    with pytest.raises(ValueError, match="k_rrf"):
        search.rrf_fuse([("a", df)], k_rrf=0, by=None, id_col="doc_id")
    with pytest.raises(ValueError, match="lacks column"):
        search.rrf_fuse([("a", df)], by=None, id_col="missing_id")


# -------------------------------------------- exact-substring decontamination


def test_substring_decontam_planted_and_guards(spark):
    from eligibility_etl_airflow_spark.operators import decontam

    corpus = spark.createDataFrame(
        [
            (1, "The secret   ANSWER IS forty two, obviously."),  # hit (normalized)
            (2, "nothing to see here at all"),                    # clean
            (3, "answer is forty two AND answer is forty two"),   # hit (twice, 1 bench row)
            (4, None),                                            # null text -> excluded
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "Answer IS  forty two")], "bench_id long, bench_text string"
    )
    out = {
        r["doc_id"]: r
        for r in decontam.substring_contamination_flags(corpus, bench).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["contaminated"] == 1 and out[1]["n_bench_hits"] == 1
    assert out[2]["contaminated"] == 0
    assert out[3]["contaminated"] == 1  # contains counts the bench row once

    # a too-short needle must raise, not silently flag half the corpus
    import pytest as _pt

    short = spark.createDataFrame([(7, "hi")], "bench_id long, bench_text string")
    with _pt.raises(Exception, match="substring_contamination_flags"):
        decontam.substring_contamination_flags(corpus, short).collect()


def test_substring_decontam_plan_broadcasts_bench(spark):
    from eligibility_etl_airflow_spark.operators import decontam

    corpus = spark.createDataFrame(
        [(i, f"document body number {i} with enough text") for i in range(20)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, "document body number 3")], "bench_id long, bench_text string"
    )
    plan = (
        decontam.substring_contamination_flags(corpus, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan  # corpus never shuffles at pair grain


# ----------------------------------------------------- containment join


def test_containment_finds_inclusion_jaccard_misses(spark):
    # B is A quoted whole inside 10x more text: containment(B in A+B
    # composite) ~ 1 but Jaccard ~ 0.1 — the Jaccard join at any useful
    # threshold never surfaces this pair, the containment join must
    base = " ".join(f"w{i}" for i in range(12))
    big = base + " " + " ".join(f"filler{i} pad{i} more{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, big), (2, base), (3, "entirely unrelated words only here now")],
        "doc_id long, text string",
    )
    out = neardup.containment_join(docs, "doc_id", "text", threshold=0.8, shingle_k=3)
    rows = out.collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
    r = rows[0]
    assert r["containment_b"] == 1.0  # B's shingles all inside A
    assert r["containment_a"] < 0.2   # the Jaccard view of the same pair
    # and the Jaccard operator indeed misses it at a normal threshold
    jac = neardup.set_similarity_join(docs, "doc_id", "text", threshold=0.5, shingle_k=3)
    assert jac.count() == 0


def test_containment_threshold_and_validation(spark):
    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    import pytest as _pt

    with _pt.raises(ValueError, match="threshold"):
        neardup.containment_join(docs, "doc_id", "text", threshold=0.0)
    with _pt.raises(ValueError, match="shingle_k"):
        neardup.containment_join(docs, "doc_id", "text", shingle_k=0)


def test_containment_exact_boundary(spark):
    # 5 shingles in the small doc, 4 shared: containment exactly 0.8
    # must SURVIVE at t=0.8 (integer arithmetic, no float-ceil slop)
    small = "a b c d e f g"           # 2-shingles: ab bc cd de ef fg (6)
    # big shares exactly ab bc cd de ef (drop fg, add disjoint tail)
    big = "a b c d e f x y z q r s t u v w"
    docs = spark.createDataFrame(
        [(1, big), (2, small)], "doc_id long, text string"
    )
    out = neardup.containment_join(docs, "doc_id", "text", threshold=0.8, shingle_k=2)
    rows = out.collect()
    assert len(rows) == 1
    # small doc has 6 2-shingles, 5 shared ('f g' missing, 'e f' present)
    assert rows[0]["inter_size"] == 5 and rows[0]["len_b"] == 6
    assert rows[0]["containment_b"] == 0.833333


def test_nearest_centroid_block_boundary_matches_numpy(spark):
    """The in-closure path processes centroids in 512-column matmul
    blocks (the memory bound); with k > 512 the cross-block combine
    must reproduce a plain full-matrix argmax exactly — including ties
    that straddle a block boundary."""
    import numpy as np

    from eligibility_etl_airflow_spark.operators import similarity

    rng = np.random.default_rng(11)
    k, dim, n = 600, 4, 64
    C = rng.uniform(-1, 1, (k, dim))
    # force boundary-straddling ties: centroid 700 duplicates centroid 3
    # (same direction → identical rounded sim; lower label must win)
    C[599] = C[3]
    X = rng.uniform(-1, 1, (n, dim))
    cents = spark.createDataFrame(
        [(i, [float(x) for x in C[i]]) for i in range(k)],
        "label int, centroid array<double>",
    )
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.id: (r.assigned_label, r.sim)
        for r in similarity.nearest_centroid_assign(vecs, cents, "vec_id").collect()
    }
    sims = np.round(
        (X @ C.T)
        / (np.sqrt((X * X).sum(1))[:, None] * np.sqrt((C * C).sum(1))[None, :]),
        6,
    )
    want = np.argmax(sims, axis=1)  # numpy first-max == lowest label
    for i in range(n):
        assert got[i][0] == want[i], (i, got[i], want[i])
        assert got[i][1] == pytest.approx(sims[i, want[i]], abs=1e-9)
