"""Invariant + recall tests for the hash-family near-dup / ANN operators
(the rows-only queries the driver can't oracle-check).

Strategy: plant known near-duplicates/exact duplicates into a small
DataFrame, assert the LSH/SimHash pipelines find them, and measure LSH
top-k recall against the exact brute-force baseline on the real
embeddings testdata.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.catalog import Catalog
from eligibility_etl_airflow_spark.operators import neardup, similarity


def _planted_docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the rain in "
        "spain falls mainly on the plain and every good boy does fine"
    )
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("lazy dog", "sleepy dog")),  # near dup of 1
        (4, "completely different content about spark catalyst tungsten "
            "adaptive query execution and shuffle partitions at scale"),
        (5, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
            "eiusmod tempor incididunt ut labore et dolore magna aliqua"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_minhash_lsh_finds_planted_dups(spark):
    docs = _planted_docs(spark)
    pairs = _pairs(neardup.minhash_lsh_pairs(docs, "doc_id", "text", jaccard_threshold=0.5))
    assert (1, 2) in pairs  # exact dup must always surface
    assert (1, 3) in pairs and (2, 3) in pairs  # one-word edit
    # unrelated docs never pass exact-Jaccard verification
    assert all(4 not in p and 5 not in p for p in pairs)


def test_minhash_exact_dup_has_identical_signature(spark):
    docs = _planted_docs(spark)
    sigs = {r.id: r.sig for r in neardup.minhash_signatures(docs, "doc_id", "text").collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_simhash_block_pairs_finds_planted_dups(spark):
    # SimHash hamming distance tracks the *fraction* of tokens edited, so
    # the planted near-dup is a 1-in-300-token edit (hamming 2 under the
    # deterministic xxhash64 token family) — a 1-in-24 edit like
    # _planted_docs' drifts ~7 bits, beyond the 4-block ≤3 guarantee.
    base_toks = [f"tok{i}" for i in range(300)]
    edited = [("edited" if i == 50 else t) for i, t in enumerate(base_toks)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(base_toks)),
            (2, " ".join(base_toks)),  # exact dup of 1
            (3, " ".join(edited)),  # near dup of 1
            (4, "completely different content about spark catalyst"),
            (5, "lorem ipsum dolor sit amet consectetur adipiscing"),
        ],
        "doc_id long, text string",
    )
    sigs = neardup.simhash64(docs, "doc_id", "text")
    by_id = {r.doc_id: r.simhash for r in sigs.collect()}
    assert by_id[1] == by_id[2]  # identical text → identical signature
    pairs = neardup.simhash_block_pairs(sigs, "doc_id", max_hamming=3)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[(1, 2)] == 0
    assert (1, 3) in got and 0 < got[(1, 3)] <= 3  # small edit, found
    assert (4, 5) not in got


def test_simhash_empty_and_null_text(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one token"), (4, None)],
        "doc_id long, text string",
    )
    by_id = {r.doc_id: r.simhash for r in neardup.simhash64(docs, "doc_id", "text").collect()}
    assert by_id[1] == 0 and by_id[2] == 0  # no tokens → zero signature
    assert by_id[3] != 0
    assert by_id[4] == 0  # NULL text behaves like empty, never crashes


def test_bucket_cap_drops_degenerate_buckets(spark):
    # 20 identical docs: every band bucket has size 20 > cap 10 → no pairs.
    docs = spark.createDataFrame(
        [(i, "same boilerplate text repeated everywhere in the corpus") for i in range(20)],
        "doc_id long, text string",
    )
    capped = neardup.minhash_lsh_pairs(docs, "doc_id", "text", max_bucket_size=10)
    assert capped.count() == 0
    uncapped = neardup.minhash_lsh_pairs(docs, "doc_id", "text", max_bucket_size=1000)
    assert uncapped.count() == 20 * 19 // 2


def test_lsh_topk_recall_vs_bruteforce(spark, sf_dir):
    e = Catalog(spark, sf_dir).embeddings
    queries = e.filter(F.col("vec_id") < 8)
    exact = similarity.brute_force_topk(e, queries, k=5)
    approx = similarity.lsh_topk(
        e, queries, dim=64, k=5, n_planes=6, n_tables=8, multiprobe_bits=1
    )
    exact_set = {(r.query_id, r.corpus_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.corpus_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    # Testdata embeddings are near-uniform random (top-5 cosine ≈ 0.3, the
    # hardest LSH regime); 8 tables × 6 planes + 1-bit multiprobe gives
    # ~0.83 expected recall there. Floor at 0.5 to stay deterministic-safe.
    assert recall >= 0.5, f"LSH recall {recall:.2f} below floor"
    # every approx hit must carry the exact cosine (scoring is exact inside buckets)
    joined = approx.alias("a").join(
        exact.alias("e"), ["query_id", "corpus_id"]
    ).filter(F.abs(F.col("a.sim") - F.col("e.sim")) > 1e-9)
    assert joined.count() == 0


def test_lsh_topk_planted_neighbors(spark):
    """Planted high-cosine neighbors (the regime LSH has guarantees in)
    must be found with near-perfect recall."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((8, 64))
    rows = []
    vid = 0
    for q in range(8):
        rows.append((vid, [float(x) for x in base[q]]))  # the query itself
        vid += 1
        for _ in range(3):  # 3 planted neighbors at cosine ~0.99
            rows.append((vid, [float(x) for x in base[q] + 0.05 * rng.standard_normal(64)]))
            vid += 1
    for _ in range(200):  # noise corpus
        rows.append((vid, [float(x) for x in rng.standard_normal(64)]))
        vid += 1
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = e.filter(F.col("vec_id") % 4 == 0).filter(F.col("vec_id") < 32)
    approx = similarity.lsh_topk(
        e, queries, dim=64, k=3, n_planes=6, n_tables=8, multiprobe_bits=1
    )
    got = {(r.query_id, r.corpus_id) for r in approx.collect()}
    expected = {(q * 4, q * 4 + j) for q in range(8) for j in (1, 2, 3)}
    recall = len(got & expected) / len(expected)
    assert recall >= 0.95, f"planted-neighbor recall {recall:.2f}"


def test_ivf_topk_recall_vs_bruteforce(spark, sf_dir):
    e = Catalog(spark, sf_dir).embeddings
    queries = e.filter(F.col("vec_id") < 8)
    exact = similarity.brute_force_topk(e, queries, k=5)
    approx = similarity.ivf_topk(e, queries, k=5, n_cells=16, nprobe=4)
    exact_set = {(r.query_id, r.corpus_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.corpus_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, f"IVF recall {recall:.2f} below floor"
    # exact scoring inside probed cells: sims must match brute force
    joined = approx.alias("a").join(exact.alias("e"), ["query_id", "corpus_id"]).filter(
        F.abs(F.col("a.sim") - F.col("e.sim")) > 1e-9
    )
    assert joined.count() == 0


def test_embedding_neardup_pairs_symmetric_and_thresholded(spark, sf_dir):
    e = Catalog(spark, sf_dir).embeddings
    pairs = similarity.embedding_neardup_pairs(e, cosine_threshold=0.8, dim=64)
    rows = pairs.collect()
    assert all(r.id_a < r.id_b for r in rows)
    assert all(r.cos >= 0.8 for r in rows)


def test_embedding_neardup_pairs_finds_planted_dups(spark):
    """The testdata embeddings have no pairs above 0.8 cosine (verified:
    max pairwise cosine ≈ 0.51), so the sf-dir query legitimately returns
    0 rows — this planted test is what makes the operator falsifiable."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.standard_normal((10, 64))
    rows = []
    vid = 0
    planted = set()
    for q in range(10):
        rows.append((vid, [float(x) for x in base[q]]))
        # near-dup at cosine ~0.995
        rows.append((vid + 1, [float(x) for x in base[q] + 0.03 * rng.standard_normal(64)]))
        planted.add((vid, vid + 1))
        vid += 2
    for _ in range(100):  # noise corpus, mutually near-orthogonal
        rows.append((vid, [float(x) for x in rng.standard_normal(64)]))
        vid += 1
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.id_a, r.id_b): r.cos
        for r in similarity.embedding_neardup_pairs(e, cosine_threshold=0.95).collect()
    }
    found = planted & set(got)
    # an LSH bucket split can lose a pair when the pair straddles a
    # hyperplane; at cosine 0.995 with 10 planes that's rare — require
    # near-perfect recall and perfect precision
    assert len(found) >= 9, f"planted recall {len(found)}/10"
    assert all(c >= 0.95 for c in got.values())
    assert all(a < b for a, b in got)


def test_embedding_neardup_bucket_cap(spark):
    """A degenerate bucket (identical vectors) larger than
    max_bucket_size must be dropped, not quadratically expanded."""
    vec = [float(i % 7) + 1.0 for i in range(64)]
    rows = [(i, vec) for i in range(30)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = similarity.embedding_neardup_pairs(e, cosine_threshold=0.95, max_bucket_size=10)
    assert capped.count() == 0
    uncapped = similarity.embedding_neardup_pairs(e, cosine_threshold=0.95, max_bucket_size=1000)
    assert uncapped.count() == 30 * 29 // 2


def test_winnowing_guarantee_and_compression(spark):
    """Shared substrings ≥ w+k-1 chars must share a fingerprint; the
    fingerprint set must be much smaller than the full shingle set."""
    shared = "this exact long passage is copied verbatim between documents"
    docs = spark.createDataFrame(
        [
            (1, "intro text aaa " + shared + " outro one"),
            (2, "different opening bbb " + shared + " other ending"),
            (3, "totally unrelated content with zero overlap whatsoever xyz"),
        ],
        "doc_id long, text string",
    )
    fps = neardup.winnow_fingerprints(docs, "doc_id", "text")
    rows = {r.id: set(r.fingerprints) for r in fps.collect()}
    assert rows[1] & rows[2], "copied passage must share fingerprints"
    # compression: ~2/(w+1) of hashes kept (w=4 → well under half)
    n_chars = len("intro text aaa " + shared + " outro one")
    assert len(rows[1]) < n_chars / 2
    pairs = neardup.fingerprint_overlap_pairs(fps, min_shared=2)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_minhash_signature_estimates_jaccard(spark):
    """The MinHash guarantee itself: the fraction of matching signature
    components estimates the true shingle-set Jaccard within sampling
    error (64 permutations → σ = sqrt(J(1-J)/64) ≤ 0.0625; assert a 3σ
    band). Catches order-preserving hash-family regressions, which keep
    planted exact-dups working while silently breaking the estimator."""
    import numpy as np

    rng = np.random.default_rng(3)
    words = [f"w{i:03d}" for i in range(400)]
    shared = words[:200]
    rows = []
    for doc_id, extra in [(1, words[200:300]), (2, words[300:400])]:
        toks = shared + extra  # |A∩B| / |A∪B| on token text ≈ 200/400
        rng.shuffle(toks)
        rows.append((doc_id, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    st = neardup.shingle_table(docs, "doc_id", "text")
    sh = {r.id: set(r.shingles) for r in st.collect()}
    true_j = len(sh[1] & sh[2]) / len(sh[1] | sh[2])
    sigs = {r.id: np.array(r.sig) for r in neardup.signatures_from_shingles(st).collect()}
    est = float((sigs[1] == sigs[2]).mean())
    sigma = (true_j * (1 - true_j) / 64) ** 0.5
    assert abs(est - true_j) <= 3 * sigma + 1e-9, (est, true_j)


def test_parse_byte_size_conf_strings():
    f = neardup._parse_byte_size
    assert f("134217728") == 134217728
    assert f("134217728b") == 134217728
    assert f("512m") == 512 * 1024 * 1024
    assert f("128MB") == 128 * 1024 * 1024
    assert f("1g") == 1 << 30
    assert f(" 2K ") == 2048


def test_pq_topk_recall_and_exact_sims(spark, sf_dir):
    e = Catalog(spark, sf_dir).embeddings
    queries = e.filter(F.col("vec_id") < 8)
    exact = similarity.brute_force_topk(e, queries, k=5)
    approx = similarity.pq_topk(e, queries, k=5, m=16, codes_k=32, refine=20)
    exact_set = {(r.query_id, r.corpus_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.corpus_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    # uniform-random embeddings are PQ's hardest regime; measured ~0.97
    # at these params — floor at 0.6 to stay deterministic-safe
    assert recall >= 0.6, f"PQ recall {recall:.2f} below floor"
    # the refine step re-ranks with true cosine: overlapping pairs must
    # carry sims identical to brute force
    joined = approx.alias("a").join(exact.alias("e"), ["query_id", "corpus_id"]).filter(
        F.abs(F.col("a.sim") - F.col("e.sim")) > 1e-9
    )
    assert joined.count() == 0


def test_pq_topk_planted_neighbors(spark):
    import numpy as np

    rng = np.random.default_rng(13)
    base = rng.standard_normal((6, 64))
    rows = []
    vid = 0
    for q in range(6):
        rows.append((vid, [float(x) for x in base[q]]))
        vid += 1
        for _ in range(3):  # planted neighbors at cosine ~0.99
            rows.append((vid, [float(x) for x in base[q] + 0.05 * rng.standard_normal(64)]))
            vid += 1
    for _ in range(150):
        rows.append((vid, [float(x) for x in rng.standard_normal(64)]))
        vid += 1
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = e.filter(F.col("vec_id") % 4 == 0).filter(F.col("vec_id") < 24)
    approx = similarity.pq_topk(e, queries, k=3, m=16, codes_k=32, refine=20)
    got = {(r.query_id, r.corpus_id) for r in approx.collect()}
    expected = {(q * 4, q * 4 + j) for q in range(6) for j in (1, 2, 3)}
    recall = len(got & expected) / len(expected)
    assert recall >= 0.9, f"PQ planted recall {recall:.2f}"


def test_pq_topk_empty_queries_and_heterogeneous_norms(spark):
    import numpy as np

    rng = np.random.default_rng(17)
    base = rng.standard_normal((4, 64))
    rows = []
    vid = 0
    for q in range(4):
        rows.append((vid, [float(x) for x in base[q]]))
        vid += 1
        for _ in range(2):
            rows.append((vid, [float(x) for x in base[q] + 0.05 * rng.standard_normal(64)]))
            vid += 1
    for _ in range(100):  # large-norm noise: 10× magnitude, low cosine
        rows.append((vid, [float(x) for x in 10.0 * rng.standard_normal(64)]))
        vid += 1
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # empty query set → empty result, not a crash
    none = e.filter(F.col("vec_id") < 0)
    assert similarity.pq_topk(e, none, k=3).count() == 0

    # ADC candidate ranking must be norm-corrected: unit-norm planted
    # neighbors must beat 10×-norm noise vectors
    queries = e.filter(F.col("vec_id") % 3 == 0).filter(F.col("vec_id") < 12)
    approx = similarity.pq_topk(e, queries, k=2, m=16, codes_k=32, refine=20)
    got = {(r.query_id, r.corpus_id) for r in approx.collect()}
    expected = {(q * 3, q * 3 + j) for q in range(4) for j in (1, 2)}
    recall = len(got & expected) / len(expected)
    assert recall >= 0.9, f"norm-heterogeneous recall {recall:.2f}"


@pytest.mark.slow
def test_pq_topk_chunks_past_max_queries(spark):
    """Query sets over max_queries chunk through the driver (LUT memory
    flat per chunk) and the unioned result is identical to one-shot."""
    import numpy as np

    rng = np.random.default_rng(23)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(40)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # 40 queries, chunk size 15 -> 3 chunks; must match the unchunked run
    chunked = similarity.pq_topk(e, e, k=2, m=4, codes_k=8, refine=20,
                                 max_queries=15)
    oneshot = similarity.pq_topk(e, e, k=2, m=4, codes_k=8, refine=20,
                                 max_queries=10_000)
    a = sorted((r.query_id, r.corpus_id, r.sim, r.rank) for r in chunked.collect())
    b = sorted((r.query_id, r.corpus_id, r.sim, r.rank) for r in oneshot.collect())
    assert a == b
    assert len({q for q, *_ in a}) == 40  # every query answered

    # the documented recipe — chunk the query set, reuse codebooks via
    # cache_key, union the results — matches the uncapped answer
    full = similarity.pq_topk(e, e, k=2, m=4, codes_k=8, refine=20,
                              cache_key="captest")
    chunks = [
        similarity.pq_topk(e, e.filter(F.col("vec_id") < 20), k=2, m=4,
                           codes_k=8, refine=20, max_queries=20,
                           cache_key="captest"),
        similarity.pq_topk(e, e.filter(F.col("vec_id") >= 20), k=2, m=4,
                           codes_k=8, refine=20, max_queries=20,
                           cache_key="captest"),
    ]
    got_full = {(r.query_id, r.corpus_id, r.rank) for r in full.collect()}
    got_chunks = {
        (r.query_id, r.corpus_id, r.rank)
        for ch in chunks
        for r in ch.collect()
    }
    assert got_full == got_chunks


def test_minhash_signatures_any_num_perm(spark):
    """num_perm need not divide by the LSH band count when only
    signatures are requested — 100 permutations must work."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "alpha beta gamma delta epsilon eta")],
        "doc_id long, text string",
    )
    sigs = neardup.minhash_signatures(docs, "doc_id", "text", num_perm=100)
    got = {r.doc_id if hasattr(r, "doc_id") else r.id: r.sig for r in sigs.collect()}
    assert all(len(s) == 100 for s in got.values())


def test_neardup_pair_generators_accept_string_ids(spark):
    """Doc ids are not always integral (UUIDs, URLs): the Arrow pair
    stages must mirror the input id type instead of narrowing to long."""
    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [
        ("doc-aaa", base),
        ("doc-bbb", base + "extra tail"),          # near-dup of doc-aaa
        ("doc-ccc", "completely different content about spark engines " * 6),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")

    pairs = neardup.minhash_lsh_pairs(
        docs, "doc_id", "text", jaccard_threshold=0.5
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {("doc-aaa", "doc-bbb")}

    sims = neardup.simhash64(docs, "doc_id", "text")
    assert set(sims.columns) == {"doc_id", "simhash"}
    spairs = neardup.simhash_block_pairs(
        sims.withColumnRenamed("doc_id", "id"), "id", max_hamming=10
    ).collect()
    assert ("doc-aaa", "doc-bbb") in {(r.id_a, r.id_b) for r in spairs}

    fps = neardup.winnow_fingerprints(docs, "doc_id", "text")
    fpairs = neardup.fingerprint_overlap_pairs(fps, min_shared=2).collect()
    assert ("doc-aaa", "doc-bbb") in {(r.id_a, r.id_b) for r in fpairs}


def test_edit_distance_pairs_planted_typos(spark):
    rows = [
        (1, "b", "the quick brown fox jumps over the lazy dog tonight"),
        (2, "b", "the quack brown fox jumps over the lazy dog tonight"),  # 1 typo
        (3, "b", "completely different text with nothing in common here"),
        (4, "c", "the quick brown fox jumps over the lazy dog tonight"),  # other block
    ]
    df = spark.createDataFrame(rows, "doc_id long, block string, text string")
    got = {
        (r.id_a, r.id_b): r.edit_dist
        for r in neardup.edit_distance_pairs(
            df, "doc_id", "text", "block", prefix_len=40, max_dist=3
        ).collect()
    }
    # typo pair found with the right distance; unrelated and cross-block
    # pairs absent
    assert got == {(1, 2): 1}


def test_edit_distance_threshold_boundary(spark):
    rows = [(1, "b", "aaaa"), (2, "b", "bbbb"), (3, "b", "aaab")]
    df = spark.createDataFrame(rows, "doc_id long, block string, text string")
    got = {
        (r.id_a, r.id_b): r.edit_dist
        for r in neardup.edit_distance_pairs(
            df, "doc_id", "text", "block", prefix_len=10, max_dist=3
        ).collect()
    }
    # (1,2) distance 4 > max_dist excluded; (1,3) distance 1; (2,3) distance 3
    assert got == {(1, 3): 1, (2, 3): 3}


def test_edit_distance_pairs_block_cap(spark):
    """A degenerate block past max_block_size is dropped, never expanded
    quadratically — the family-standard boilerplate guard."""
    from eligibility_etl_airflow_spark.operators import neardup

    rows = [(i, f"text number {i}", "hot") for i in range(10)]
    rows += [(100, "other doc a", "cold"), (101, "other doc b", "cold")]
    df = spark.createDataFrame(rows, "doc_id long, text string, block string")
    out = neardup.edit_distance_pairs(
        df, "doc_id", "text", "block", prefix_len=32, max_dist=20, max_block_size=5
    )
    blocks = {r.block for r in out.collect()}
    assert "hot" not in blocks  # 10 > cap of 5: dropped
    assert "cold" in blocks     # small block still pairs


def test_bipartite_lsh_finds_paraphrased_contamination(spark):
    """Planted fuzzy contamination: a bench doc lightly edited into the
    corpus is matched; unrelated corpus docs are not; verbatim copies
    score jaccard 1.0."""
    from eligibility_etl_airflow_spark.operators import neardup

    bench_text = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "falls gently on the quiet rooftops of the sleeping town tonight"
    )
    edited = bench_text.replace("quiet rooftops", "quiet red rooftops").replace(
        "tonight", "this evening"
    )
    corpus = spark.createDataFrame(
        [
            (1, bench_text),                       # verbatim leak
            (2, edited),                           # paraphrased leak
            (3, "completely unrelated text about distributed query engines "
                "shuffles partitions catalyst codegen arrow and executors"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    out = neardup.minhash_lsh_pairs_bipartite(
        corpus, bench, jaccard_threshold=0.5
    )
    rows = {r.corpus_id: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[1].jaccard == 1.0 and rows[1].bench_id == 100
    assert 0.5 <= rows[2].jaccard < 1.0


def test_bipartite_lsh_bench_band_cap(spark):
    """A boilerplate band shared by many bench docs is dropped from the
    broadcast side instead of fanning every corpus row out."""
    from eligibility_etl_airflow_spark.operators import neardup

    same = "identical boilerplate text repeated across the whole bench set"
    bench = spark.createDataFrame(
        [(i, same) for i in range(20)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame([(1, same)], "doc_id long, text string")
    capped = neardup.minhash_lsh_pairs_bipartite(
        corpus, bench, jaccard_threshold=0.5, max_bench_band_freq=5
    )
    assert capped.count() == 0  # every band over the cap: no candidates
    uncapped = neardup.minhash_lsh_pairs_bipartite(
        corpus, bench, jaccard_threshold=0.5, max_bench_band_freq=100
    )
    assert uncapped.count() == 20


def test_ngram_jaccard_hashed_and_string_paths_agree(spark, sf_dir):
    """hashed=False (collision-free string shingles) must produce the
    same pairs and jaccards as the default hashed path on real text —
    the parity that makes 'exact up to 64-bit hash collisions' an
    evidence-backed claim rather than a hope."""
    d = (
        Catalog(spark, sf_dir)
        .documents.limit(120)
        .select("doc_id", "text", F.col("lang").alias("block"))
    )
    hashed = {
        (r.id_a, r.id_b): r.jaccard
        for r in neardup.ngram_jaccard_pairs(
            d, "doc_id", "text", "block", shingle_k=3
        ).collect()
    }
    strings = {
        (r.id_a, r.id_b): r.jaccard
        for r in neardup.ngram_jaccard_pairs(
            d, "doc_id", "text", "block", shingle_k=3, hashed=False
        ).collect()
    }
    assert hashed == strings


def test_pq_topk_raises_past_chunk_ceiling(spark):
    import numpy as np

    rng = np.random.default_rng(29)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(40)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="max_chunks"):
        similarity.pq_topk(e, e, k=2, m=4, codes_k=8, max_queries=5, max_chunks=2)


def test_choose_lsh_bands_divisibility_monotonicity_validation():
    """Band auto-tuning: always divides num_perm exactly, moves toward
    fewer/wider bands as the threshold rises (the S-curve midpoint
    (1/b)^(1/r) must track the threshold), and validates inputs."""
    from eligibility_etl_airflow_spark.operators.neardup import choose_lsh_bands

    prev_bands = None
    for t in (0.2, 0.5, 0.8, 0.95):
        b, r = choose_lsh_bands(t, 64)
        assert b * r == 64
        if prev_bands is not None:
            assert b <= prev_bands  # higher threshold -> fewer bands
        prev_bands = b
    # the engine's own defaults land where the queries run them
    assert choose_lsh_bands(0.8, 64) == (4, 16)
    # beta > 1 biases toward precision (fewer/wider bands, not more)
    b_hi, _ = choose_lsh_bands(0.5, 64, beta=4.0)
    b_lo, _ = choose_lsh_bands(0.5, 64, beta=0.25)
    assert b_hi <= b_lo

    import pytest as _pt

    with _pt.raises(ValueError, match="jaccard_threshold"):
        choose_lsh_bands(1.0)
    with _pt.raises(ValueError, match="num_perm"):
        choose_lsh_bands(0.5, 0)


def test_minhash_lsh_pairs_bands_none_autotunes(spark):
    """bands=None resolves via choose_lsh_bands and produces the same
    verified pairs as passing the tuned split explicitly (verification
    is exact Jaccard, so candidate-generation parity implies result
    parity on this planted corpus)."""
    from eligibility_etl_airflow_spark.operators import neardup

    base = ("the quick brown fox jumps over the lazy dog near the old "
            "stone bridge by the river bank under the autumn sky")
    rows = [
        (1, base),
        (2, base + " with one extra trailing clause added"),
        (3, "completely different content about spark shuffle exchange "
            "partitions broadcast joins and adaptive execution plans"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    b, _ = neardup.choose_lsh_bands(0.5, 64)
    auto = sorted(
        (r["id_a"], r["id_b"]) for r in neardup.minhash_lsh_pairs(
            df, "doc_id", "text", num_perm=64, bands=None,
            jaccard_threshold=0.5,
        ).collect()
    )
    explicit = sorted(
        (r["id_a"], r["id_b"]) for r in neardup.minhash_lsh_pairs(
            df, "doc_id", "text", num_perm=64, bands=b,
            jaccard_threshold=0.5,
        ).collect()
    )
    assert auto == explicit == [(1, 2)]


def test_ivf_topk_over_index_exact_within_probed_clusters(spark, sf_dir):
    """The pre-built-index serving path: results must equal an exact
    brute force RESTRICTED to each query's nprobe best clusters — and
    with nprobe == n_clusters, equal unrestricted brute force."""
    e = Catalog(spark, sf_dir).embeddings
    vecs = e.select(
        F.col("vec_id").alias("id"),
        (F.col("vec_id") % 4).cast("long").alias("cluster"),
        similarity.as_double_array(F.col("embedding")).alias("v"),
    )
    cents = (
        vecs.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("id", "v"))).alias("m"))
        .select(
            F.col("cluster").alias("label"),
            F.transform(
                F.sequence(F.lit(0), F.size(F.element_at(F.col("m"), 1)["v"]) - 1),
                lambda i: F.aggregate(
                    "m", F.lit(0.0), lambda acc, s: acc + F.element_at(s["v"], i + 1)
                )
                / F.size("m"),
            ).alias("centroid"),
        )
    )
    queries = e.filter(F.col("vec_id") < 6)

    # full probe == unrestricted brute force
    full = similarity.ivf_topk_over_index(vecs, cents, queries, k=3, nprobe=4)
    exact = similarity.brute_force_topk(e, queries, k=3)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, exact.collect()))

    # partial probe == brute force restricted to the probed clusters
    got = similarity.ivf_topk_over_index(vecs, cents, queries, k=3, nprobe=2)
    probed = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            similarity.as_double_array(F.col("embedding")).alias("qv"),
        )
        .crossJoin(
            F.broadcast(
                cents.select(
                    F.col("label").alias("cluster"),
                    F.col("centroid").alias("cv"),
                )
            )
        )
        .withColumn("csim", F.round(similarity.cosine(F.col("qv"), F.col("cv")), 6))
    )
    from pyspark.sql.window import Window

    wp = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("cluster"))
    allowed = probed.withColumn("r", F.row_number().over(wp)).filter(
        F.col("r") <= 2
    ).select("query_id", "cluster", "qv")
    restricted = (
        vecs.join(allowed, "cluster")
        .filter(F.col("id") != F.col("query_id"))
        .withColumn(
            "sim", F.round(similarity.cosine(F.col("v"), F.col("qv")), 6)
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("id"))
    want = (
        restricted.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id",
            F.col("id").alias("corpus_id"),
            "sim",
            F.col("rank").cast("long").alias("rank"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_block_intersection_matrix_chunked_matches_dense():
    """The vocab-chunked degenerate-block path (r11 ADVICE fix: bounded
    membership-matrix memory) must produce the exact same pairwise
    intersection counts as the one-shot dense matmul."""
    import numpy as np

    from eligibility_etl_airflow_spark.operators.neardup import (
        _block_intersection_matrix,
    )

    rng = np.random.default_rng(11)
    sets = [
        np.unique(rng.integers(0, 500, size=rng.integers(1, 120)))
        for _ in range(40)
    ]
    sizes = np.fromiter((len(s) for s in sets), dtype=np.int64, count=len(sets))
    dense = _block_intersection_matrix(sets, sizes)  # default huge ceiling
    chunked = _block_intersection_matrix(sets, sizes, max_cells=257)
    assert np.array_equal(dense, chunked)
    # spot-check one pair against a set intersection
    assert dense[3, 7] == len(np.intersect1d(sets[3], sets[7]))


def test_winnow_python_stage_matches_expression(spark):
    """The default-xxhash64 winnowing stage (r11 numpy form) must equal
    the column-expression form array-for-array — same per-position
    hashes, same window minima, same first-occurrence dedup order —
    on boundary docs incl. short/empty and non-BMP text."""
    from pyspark.sql import functions as F

    from eligibility_etl_airflow_spark.operators import neardup

    cases = [
        "",
        "a",
        "abcd",
        "abcdefgh",
        "ab\U0001F600cd efgh ijkl",
        "the quick brown fox jumps over the lazy dog " * 5,
        "aaaaaaaaaaaaaaaa",  # duplicate window minima — dedup path
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "doc_id long, text string"
    )
    got = neardup.winnow_fingerprints(df, "doc_id", "text")
    normed = neardup._with_normalized_text(df, "doc_id", "text")
    norm = F.col("_norm")
    n = F.length(norm)
    k, w = 5, 4
    starts = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    hashed = normed.select(
        "id",
        F.transform(
            starts, lambda i: F.xxhash64(F.substring(norm, i, k))
        ).alias("_hashes"),
    )
    wins = F.sequence(F.lit(0), F.greatest(F.size("_hashes") - w, F.lit(0)))
    want = hashed.select(
        "id",
        F.array_distinct(
            F.transform(
                wins, lambda i: F.array_min(F.slice(F.col("_hashes"), i + 1, w))
            )
        ).alias("fingerprints"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
