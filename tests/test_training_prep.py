"""Unit/invariant tests for the round-5 training-prep operators:
unicode NFC, token-balanced sharding, semantic decontamination,
quality-aware cluster representatives, DSIR selection, temperature
mixing, cross-corpus priority merge, and n-gram novelty. (Oracle parity
for the registered queries runs via tests/test_oracle_parity.py.)"""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators import components, packing, similarity, text


# ---------------------------------------------------------------- unicode_nfc


def test_unicode_nfc_composes_and_passes_nulls(spark):
    decomposed = "élève naïve"
    df = spark.createDataFrame(
        [(1, decomposed), (2, "plain ascii"), (3, None)], "id int, s string"
    )
    out = {r["id"]: r["n"] for r in df.select("id", text.unicode_nfc(F.col("s")).alias("n")).collect()}
    assert out[1] == unicodedata.normalize("NFC", decomposed)
    assert out[1] != decomposed and len(out[1]) < len(decomposed)
    assert out[2] == "plain ascii"
    assert out[3] is None


# ------------------------------------------------------- assign_token_shards


def _shards(spark, rows, budget, **kw):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    return {
        r["doc_id"]: r["shard_id"]
        for r in packing.assign_token_shards(
            df, ["doc_id"], "n_tokens", budget, **kw
        ).collect()
    }


def test_token_shards_match_exclusive_prefix_sum(spark):
    rows = [(i, (i * 37) % 90 + 10) for i in range(200)]
    got = _shards(spark, rows, budget=500)
    cum = 0
    for doc_id, tok in rows:  # rows already in doc_id order
        assert got[doc_id] == cum // 500, f"doc {doc_id}"
        cum += tok


def test_token_shards_layout_independent(spark):
    rows = [(i, (i * 13) % 70 + 5) for i in range(150)]
    base = _shards(spark, rows, budget=300)
    # different physical layout: explicit partition count + shuffled input order
    df = spark.createDataFrame(list(reversed(rows)), "doc_id long, n_tokens long").repartition(7)
    got = {
        r["doc_id"]: r["shard_id"]
        for r in packing.assign_token_shards(
            df, ["doc_id"], "n_tokens", 300, num_partitions=3
        ).collect()
    }
    assert got == base


def test_token_shards_contiguous_and_order_preserving(spark):
    rows = [(i, 40) for i in range(100)]
    got = _shards(spark, rows, budget=100)
    ordered = [got[i] for i in range(100)]
    assert ordered == sorted(ordered)  # non-decreasing in corpus order
    assert ordered[0] == 0
    # floor(40*i/100) advances after every 2 or 3 docs — every closed
    # shard holds 2 or 3 docs (80 or 120 tokens around the 100 budget)
    from collections import Counter

    sizes = Counter(ordered)
    assert all(n in (2, 3) for s, n in sizes.items() if s < max(sizes))


def test_token_shards_null_and_negative_raise(spark):
    df = spark.createDataFrame([(1, 10), (2, None)], "doc_id long, n_tokens long")
    with pytest.raises(Exception, match="assign_token_shards"):
        packing.assign_token_shards(df, ["doc_id"], "n_tokens", 100).collect()
    df2 = spark.createDataFrame([(1, 10), (2, -5)], "doc_id long, n_tokens long")
    with pytest.raises(Exception, match="assign_token_shards"):
        packing.assign_token_shards(df2, ["doc_id"], "n_tokens", 100).collect()
    with pytest.raises(ValueError, match="budget"):
        packing.assign_token_shards(df, ["doc_id"], "n_tokens", 0)


# -------------------------------------------------- semantic_decontam_flags


def test_semantic_decontam_planted_duplicate_flagged(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    bench_vecs = rng.normal(size=(5, 16)).astype("float32")
    corpus_vecs = rng.normal(size=(40, 16)).astype("float32")
    corpus_vecs[7] = bench_vecs[2]  # verbatim contamination
    corpus_vecs[13] = bench_vecs[4] * 3.25  # same direction, scaled

    bench = spark.createDataFrame(
        [(int(i), v.tolist()) for i, v in enumerate(bench_vecs)],
        "bench_id long, embedding array<float>",
    )
    corpus = spark.createDataFrame(
        [(int(i), v.tolist()) for i, v in enumerate(corpus_vecs)],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r
        for r in similarity.semantic_decontam_flags(
            corpus, bench, id_col="vec_id", threshold=0.9
        ).collect()
    }
    assert len(out) == 40
    assert out[7]["contaminated"] == 1 and out[7]["nn_bench_id"] == 2
    assert out[7]["nn_sim"] == 1.0
    assert out[13]["contaminated"] == 1 and out[13]["nn_bench_id"] == 4
    # argmax matches a numpy brute force everywhere (after the same 6-dp round)
    import numpy.linalg as la

    b64 = bench_vecs.astype("float64")
    c64 = corpus_vecs.astype("float64")
    sims = (c64 @ b64.T) / (
        la.norm(c64, axis=1)[:, None] * la.norm(b64, axis=1)[None, :]
    )
    sims = np.round(sims, 6)
    for i in range(40):
        best = sims[i].max()
        expect_id = int(np.flatnonzero(sims[i] == best)[0])  # min id on ties
        assert out[i]["nn_bench_id"] == expect_id
        assert abs(out[i]["nn_sim"] - best) < 2e-6


def test_semantic_decontam_plan_is_join_free_matmul(spark):
    """r10: semantic_decontam_flags delegates to the Arrow-batched
    numpy matmul nearest-assignment — the bench ships in the task
    closure, the corpus is scanned once, and NO join of any kind
    appears (the old pin asserted the BroadcastNestedLoopJoin of the
    pre-matmul shape; the registered-query twin of this pin lives in
    tests/test_plan_shape.py::test_semantic_decontam_is_map_only_matmul)."""
    import numpy as np

    rng = np.random.default_rng(3)
    bench = spark.createDataFrame(
        [(int(i), rng.normal(size=8).tolist()) for i in range(3)],
        "bench_id long, embedding array<float>",
    )
    corpus = spark.createDataFrame(
        [(int(i), rng.normal(size=8).tolist()) for i in range(9)],
        "vec_id long, embedding array<float>",
    )
    plan = similarity.semantic_decontam_flags(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # the matmul assignment stage
    assert "Join" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------- quality-aware representatives


def test_dedup_by_components_quality_keeper(spark):
    # cluster {1,2,3} via pairs; quality picks doc 2 (not min id 1)
    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5)], "doc_id long, quality double"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    kept = components.dedup_by_components(
        docs, "doc_id", pairs, order_by=[F.col("quality").desc()]
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [2, 4]  # 2 beats 3 on the id tie-break; 4 is a singleton


# ------------------------------------------------- DSIR importance sampling


def test_importance_weights_prefer_target_like_docs(spark):
    import math

    from eligibility_etl_airflow_spark.operators import selection

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta"),        # raw-corpus-ish
            (2, "gamma delta gamma delta"),      # target-ish
            (3, "alpha beta gamma delta"),       # mixed
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10, "gamma delta gamma delta gamma delta")], "doc_id long, text string"
    )
    w = {
        r["id"]: r
        for r in selection.importance_log_weights(
            corpus, target, "doc_id", "text"
        ).collect()
    }
    assert w[2]["log_weight"] > w[3]["log_weight"] > w[1]["log_weight"]
    # pin doc 2's weight against a pure-python recompute of the add-one
    # smoothed ratio (corpus counts: 3 each; target: gamma 3, delta 3)
    src_counts = {"alpha": 3, "beta": 3, "gamma": 3, "delta": 3}
    tgt_counts = {"gamma": 3, "delta": 3}
    st, sv = sum(src_counts.values()), len(src_counts)
    tt, tv = sum(tgt_counts.values()), len(tgt_counts)

    def lr(tok):
        return math.log((tgt_counts.get(tok, 0) + 1.0) / (tt + tv + 1.0)) - math.log(
            (src_counts.get(tok, 0) + 1.0) / (st + sv + 1.0)
        )

    expect = sum(lr(t) for t in ["gamma", "delta", "gamma", "delta"])
    assert abs(w[2]["log_weight"] - expect) < 1e-9
    assert w[2]["n_tokens"] == 4


def test_gumbel_topk_deterministic_and_biased(spark):
    from eligibility_etl_airflow_spark.operators import selection

    rows = [(i, 0.0) for i in range(200)] + [(999, 50.0)]  # one huge weight
    w = spark.createDataFrame(rows, "id long, lw double")
    a = selection.gumbel_topk_select(w, "id", "lw", k=20, seed="s1").collect()
    b = selection.gumbel_topk_select(w, "id", "lw", k=20, seed="s1").collect()
    assert [r["id"] for r in a] == [r["id"] for r in b]  # rerun-stable
    assert 999 in {r["id"] for r in a}  # exp(50) weight dominates
    c = {r["id"] for r in selection.gumbel_topk_select(w, "id", "lw", k=20, seed="s2").collect()}
    assert c != {r["id"] for r in a}  # seed changes the draw
    assert len(selection.gumbel_topk_select(w, "id", "lw", k=500).collect()) == 201

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be positive"):
        selection.gumbel_topk_select(w, "id", "lw", k=0)


# ------------------------------------------------------- temperature mixing


def test_temperature_mix_flattens_toward_uniform(spark):
    from eligibility_etl_airflow_spark.operators import sampling

    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    def share_small(alpha):
        got = sampling.temperature_mix(df, "lang", alpha, seed=11).groupBy("lang").count()
        c = {r["lang"]: r["count"] for r in got.collect()}
        return c.get("small", 0) / max(sum(c.values()), 1)

    natural = share_small(1.0)
    flat = share_small(0.25)
    assert flat > natural  # lower temperature upweights the scarce stratum
    # alpha=0.25: shares ∝ 900^.25 : 100^.25 = 5.477:3.162 → small ≈ 0.366
    assert 0.25 < flat < 0.5
    assert natural < 0.2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="alpha"):
        sampling.temperature_mix(df, "lang", 0.0)
    with _pytest.raises(ValueError, match="alpha"):
        sampling.temperature_mix(df, "lang", 1.5)


# ------------------------------------------------- cross-corpus merge


def test_merge_corpora_priority_planted_collisions(spark):
    from eligibility_etl_airflow_spark.operators import dedup

    crawl = spark.createDataFrame(
        [(1, "shared document body"), (2, "crawl only body")],
        "doc_id long, text string",
    )
    curated = spark.createDataFrame(
        [(10, "shared document body"), (11, "curated only body")],
        "doc_id long, text string",
    )
    merged = dedup.merge_corpora_priority(
        [("curated", 2, curated), ("crawl", 0, crawl)], "doc_id", "text"
    )
    rows = {r["doc_id"]: r for r in merged.collect()}
    # the shared text resolves to the CURATED copy despite the crawl's lower id
    assert set(rows) == {10, 2, 11}
    assert rows[10]["corpus"] == "curated" and rows[10]["n_copies"] == 2
    assert rows[2]["n_copies"] == 1 and rows[11]["n_copies"] == 1
    # whitespace/case variants hash together (normalized fingerprint)
    variant = spark.createDataFrame([(20, "  SHARED   document body ")], "doc_id long, text string")
    merged2 = dedup.merge_corpora_priority(
        [("curated", 2, curated), ("variant", 1, variant)], "doc_id", "text"
    )
    kept = {r["doc_id"] for r in merged2.collect()}
    assert 20 not in kept and 10 in kept

    import pytest as _pytest

    with _pytest.raises(ValueError, match="corpora"):
        dedup.merge_corpora_priority([], "doc_id", "text")


def test_merge_corpora_priority_tie_breaks_on_id(spark):
    from eligibility_etl_airflow_spark.operators import dedup

    a = spark.createDataFrame([(5, "same body")], "doc_id long, text string")
    b = spark.createDataFrame([(3, "same body")], "doc_id long, text string")
    merged = dedup.merge_corpora_priority(
        [("a", 1, a), ("b", 1, b)], "doc_id", "text"
    ).collect()
    assert len(merged) == 1 and merged[0]["doc_id"] == 3  # equal priority → min id


def test_merge_corpora_priority_full_tie_breaks_on_corpus(spark):
    # independent corpora routinely share 1-based id spaces: on a full
    # (priority, id) tie the corpus name is the last deterministic key,
    # so the provenance column cannot flap between runs
    from eligibility_etl_airflow_spark.operators import dedup

    a = spark.createDataFrame([(1, "same body")], "doc_id long, text string")
    b = spark.createDataFrame([(1, "same body")], "doc_id long, text string")
    merged = dedup.merge_corpora_priority(
        [("zeta", 1, a), ("alpha", 1, b)], "doc_id", "text"
    ).collect()
    assert len(merged) == 1
    assert merged[0]["corpus"] == "alpha" and merged[0]["n_copies"] == 2


# ------------------------------------------------------- n-gram novelty


def test_ngram_novelty_planted_extremes(spark, sf_dir):
    # two byte-identical docs over one alphabet, one doc over a disjoint
    # alphabet: the twins share EVERY shingle (novelty 0), the loner
    # shares none (novelty 1)
    from eligibility_etl_airflow_spark import registry

    registry.load_all()
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": ["aabbccddee aabbcc", "aabbccddee aabbcc", "zzyyxxwwvv zzyyxx"],
                "lang": ["en"] * 3,
                "source": ["s"] * 3,
                "n_chars": pa.array([17] * 3, pa.int64()),
            }
        )
        pq.write_table(t, os.path.join(td, "documents.parquet"))
        out = {
            r["doc_id"]: r
            for r in registry.QUERIES["ngram_novelty_scores"](spark, td).collect()
        }
    assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0
    assert out[3]["novelty"] == 1.0
    assert out[1]["n_unique"] == 0 and out[3]["n_unique"] == out[3]["n_grams"]


def test_merge_corpora_priority_loud_contracts(spark):
    from eligibility_etl_airflow_spark.operators import dedup

    ok = spark.createDataFrame([(1, "body")], "doc_id long, text string")
    with_null = spark.createDataFrame(
        [(2, "x"), (3, None)], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="merge_corpora_priority"):
        dedup.merge_corpora_priority(
            [("a", 1, ok), ("b", 0, with_null)], "doc_id", "text"
        ).collect()
    clashing = spark.createDataFrame(
        [(4, "y", 9)], "doc_id long, text string, priority int"
    )
    with pytest.raises(ValueError, match="provenance"):
        dedup.merge_corpora_priority([("a", 1, clashing)], "doc_id", "text")


# ------------------------------------------------------- data-budget plan


def test_plan_data_budget_math_and_alarms(spark):
    from eligibility_etl_airflow_spark.operators import sampling

    rows = [(i, "web", 100) for i in range(10)] + [(100 + i, "code", 50) for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, n_tokens long")
    plan = {
        r["stratum"]: r
        for r in sampling.plan_data_budget(
            df, "domain", "n_tokens", {"web": 0.5, "code": 0.25, "books": 0.25}, 400
        ).collect()
    }
    assert set(plan) == {"web", "code", "books"}
    web, code, books = plan["web"], plan["code"], plan["books"]
    assert web["tokens_available"] == 1000 and web["tokens_requested"] == 200
    assert web["epochs_needed"] == 0.2 and web["fits_in_one_epoch"] == 1
    assert code["tokens_available"] == 100 and code["tokens_requested"] == 100
    assert code["epochs_needed"] == 1.0 and code["fits_in_one_epoch"] == 1
    # absent stratum: zero availability, null epochs, alarm row present
    assert books["n_docs"] == 0 and books["tokens_available"] == 0
    assert books["epochs_needed"] is None and books["fits_in_one_epoch"] == 0

    with pytest.raises(ValueError, match="sum to 1"):
        sampling.plan_data_budget(df, "domain", "n_tokens", {"web": 0.5}, 400)
    with pytest.raises(ValueError, match="budget"):
        sampling.plan_data_budget(df, "domain", "n_tokens", {"web": 1.0}, 0)
    # a negative share must raise, not be silently dropped into a mix
    # that happens to re-sum to 1
    with pytest.raises(ValueError, match=">= 0"):
        sampling.plan_data_budget(
            df, "domain", "n_tokens", {"web": 0.5, "code": 0.5, "books": -0.1}, 400
        )
    # a zero-share stratum stays IN the plan (zero request), it does
    # not vanish — omission is the failure mode the table exists to
    # prevent
    zplan = {
        r["stratum"]: r
        for r in sampling.plan_data_budget(
            df, "domain", "n_tokens", {"web": 1.0, "code": 0.0}, 400
        ).collect()
    }
    assert set(zplan) == {"web", "code"}
    assert zplan["code"]["tokens_requested"] == 0
    assert zplan["code"]["fits_in_one_epoch"] == 1
    assert zplan["code"]["epochs_needed"] == 0.0


# ------------------------------------------------------- rank-blend fusion


def test_rank_normalize_blend_hand_computed_with_ties(spark):
    from pyspark.sql import functions as F

    from eligibility_etl_airflow_spark.operators import selection

    # values 10,20,20,40 -> cnt_less 0,1,1,3 over denom 3:
    # percentiles 0, 1/3, 1/3, 1 (min-rank ties, SQL percent_rank)
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 20), (4, 40)], "id long, v long"
    )
    out = {
        r["id"]: r
        for r in selection.rank_normalize_blend(
            df, "id", {"v": F.col("v")}
        ).collect()
    }
    assert out[1]["pr_v"] == 0.0 and out[4]["pr_v"] == 1.0
    assert out[2]["pr_v"] == out[3]["pr_v"] == 0.333333
    # single signal: blend == its percentile
    assert all(out[i]["blend"] == out[i]["pr_v"] for i in out)


def test_rank_normalize_blend_weights_and_contracts(spark):
    from pyspark.sql import functions as F

    from eligibility_etl_airflow_spark.operators import selection

    df = spark.createDataFrame(
        [(1, 1, 4), (2, 2, 3), (3, 3, 2), (4, 4, 1)], "id long, a long, b long"
    )
    sigs = {"a": F.col("a"), "b": F.col("b")}
    # a and b are perfectly anti-ranked: equal weights blend to a
    # constant 0.5 for every row
    eq = selection.rank_normalize_blend(df, "id", sigs).collect()
    assert all(r["blend"] == 0.5 for r in eq)
    # weight fully on a -> blend == pr_a
    wa = selection.rank_normalize_blend(
        df, "id", sigs, weights={"a": 1.0, "b": 0.0}
    ).collect()
    assert all(r["blend"] == r["pr_a"] for r in wa)

    import pytest as _pt

    with _pt.raises(ValueError, match="at least one"):
        selection.rank_normalize_blend(df, "id", {})
    with _pt.raises(ValueError, match="must match"):
        selection.rank_normalize_blend(df, "id", sigs, weights={"a": 1.0})
    with _pt.raises(ValueError, match="positive sum"):
        selection.rank_normalize_blend(df, "id", sigs, weights={"a": 0.0, "b": 0.0})


def test_rank_normalize_blend_null_signal_raises(spark):
    from pyspark.sql import functions as F

    from eligibility_etl_airflow_spark.operators import selection

    df = spark.createDataFrame([(1, 5), (2, None)], "id long, v long")
    with pytest.raises(Exception, match="rank_normalize_blend"):
        selection.rank_normalize_blend(df, "id", {"v": F.col("v")}).collect()


# ----------------------------------------------------- blocklist filtering


def test_blocklist_metrics_counts_and_threshold(spark):
    from eligibility_etl_airflow_spark.operators import text

    rows = [
        (1, "clean words only here today friend"),          # 0 hits / 6
        (2, "the BADWORD appears once in seven tokens x"),  # 1 / 8
        (3, "badword badword badword"),                     # 3 / 3
        (4, "badwordy is not a whole-word match"),          # substring: 0
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in text.blocklist_metrics(
            df, "doc_id", "text", terms=("badword",), max_fraction=0.2
        ).collect()
    }
    assert out[1]["blocklist_hits"] == 0 and out[1]["keep"]
    assert out[2]["blocklist_hits"] == 1 and out[2]["n_tokens"] == 8
    assert out[2]["keep"]  # 1/8 = 0.125 <= 0.2
    assert out[3]["blocklist_hits"] == 3 and not out[3]["keep"]
    assert out[4]["blocklist_hits"] == 0  # \b guard: no substring fire
    # null/empty docs: zero tokens, zero hits, keep=True (not null)
    for d in (5, 6):
        assert out[d]["n_tokens"] == 0 and out[d]["hit_fraction"] == 0.0
        assert out[d]["keep"] is True

    import pytest as _pt

    with _pt.raises(ValueError, match="non-empty"):
        text.blocklist_metrics(df, "doc_id", "text", terms=())


def test_blocklist_terms_are_regex_escaped(spark):
    from eligibility_etl_airflow_spark.operators import text

    # a term with regex metachars must match literally, not as a pattern
    df = spark.createDataFrame(
        [(1, "call c++ now"), (2, "call cxx now")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["blocklist_hits"]
        for r in text.blocklist_metrics(df, "doc_id", "text", terms=("c++",)).collect()
    }
    assert out[1] >= 1 and out[2] == 0


# ----------------------------------------------- compression-ratio signal


def test_zlib_sizes_match_direct_zlib(spark):
    import zlib

    from pyspark.sql import functions as F

    from eligibility_etl_airflow_spark.operators import text

    rows = [
        (1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa" * 20),
        (2, "the quick brown fox jumps over the lazy dog " * 10),
        (3, "k9#pQ@z!mV$xR&wL*eT%yU^iO(sD)fG_hJ+aB=cN"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in df.select("doc_id", text.zlib_sizes(F.col("text")).alias("z"))
        .select("doc_id", "z.raw_bytes", "z.comp_bytes")
        .collect()
    }
    for doc_id, t in rows:
        if t is None:
            assert out[doc_id]["raw_bytes"] is None
            assert out[doc_id]["comp_bytes"] is None
        else:
            b = t.encode("utf-8")
            assert out[doc_id]["raw_bytes"] == len(b)
            assert out[doc_id]["comp_bytes"] == len(zlib.compress(b, 6))
    # repetitive text compresses far below the high-entropy string
    rep = out[1]["comp_bytes"] / out[1]["raw_bytes"]
    rand = out[3]["comp_bytes"] / out[3]["raw_bytes"]
    assert rep < 0.05 < rand


# -------------------------------------------------- HTML strip + scripts


def test_strip_html_blocks_tags_entities(spark):
    from pyspark.sql import functions as F

    from eligibility_etl_airflow_spark.operators import text

    html = (
        "<html><head><STYLE>p { color: red }</STYLE>"
        "<SCRIPT>var x = '<b>not text</b>';\nalert(1)</SCRIPT></head>"
        "<body><!-- note -->\n<h1>Title</h1><p>A &amp;amp; B &lt;tag&gt; "
        "O&#39;Neil&nbsp;here</p></body></html>"
    )
    df = spark.createDataFrame([(1, html), (2, None)], "k long, t string")
    out = {
        r["k"]: r["c"]
        for r in df.select("k", text.strip_html(F.col("t")).alias("c")).collect()
    }
    # script/style contents gone, entities decoded, &amp;amp; -> &amp;
    assert out[1] == "Title A &amp; B <tag> O'Neil here"
    assert out[2] is None
    # collapse_ws=False keeps the newline structure
    raw = df.filter("k = 1").select(
        text.strip_html(F.col("t"), collapse_ws=False).alias("c")
    ).collect()[0]["c"]
    assert "\n" in raw


def test_script_profile_fractions(spark):
    from pyspark.sql import functions as F

    from eligibility_etl_airflow_spark.operators import text

    # 4 latin + 1 space + 2 cyrillic + 2 han + 1 digit + 1 other = 11 chars
    s = "abcd Пр中文" + "7" + "@"
    df = spark.createDataFrame([(1, s), (2, "")], "k long, t string")
    out = {
        r["k"]: r
        for r in df.select("k", *text.script_profile(F.col("t"))).collect()
    }
    r = out[1]
    assert r["frac_latin"] == round(4 / 11, 6)
    assert r["frac_cyrillic"] == round(2 / 11, 6)
    assert r["frac_han"] == round(2 / 11, 6)
    assert r["frac_digit"] == round(1 / 11, 6)
    assert r["frac_space"] == round(1 / 11, 6)
    assert r["frac_other"] == round(1 / 11, 6)
    # empty doc: all-zero, no divide-by-zero
    assert all(out[2][c] == 0.0 for c in out[2].asDict() if c.startswith("frac_"))


def test_frequent_ngrams_planted_boilerplate_and_ties(spark):
    """A planted boilerplate phrase dominates the table with the right
    occurrence and doc counts; equal-count phrases order
    lexicographically (fully deterministic output)."""
    from eligibility_etl_airflow_spark.plans.training_prep import frequent_ngrams_q
    from eligibility_etl_airflow_spark.registry import QUERIES

    boiler = "subscribe to our newsletter for updates"
    rows = [
        (1, f"{boiler} plus article one body text here"),
        (2, f"{boiler} plus another piece of writing"),
        (3, f"intro then {boiler} at the middle"),
        (4, f"{boiler} {boiler} twice in one doc"),
        (5, "completely unrelated document with its own words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import unittest.mock as mock

    with mock.patch(
        "eligibility_etl_airflow_spark.plans.training_prep.Catalog"
    ) as cat:
        cat.return_value.documents = df
        out = frequent_ngrams_q(spark, "unused").collect()
    top = out[0]
    # the full 6-word boilerplate yields two 5-gram windows; the leading
    # window "subscribe to our newsletter for" occurs once per phrase
    # occurrence: docs 1,2,3 once + doc 4 twice (+1 straddle) = planted
    assert top["ngram"].startswith("subscribe to our newsletter")
    assert top["n_occurrences"] >= 5
    assert top["n_docs"] == 4
    # determinism: ties sort lexicographically
    for a, b in zip(out, out[1:]):
        assert a["n_occurrences"] >= b["n_occurrences"]
        if a["n_occurrences"] == b["n_occurrences"]:
            assert a["ngram"] < b["ngram"]


def test_mojibake_detection_planted_and_clean(spark):
    """Derived cp1252 signatures fire on classic double-encoded text,
    stay silent on clean accented text (the real characters, not their
    mojibake forms), and the density gate drops only the dirty doc."""
    from eligibility_etl_airflow_spark.operators import text as text_ops

    dirty = (
        "caf" + "é".encode("utf-8").decode("cp1252")
        + " it" + "’".encode("utf-8").decode("cp1252")
        + "s a caf" + "é".encode("utf-8").decode("cp1252")
    )
    clean = "café it’s a café with naïve charm"
    df = spark.createDataFrame(
        [(1, dirty), (2, clean), (3, "plain ascii text only"), (4, "")],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in text_ops.mojibake_metrics(df, "doc_id", "text").collect()
    }
    assert out[1]["n_mojibake"] == 3 and not out[1]["keep"]
    assert out[2]["n_mojibake"] == 0 and out[2]["keep"]
    assert out[3]["n_mojibake"] == 0 and out[3]["keep"]
    assert out[4]["n_mojibake"] == 0 and out[4]["keep"]
    # the signature table is derived, never hand-typed: every entry is
    # the cp1252 read of some target's utf-8 bytes
    for sig in text_ops.MOJIBAKE_SEQUENCES:
        assert sig.encode("cp1252").decode("utf-8") in text_ops._MOJIBAKE_TARGETS
