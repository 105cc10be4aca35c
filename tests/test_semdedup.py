"""SemDeDup semantic dedup: drop rule, k-means path, caps, curation stage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators import semdedup


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_dominated_rule_exact(spark):
    # one cluster by construction (single centroid). Rank order is by
    # cosine-to-centroid ascending. With centroid c=(1,0):
    #   a=(0,1): sim 0      -> rank 1 (kept, farthest)
    #   b=(1,1): sim .7071  -> rank 2
    #   d=(1,0.99): sim ~.815 -> rank 3
    # cos(a,b)=.7071 < .9 keeps b; cos(d,b)=.999987 >= .9 drops d vs b.
    df = _vecs(
        spark,
        [(1, [0.0, 1.0]), (2, [1.0, 1.0]), (3, [1.0, 0.99])],
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "label int, centroid array<double>"
    )
    drops = semdedup.semantic_dedup_drops(
        df, "vec_id", "embedding", centroids=cents, eps=0.9
    ).collect()
    assert len(drops) == 1
    d = drops[0]
    assert (d["id"], d["kept_id"], d["capped_cluster"]) == (3, 2, False)
    assert d["sim"] == pytest.approx(0.999987, abs=1e-5)


def test_planted_paraphrases_found_kmeans(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = emb.limit(4).collect()
    # paraphrase cluster: scaled copies -> cosine 1.0 to their source
    planted = _vecs(
        spark,
        [
            (10_000 + i, [float(x) * 1.001 for x in r.embedding])
            for i, r in enumerate(base)
        ],
    )
    both = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).union(planted)
    drops = semdedup.semantic_dedup_drops(
        both, "vec_id", "embedding", k=8, eps=0.999
    )
    got = drops.filter(~F.col("capped_cluster")).collect()
    # every planted doc pairs with its source: one of each pair drops
    dropped_pairs = {
        (min(r["id"], r["kept_id"]), max(r["id"], r["kept_id"])) for r in got
    }
    expected = {(r.vec_id, 10_000 + i) for i, r in enumerate(base)}
    assert expected <= dropped_pairs
    # random non-planted vectors never reach eps=0.999
    planted_ids = {10_000 + i for i in range(len(base))} | {r.vec_id for r in base}
    assert all(r["id"] in planted_ids or r["kept_id"] in planted_ids for r in got)


def test_no_false_drops_on_random(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    drops = semdedup.semantic_dedup_drops(
        emb, "vec_id", "embedding", k=8, eps=0.8
    ).filter(~F.col("capped_cluster"))
    assert drops.count() == 0  # random 64-dim cosines concentrate near 0


def test_cluster_cap_reports_not_drops(spark):
    # all four vectors identical -> one cluster of 4 > cap of 3
    df = _vecs(spark, [(i, [1.0, 2.0, 3.0]) for i in range(4)])
    cents = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "label int, centroid array<double>"
    )
    rows = semdedup.semantic_dedup_drops(
        df, "vec_id", "embedding", centroids=cents, eps=0.5, max_cluster_size=3
    ).collect()
    assert len(rows) == 4
    assert all(r["capped_cluster"] for r in rows)
    assert all(r["kept_id"] is None and r["sim"] is None for r in rows)


def test_kmeans_centroids_shape_and_determinism(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c1 = semdedup.kmeans_centroids(emb, "vec_id", "embedding", k=4, em_iters=1)
    rows = c1.collect()
    assert 1 <= len(rows) <= 4
    assert all(len(r["centroid"]) == 64 for r in rows)
    # layout-stable sample + deterministic E/M: repartitioned input
    # learns the same centroids
    c2 = semdedup.kmeans_centroids(
        emb.repartition(7), "vec_id", "embedding", k=4, em_iters=1
    )
    a = {r["label"]: [round(x, 9) for x in r["centroid"]] for r in rows}
    b = {r["label"]: [round(x, 9) for x in r["centroid"]] for r in c2.collect()}
    assert a == b


def test_curation_semantic_stage(spark, sf_dir, tmp_path):
    from eligibility_etl_airflow_spark import pipelines

    base = pipelines.run_corpus_curation_pipeline(
        spark, sf_dir, str(tmp_path / "plain"), min_quality=0.0, neardup_removal="pair"
    )
    sem = pipelines.run_corpus_curation_pipeline(
        spark,
        sf_dir,
        str(tmp_path / "sem"),
        min_quality=0.0,
        neardup_removal="pair",
        semantic_eps=0.35,
        semantic_k=8,
    )
    assert "n_after_semantic" in sem
    assert sem["n_after_semantic"] <= base["n_curated"]
    assert sem["n_curated"] == sem["n_after_semantic"]
    # docs without an embedding row survive the stage by construction:
    # restrict embeddings to an empty set -> stage drops nothing
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    none = pipelines.run_corpus_curation_pipeline(
        spark,
        sf_dir,
        str(tmp_path / "none"),
        min_quality=0.0,
        neardup_removal="pair",
        semantic_eps=0.35,
        embeddings=emb.limit(0),
    )
    assert none["n_after_semantic"] == base["n_curated"]


def test_bipartite_drops_batch_near_state(spark):
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "label int, centroid array<double>"
    )
    state = _vecs(spark, [(1, [1.0, 0.05]), (2, [0.05, 1.0])])
    batch = _vecs(
        spark,
        [
            (10, [1.0, 0.06]),   # ~state 1, same cluster -> drop
            (11, [0.06, 1.0]),   # ~state 2, same cluster -> drop
            (12, [1.0, 1.0]),    # cos to both ~0.74 < eps -> keep
        ],
    )
    drops = semdedup.semantic_dedup_drops_bipartite(
        batch, state, "vec_id", "embedding", cents, eps=0.99
    ).collect()
    got = {(r["id"], r["kept_id"]) for r in drops if not r["capped_cluster"]}
    assert got == {(10, 1), (11, 2)}


def test_bipartite_preassigned_state_skips_reassignment(spark):
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "label int, centroid array<double>"
    )
    # state stored WITH its cluster column: the persisted-index shape.
    # cluster 1 here is deliberately NOT what re-assignment would pick —
    # proving the stored assignment is honored, not recomputed.
    state = spark.createDataFrame(
        [(1, [1.0, 0.05], 1)], "vec_id long, embedding array<double>, cluster int"
    )
    batch = _vecs(spark, [(10, [1.0, 0.06])])  # assigns to cluster 0
    drops = semdedup.semantic_dedup_drops_bipartite(
        batch, state, "vec_id", "embedding", cents, eps=0.9
    ).collect()
    assert drops == []  # different clusters -> never compared


def test_bipartite_cap_reports(spark):
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "label int, centroid array<double>"
    )
    state = _vecs(spark, [(i, [1.0, 0.001 * i]) for i in range(5)])
    batch = _vecs(spark, [(100, [1.0, 0.002])])
    rows = semdedup.semantic_dedup_drops_bipartite(
        batch, state, "vec_id", "embedding", cents, eps=0.9, max_cluster_side=3
    ).collect()
    assert len(rows) == 1
    assert rows[0]["capped_cluster"] and rows[0]["id"] == 100


@pytest.mark.slow
def test_incremental_semantic_tier(spark, tmp_path):
    """Batch 2's paraphrase-of-state (no shared shingles, same meaning
    direction) is dropped by the vector index; its fresh doc survives;
    replaying batch 2 is a no-op; docs without embeddings pass through."""
    from eligibility_etl_airflow_spark import pipelines

    state = str(tmp_path / "state")
    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t2 = "one two three four five six seven eight nine ten eleven"
    b1 = spark.createDataFrame(
        [(1, t1, [1.0, 0.0, 0.0]), (2, t2, [0.0, 1.0, 0.0])],
        "doc_id long, text string, embedding array<double>",
    )
    s1 = pipelines.run_incremental_curation(
        spark, b1, state, semantic_eps=0.99, semantic_k=2
    )
    assert s1["n_accepted"] == 2

    # doc 10: byte-fresh but embedding ~ state doc 1 -> semantic drop;
    # doc 11: genuinely new direction -> kept;
    # doc 12: NO embedding -> survives the semantic stage by construction
    b2 = spark.createDataFrame(
        [
            (10, "totally different words entirely here", [1.0, 0.001, 0.0]),
            (11, "spark parquet shuffle broadcast join", [0.0, 0.0, 1.0]),
            (12, "no embedding for this one at all", None),
        ],
        "doc_id long, text string, embedding array<double>",
    )
    s2 = pipelines.run_incremental_curation(
        spark, b2, state, semantic_eps=0.99, semantic_k=2
    )
    assert s2["n_after_byte_dedup"] == 3
    assert s2["n_after_semantic"] == 2
    assert s2["n_accepted"] == 2
    docs = spark.read.parquet(f"{state}/accepted_docs")
    assert sorted(r.doc_id for r in docs.collect()) == [1, 2, 11, 12]

    s3 = pipelines.run_incremental_curation(  # replay
        spark, b2, state, semantic_eps=0.99, semantic_k=2
    )
    assert s3["n_accepted"] == 0
    assert sorted(
        r.doc_id for r in spark.read.parquet(f"{state}/accepted_docs").collect()
    ) == [1, 2, 11, 12]
    # vector index only holds embedded accepted docs, with clusters
    vecs = spark.read.parquet(f"{state}/index_vectors")
    assert sorted(r.id for r in vecs.collect()) == [1, 2, 11]
    assert set(vecs.columns) == {"id", "cluster", "v"}


def test_semantic_dedup_auto_k_scales_cluster_count(spark):
    """k='auto' sizes the clustering to the corpus (the linearity knob
    at scale): n/target_cluster_size centroids, floored at 16 — and the
    drop semantics stay identical to an explicit k of the same value."""
    import numpy as np

    rows = [
        (i, [float(x) for x in np.cos(np.arange(8) * (i % 40 + 1) * 0.37)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    auto = semdedup.semantic_dedup_drops(
        df, "vec_id", "embedding", k="auto", eps=0.999,
        target_cluster_size=10,
    )
    explicit = semdedup.semantic_dedup_drops(
        df, "vec_id", "embedding", k=20, eps=0.999,
    )
    a = sorted((r.id, r.kept_id) for r in auto.collect())
    e = sorted((r.id, r.kept_id) for r in explicit.collect())
    assert a == e and len(a) > 0  # 200/10 = 20 == explicit k

    # floor: a tiny corpus never trains fewer than 16 centroids
    tiny = spark.createDataFrame(rows[:20], "vec_id long, embedding array<double>")
    floor = semdedup.semantic_dedup_drops(
        tiny, "vec_id", "embedding", k="auto", eps=0.999,
        target_cluster_size=1_000,
    )
    floor16 = semdedup.semantic_dedup_drops(
        tiny, "vec_id", "embedding", k=16, eps=0.999,
    )
    assert sorted((r.id, r.kept_id) for r in floor.collect()) == sorted(
        (r.id, r.kept_id) for r in floor16.collect()
    )

    with pytest.raises(ValueError, match="auto"):
        semdedup.semantic_dedup_drops(df, "vec_id", "embedding", k="boom")


def test_incremental_semantic_auto_k_default(spark, tmp_path):
    """semantic_k defaults to "auto" (r8 verdict #4): the first
    embedding-carrying batch resolves k = max(16, ceil(n/1000)) and the
    pipeline runs end to end without a pinned k; a non-int non-auto
    value raises before any state mutation."""
    import pytest as _pytest

    from eligibility_etl_airflow_spark import pipelines

    state = str(tmp_path / "state")
    batch = spark.createDataFrame(
        [
            (i, f"document number {i} with words {i * 7} and {i * 13}",
             [1.0 if j == i else 0.0 for j in range(30)])
            for i in range(30)
        ],
        "doc_id long, text string, embedding array<double>",
    )
    s = pipelines.run_incremental_curation(spark, batch, state, semantic_eps=0.99)
    assert s["n_accepted"] == 30  # pairwise-orthogonal embeddings, no drops
    # auto resolved (30 docs -> k=16 floor) and trained the frozen index
    import os

    assert os.path.exists(f"{state}/index_centroids")

    with _pytest.raises(ValueError, match="semantic_k"):
        pipelines.run_incremental_curation(
            spark,
            batch,
            str(tmp_path / "state2"),
            semantic_eps=0.99,
            semantic_k="sixteen",
        )
