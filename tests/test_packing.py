"""Invariant tests for sequence packing and domain-mix resampling (the
rows-only training-batch construction operators)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.catalog import Catalog
from eligibility_etl_airflow_spark.operators import packing, sampling, text


def _tokenized_docs(spark, sf_dir):
    return Catalog(spark, sf_dir).documents.select(
        "doc_id", text.token_count_bpe(F.col("text")).alias("n_tokens")
    )


def test_pack_every_doc_once_and_budget_respected(spark, sf_dir):
    d = _tokenized_docs(spark, sf_dir)
    budget = 512
    packed = packing.pack_sequences(d, "doc_id", "n_tokens", budget, n_shards=8)
    rows = packed.collect()
    # every doc assigned exactly once
    assert len(rows) == d.count()
    assert len({r.doc_id for r in rows}) == len(rows)
    # per-pack token sum ≤ budget unless the pack is a flagged oversize
    # singleton
    by_pack: dict[str, list] = {}
    for r in rows:
        by_pack.setdefault(r.pack_id, []).append(r)
    for members in by_pack.values():
        if any(m.oversize for m in members):
            assert len(members) == 1
            assert members[0].n_tokens > budget
        else:
            assert sum(m.n_tokens for m in members) <= budget


def test_pack_count_near_lower_bound(spark, sf_dir):
    d = _tokenized_docs(spark, sf_dir)
    budget = 512
    n_shards = 8
    packed = packing.pack_sequences(d, "doc_id", "n_tokens", budget, n_shards=n_shards)
    agg = packed.filter(~F.col("oversize")).agg(
        F.countDistinct("pack_id").alias("n_packs"),
        F.sum("n_tokens").alias("total"),
    ).collect()[0]
    lower = math.ceil(agg.total / budget)
    # FFD/BFD guarantee (11/9·OPT + 1) per shard, plus ≤1 trailing
    # underfull bin per shard
    assert agg.n_packs <= math.ceil(lower * 11 / 9) + n_shards


def test_pack_deterministic(spark, sf_dir):
    d = _tokenized_docs(spark, sf_dir)
    a = packing.pack_sequences(d, "doc_id", "n_tokens", 512, n_shards=8)
    b = packing.pack_sequences(d.repartition(13), "doc_id", "n_tokens", 512, n_shards=8)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_pack_oversize_and_validation(spark):
    d = spark.createDataFrame(
        [(1, 10), (2, 700), (3, 20)], "doc_id long, n_tokens long"
    )
    rows = packing.pack_sequences(d, "doc_id", "n_tokens", 100, n_shards=2).collect()
    over = [r for r in rows if r.oversize]
    assert [r.doc_id for r in over] == [2]
    with pytest.raises(ValueError):
        packing.pack_sequences(d, "doc_id", "n_tokens", 0)


def test_pack_stats_shape(spark):
    d = spark.createDataFrame(
        [(i, 40) for i in range(10)] + [(99, 700)], "doc_id long, n_tokens long"
    )
    packed = packing.pack_sequences(d, "doc_id", "n_tokens", 100, n_shards=1)
    s = packing.pack_stats(packed, "n_tokens", "pack_id", 100).collect()[0]
    assert s.n_oversize_packs == 1
    assert s.total_tokens == 10 * 40 + 700
    # 10 docs of 40 into budget-100 bins → 5 full bins, utilization 0.8
    assert s.utilization == pytest.approx(0.8, abs=0.01)


def test_resample_mix_proportions(spark, sf_dir):
    d = Catalog(spark, sf_dir).documents
    mix = {"en": 0.5, "de": 0.2, "es": 0.2, "fr": 0.1}
    out = sampling.resample_to_mix(d, "lang", mix, seed=7)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) <= set(mix)  # whitelist semantics
    total = sum(counts.values())
    assert total > 0
    for lang, share in mix.items():
        # Bernoulli noise at sf0.001 corpus sizes: generous tolerance
        assert counts.get(lang, 0) / total == pytest.approx(share, abs=0.15)


def test_resample_deterministic_and_validated(spark, sf_dir):
    d = Catalog(spark, sf_dir).documents
    mix = {"en": 0.6, "de": 0.4}
    a = sampling.resample_to_mix(d, "lang", mix, seed=7).collect()
    b = sampling.resample_to_mix(d, "lang", mix, seed=7).collect()
    assert {r.doc_id for r in a} == {r.doc_id for r in b}
    with pytest.raises(ValueError):
        sampling.resample_to_mix(d, "lang", {"en": 0.5}, seed=7)  # shares != 1
    with pytest.raises(ValueError):
        sampling.resample_to_mix(d, "lang", {"en": 0.5, "klingon": 0.5}, seed=7)


def test_resample_keyhash_membership_is_layout_independent(spark, sf_dir):
    """id_col path: membership is a pure function of (seed, doc_id) —
    the same rows survive under any repartitioning, unlike sampleBy
    whose draw depends on the partition layout. This is the property
    the domain/temperature mix oracles rely on."""
    d = Catalog(spark, sf_dir).documents
    mix = {"en": 0.5, "de": 0.2, "es": 0.2, "fr": 0.1}
    base = sampling.resample_to_mix(d, "lang", mix, seed=7, id_col="doc_id")
    shuffled = sampling.resample_to_mix(
        d.repartition(13, "source"), "lang", mix, seed=7, id_col="doc_id"
    )
    a = {r.doc_id for r in base.select("doc_id").collect()}
    b = {r.doc_id for r in shuffled.select("doc_id").collect()}
    assert a == b and len(a) > 0
    # proportions still hold under the key-hash rule
    counts = {
        r.lang: r.n
        for r in base.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(counts.values())
    for lang, share in mix.items():
        assert counts.get(lang, 0) / total == pytest.approx(share, abs=0.15)


def test_resample_total_rows_cap(spark, sf_dir):
    d = Catalog(spark, sf_dir).documents
    mix = {"en": 0.5, "de": 0.5}
    capped = sampling.resample_to_mix(d, "lang", mix, total_rows=40, seed=7)
    # Bernoulli: expected 40 rows, allow wide slack
    assert capped.count() <= 80


def test_pack_null_tokens_raise_clearly(spark):
    d = spark.createDataFrame(
        [(1, 10), (2, None), (3, 20)], "doc_id long, n_tokens long"
    )
    with pytest.raises(Exception, match="null values in 'n_tokens'"):
        packing.pack_sequences(d, "doc_id", "n_tokens", 100, n_shards=2).collect()


def test_pack_stats_all_oversize_no_divide_by_zero(spark):
    from eligibility_etl_airflow_spark.operators import packing

    df = spark.createDataFrame(
        [(1, 700), (2, 800)], "doc_id long, n_tokens long"
    )
    packed = packing.pack_sequences(df, "doc_id", "n_tokens", budget=512)
    row = packing.pack_stats(packed, "n_tokens", "pack_id", budget=512).head()
    # ANSI mode: an unguarded division here raised DIVIDE_BY_ZERO
    assert row.utilization == 0.0
    assert row.n_oversize_packs == row.n_packs


def test_assign_split_stable_and_appendconsistent(spark):
    from pyspark.sql import functions as F

    from eligibility_etl_airflow_spark.operators import sampling

    a = spark.range(0, 2000).select(F.col("id").alias("k"))
    s1 = {r.k: r.split for r in sampling.assign_split(a, "k", 0.2).collect()}
    s2 = {r.k: r.split for r in sampling.assign_split(a, "k", 0.2).collect()}
    assert s1 == s2  # run-stable
    # append consistency: adding rows never flips existing membership
    b = spark.range(0, 4000).select(F.col("id").alias("k"))
    s3 = {r.k: r.split for r in sampling.assign_split(b, "k", 0.2).collect()}
    assert all(s3[k] == v for k, v in s1.items())
    frac = sum(1 for v in s3.values() if v == "test") / len(s3)
    assert 0.15 < frac < 0.25  # O(1/sqrt(n)) around 0.2
    # null ids always train; different seed → different membership
    withnull = spark.createDataFrame([(None,), (1,)], "k long")
    rows = {r.k: r.split for r in sampling.assign_split(withnull, "k", 0.99).collect()}
    assert rows[None] == "train"
    s4 = {r.k: r.split for r in sampling.assign_split(a, "k", 0.2, seed="v2").collect()}
    assert s4 != s1
    import pytest

    with pytest.raises(ValueError, match="test_frac"):
        sampling.assign_split(a, "k", 1.5)


def test_assign_contiguous_ids_dense_and_ordered(spark):
    from pyspark.sql import functions as F

    from eligibility_etl_airflow_spark.operators import sampling

    df = spark.range(0, 500).select((F.col("id") * 7 % 500).alias("k")).repartition(8)
    out = sampling.assign_contiguous_ids(df, ["k"], num_partitions=5)
    rows = sorted((r.k, r.row_id) for r in out.collect())
    assert [rid for _, rid in rows] == list(range(500))  # dense 0..n-1
    assert [k for k, _ in rows] == sorted(k for k, _ in rows)  # id order == key order
    import pytest

    with pytest.raises(ValueError, match="order_by"):
        sampling.assign_contiguous_ids(df, [])


def test_weighted_sample_proportional_deterministic(spark):
    from pyspark.sql import functions as F

    from eligibility_etl_airflow_spark.operators import sampling

    # two weight classes: heavy rows should dominate the draw
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 100, 1000).otherwise(1).cast("long").alias("w"),
    )
    picks = sampling.weighted_sample_deterministic(df, "k", "w", k=50)
    rows = picks.collect()
    assert len(rows) == 50
    n_heavy = sum(1 for r in rows if r.w == 1000)
    assert n_heavy >= 40  # 100 rows carry ~99% of total weight
    # deterministic: same draw twice; different seed -> different draw
    again = {r.k for r in sampling.weighted_sample_deterministic(df, "k", "w", k=50).collect()}
    assert again == {r.k for r in rows}
    other = {r.k for r in sampling.weighted_sample_deterministic(df, "k", "w", k=50, seed="x").collect()}
    assert other != again
    # non-positive / null weights never drawn; k > candidates returns all
    import pytest

    small = spark.createDataFrame([(1, 5), (2, 0), (3, -1), (4, None)], "k long, w long")
    got = sampling.weighted_sample_deterministic(small, "k", "w", k=10).collect()
    assert [r.k for r in got] == [1]
    with pytest.raises(ValueError, match="k must"):
        sampling.weighted_sample_deterministic(small, "k", "w", k=0)


def test_assign_split_by_group_never_straddles(spark):
    from eligibility_etl_airflow_spark.operators import sampling

    # 200 docs in 40 clusters of 5; the doc-level split WILL straddle
    # some cluster (probabilistically certain at this size for 30%
    # test), the group-level split NEVER can
    rows = [(i, i // 5) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    by_doc = sampling.assign_split(df, "doc_id", test_frac=0.3)
    by_grp = sampling.assign_split_by_group(df, "cluster_id", test_frac=0.3)

    def straddled(out):
        from pyspark.sql import functions as F

        return (
            out.groupBy("cluster_id")
            .agg(F.countDistinct("split").alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )

    assert straddled(by_doc) > 0  # the leakage mode being closed
    assert straddled(by_grp) == 0  # closed by construction

    # null group key -> train (unkeyed rows must never reach eval)
    n = spark.createDataFrame([(1, None)], "doc_id long, cluster_id long")
    out = sampling.assign_split_by_group(n, "cluster_id", test_frac=0.99).collect()
    assert out[0]["split"] == "train"


def test_epoch_shuffle_order_reproducible_and_epoch_varying(spark):
    from eligibility_etl_airflow_spark.operators import sampling

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    e0 = {r["doc_id"]: r["position"] for r in sampling.epoch_shuffle_order(df, "doc_id", 0).collect()}
    e1 = {r["doc_id"]: r["position"] for r in sampling.epoch_shuffle_order(df, "doc_id", 1).collect()}
    # each epoch is a complete permutation
    assert sorted(e0.values()) == list(range(300))
    assert sorted(e1.values()) == list(range(300))
    assert e0 != e1  # epochs shuffle differently
    # layout independence: shuffled input, different partitioning
    df2 = spark.createDataFrame([(i,) for i in reversed(range(300))], "doc_id long").repartition(7)
    e0b = {r["doc_id"]: r["position"] for r in sampling.epoch_shuffle_order(df2, "doc_id", 0).collect()}
    assert e0b == e0


def test_epoch_shuffle_order_contracts(spark):
    import pytest as _pt

    from eligibility_etl_airflow_spark.operators import sampling

    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    with _pt.raises(Exception, match="epoch_shuffle_order"):
        sampling.epoch_shuffle_order(df, "doc_id", 0).collect()
    ok = spark.createDataFrame([(1,)], "doc_id long")
    with _pt.raises(ValueError, match="epoch"):
        sampling.epoch_shuffle_order(ok, "doc_id", -1)


def test_shard_manifest_totals_and_checksum_order_independence(spark):
    rows = [(i, i % 3, 10 + i, f"doc {i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, shard int, tokens long, text string")
    got = {
        r["shard"]: r
        for r in packing.shard_manifest(df, "shard", "doc_id", "tokens", "text").collect()
    }
    assert set(got) == {0, 1, 2}
    for s, r in got.items():
        ids = [i for i in range(30) if i % 3 == s]
        assert r["n_docs"] == len(ids)
        assert r["n_tokens"] == sum(10 + i for i in ids)
        assert (r["min_id"], r["max_id"]) == (min(ids), max(ids))
    # checksum is content-addressed and commutative: any layout, same value
    relaid = packing.shard_manifest(
        df.repartition(7).sortWithinPartitions("text"),
        "shard", "doc_id", "tokens", "text",
    ).collect()
    assert {r["shard"]: r["checksum"] for r in relaid} == {
        s: r["checksum"] for s, r in got.items()
    }
    # ...and content-sensitive: one changed byte moves the shard checksum
    mutated = df.withColumn(
        "text", F.when(F.col("doc_id") == 0, "doc 0!").otherwise(F.col("text"))
    )
    m = {
        r["shard"]: r["checksum"]
        for r in packing.shard_manifest(mutated, "shard", "doc_id", "tokens", "text").collect()
    }
    assert m[0] != got[0]["checksum"] and m[1] == got[1]["checksum"]
