"""Connected-components operator tests: planted graphs, a randomized
cross-check against a driver-side union-find, pointer-jumping convergence
on a long path, string ids, and keeper selection."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators import components


def _labels(df):
    return {r.id: r.cluster_id for r in df.collect()}


def test_planted_chain_and_island(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = _labels(components.connected_components(pairs))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_duplicate_edges_self_loops_and_reversed(spark):
    pairs = spark.createDataFrame(
        [(2, 1), (1, 2), (1, 1), (2, 3), (3, 2)], "id_a long, id_b long"
    )
    got = _labels(components.connected_components(pairs))
    assert got == {1: 1, 2: 1, 3: 1}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    n = 300
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(200)
    ]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical truth: min node id per component, nodes-with-edges only
    touched = sorted({v for e in edges for v in e})
    comp_min = {}
    for v in touched:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    truth = {v: comp_min[find(v)] for v in touched}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = _labels(components.connected_components(pairs))
    assert got == truth


def test_long_path_converges_by_pointer_jumping(spark):
    # A 64-node path has diameter 63; plain min-propagation needs ~63
    # rounds, pointer jumping needs ~log2(63) ≈ 6. max_iter=10 proves the
    # doubling actually happens.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    got = _labels(components.connected_components(pairs, max_iter=10))
    assert got == {i: 0 for i in range(64)}


def test_non_convergence_raises(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    with pytest.raises(components.ConvergenceError):
        components.connected_components(pairs, max_iter=0)


def test_string_ids(spark):
    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], "id_a string, id_b string"
    )
    got = _labels(components.connected_components(pairs))
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_attach_components_labels_singletons(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (9,)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    got = {
        r.doc_id: r.cluster_id
        for r in components.attach_components(df, "doc_id", pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 9: 9}


def test_dedup_by_components_keeps_best_per_group(spark):
    df = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.1), (9, 0.2)],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    kept = components.dedup_by_components(
        df, "doc_id", pairs, order_by=[F.col("quality").desc()]
    )
    rows = {r.doc_id for r in kept.collect()}
    # one keeper for the {1,2,3} component (highest quality = doc 2),
    # singleton 9 survives untouched
    assert rows == {2, 9}


def test_blocked_matches_iterative(spark):
    # block-confined edges: the single-shuffle union-find tier must agree
    # with the general iterative tier exactly
    rows = [
        ("b1", 1, 2), ("b1", 2, 3), ("b1", 5, 6),
        ("b2", 10, 11), ("b2", 11, 12), ("b2", 12, 10),
    ]
    pairs = spark.createDataFrame(rows, "block string, id_a long, id_b long")
    iterative = _labels(components.connected_components(pairs))
    blocked = _labels(
        components.connected_components_blocked(pairs, "block")
    )
    assert blocked == iterative
    assert blocked == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 10: 10, 11: 10, 12: 10}


def test_blocked_string_ids_and_dups(spark):
    pairs = spark.createDataFrame(
        [("b", "y", "x"), ("b", "x", "y"), ("b", "x", "x")],
        "block string, id_a string, id_b string",
    )
    got = _labels(components.connected_components_blocked(pairs, "block"))
    assert got == {"x": "x", "y": "x"}


def test_blocked_rejects_cross_block_edges(spark):
    # node 2 has edges in two blocks: the precondition guard must fail
    # loudly instead of emitting conflicting duplicate labels
    pairs = spark.createDataFrame(
        [("b1", 1, 2), ("b2", 2, 3)], "block string, id_a long, id_b long"
    )
    with pytest.raises(Exception, match="not.*block-confined|block-confined"):
        components.connected_components_blocked(pairs, "block").collect()
    # unvalidated mode is explicit opt-out: emits the raw per-block labels
    raw = components.connected_components_blocked(
        pairs, "block", validate=False
    ).collect()
    assert len(raw) == 4  # node 2 duplicated, caller asked for no guard


def test_iterative_releases_checkpoint_blocks(spark):
    """k rounds must not accumulate k persisted label-table copies —
    the previous round's localCheckpoint blocks are freed as soon as
    the next round materializes."""
    sc = spark.sparkContext

    def n_persisted():
        return sc._jsc.sc().getPersistentRDDs().size()

    before = n_persisted()
    # a 64-node path needs ~6 pointer-jumping rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    components.connected_components(pairs, max_iter=10).collect()
    # edges unpersisted, all but the final labels checkpoint released;
    # allow the final checkpoint + any test-session cache noise
    assert n_persisted() <= before + 1
