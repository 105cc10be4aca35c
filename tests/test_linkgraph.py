"""Link-graph operators: degree stats + power-iteration PageRank."""

import pytest

from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators import linkgraph


def _py_pagerank(edges, iterations=10, damping=0.85, round_dp=9):
    """Pure-Python reference: same simplified dangling treatment and
    per-iteration rounding as the operator."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    ranks = {v: round(1.0 / n, round_dp) for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += ranks[s] / out[s]
        ranks = {
            v: round((1.0 - damping) / n + damping * contrib[v], round_dp)
            for v in nodes
        }
    return ranks


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["id"]: r["rank"] for r in linkgraph.pagerank(df, **kw).collect()
    }


def test_pagerank_matches_python_reference(spark):
    edges = [
        (1, 2), (2, 3), (3, 1),          # cycle
        (4, 1), (5, 1), (6, 1),          # hub inlinks
        (1, 7),                          # 7 is dangling (no outlinks)
        (8, 9), (9, 8),                  # separate 2-cycle
    ]
    got = _run(spark, edges, iterations=10)
    want = _py_pagerank(edges, iterations=10)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    # authority ordering: the hub (1) outranks its pure-source inlinkers
    assert got[1] > got[4] and got[1] > got[2]


def test_pagerank_dedups_multi_edges(spark):
    # five parallel A->B edges are one endorsement
    multi = [(1, 2)] * 5 + [(3, 2), (2, 1), (2, 3)]
    single = [(1, 2), (3, 2), (2, 1), (2, 3)]
    assert _run(spark, multi) == _run(spark, single)


def test_pagerank_cycle_is_uniform_and_validates(spark):
    got = _run(spark, [(1, 2), (2, 3), (3, 1)], iterations=5)
    assert all(r == pytest.approx(1 / 3, abs=1e-9) for r in got.values())

    df = [(1, 2)]
    with pytest.raises(ValueError, match="damping"):
        _run(spark, df, damping=1.0)
    with pytest.raises(ValueError, match="iterations"):
        _run(spark, df, iterations=0)


def test_degree_stats_full_outer(spark):
    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    out = {r["id"]: r for r in linkgraph.degree_stats(df).collect()}
    assert out[1]["out_degree"] == 2 and out[1]["in_degree"] == 0
    assert out[3]["out_degree"] == 0 and out[3]["in_degree"] == 2
    assert out[2]["out_degree"] == 1 and out[2]["in_degree"] == 1


def test_pagerank_partition_count_invariant(spark):
    edges = [(i % 11, (i * 3 + 1) % 11) for i in range(60) if i % 11 != (i * 3 + 1) % 11]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r["id"]: r["rank"] for r in linkgraph.pagerank(df, iterations=6).collect()}
    b = {
        r["id"]: r["rank"]
        for r in linkgraph.pagerank(df.repartition(7), iterations=6).collect()
    }
    assert a == b


def test_degree_stats_dedup_flag(spark):
    df = spark.createDataFrame([(1, 2)] * 5 + [(3, 2)], "src long, dst long")
    dd = {r["id"]: r for r in linkgraph.degree_stats(df).collect()}
    assert dd[1]["out_degree"] == 1 and dd[2]["in_degree"] == 2  # pagerank grain
    raw = {r["id"]: r for r in linkgraph.degree_stats(df, dedup=False).collect()}
    assert raw[1]["out_degree"] == 5 and raw[2]["in_degree"] == 6


def _py_hits(edges, iterations=3, dp=9):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    hub = {v: round(1.0 / len(nodes), dp) for v in nodes}
    auth = {v: 0.0 for v in nodes}
    for _ in range(iterations):
        raw_a = {v: 0.0 for v in nodes}
        for u, v in edges:
            raw_a[v] += hub[u]
        t = sum(raw_a.values())
        auth = {v: round(raw_a[v] / t, dp) for v in nodes}
        raw_h = {v: 0.0 for v in nodes}
        for u, v in edges:
            raw_h[u] += auth[v]
        t = sum(raw_h.values())
        hub = {v: round(raw_h[v] / t, dp) for v in nodes}
    return hub, auth


def test_hits_matches_python_reference(spark):
    edges = [(1, 3), (2, 3), (3, 4), (2, 4), (4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r for r in linkgraph.hits(df, iterations=3).collect()}
    hub, auth = _py_hits(edges)
    for v in hub:
        assert abs(got[v]["hub"] - hub[v]) < 1e-8, v
        assert abs(got[v]["authority"] - auth[v]) < 1e-8, v
    # structure: 3 and 4 are the authorities (fed by hubs 1 and 2)
    assert got[3]["authority"] > got[1]["authority"]
    assert got[4]["authority"] > got[1]["authority"]
    # 2 links to both authorities: the best hub
    assert got[2]["hub"] == max(r["hub"] for r in got.values())


def test_hits_multi_edges_count_once_and_scores_sum_to_one(spark):
    edges = [(1, 2), (1, 2), (1, 2), (3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r for r in linkgraph.hits(df, iterations=2).collect()}
    # 1's triple edge counts once: hubs 1 and 3 tie
    assert got[1]["hub"] == got[3]["hub"]
    assert abs(sum(r["hub"] for r in got.values()) - 1.0) < 1e-6
    assert abs(sum(r["authority"] for r in got.values()) - 1.0) < 1e-6


def test_hits_validates_iterations(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="iterations"):
        linkgraph.hits(df, iterations=0)


def test_pagerank_warm_start_and_tolerance(spark):
    edges = [(i, (i * 3 + 1) % 9) for i in range(9) if i != (i * 3 + 1) % 9]
    df = spark.createDataFrame(edges, "src long, dst long")
    cold = linkgraph.pagerank(df, iterations=30)
    # warm start from the fixed point: one iteration changes nothing
    warm = linkgraph.pagerank(df, iterations=1, init=cold)
    assert {(r["id"], r["rank"]) for r in warm.collect()} == {
        (r["id"], r["rank"]) for r in cold.collect()
    }
    # tolerance: converges to the same ranks without spending the cap
    tolled = linkgraph.pagerank(df, iterations=50, tol=1e-9)
    got = {r["id"]: r["rank"] for r in tolled.collect()}
    want = {r["id"]: r["rank"] for r in cold.collect()}
    assert all(abs(got[k] - want[k]) < 1e-6 for k in want)
    # a new node absent from init takes the uniform prior, not null
    df2 = spark.createDataFrame(edges + [(99, 0)], "src long, dst long")
    warm2 = linkgraph.pagerank(df2, iterations=1, init=cold)
    r99 = {r["id"]: r["rank"] for r in warm2.collect()}
    assert r99[99] > 0
