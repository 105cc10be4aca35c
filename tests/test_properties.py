"""Property-based tests (hypothesis) — pure-Python properties of the
engine's honest non-declarative functions. No SparkSession needed, so
these run in milliseconds and explore far more input space than the
example-based tests."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from eligibility_etl_airflow_spark.functions.json_repair import repair_json

json_values = st.recursive(
    st.none() | st.booleans() | st.integers() | st.text(max_size=20),
    lambda children: st.lists(children, max_size=3)
    | st.dictionaries(st.text(max_size=8), children, max_size=3),
    max_leaves=10,
)
json_objects = st.dictionaries(st.text(max_size=8), json_values, max_size=4)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_repair_never_raises_and_returns_dict(garbage):
    out = repair_json(garbage)
    assert isinstance(out, dict)


@settings(max_examples=200, deadline=None)
@given(json_objects)
def test_repair_is_identity_on_valid_json(obj):
    assert repair_json(json.dumps(obj)) == obj


@settings(max_examples=200, deadline=None)
@given(json_objects)
def test_repair_strips_markdown_fences(obj):
    fenced = f"```json\n{json.dumps(obj)}\n```"
    assert repair_json(fenced) == obj


@settings(max_examples=100, deadline=None)
@given(json_objects, st.text(max_size=50), st.text(max_size=50))
def test_repair_finds_embedded_object(obj, prefix, suffix):
    # an LLM often wraps the JSON in prose; the first balanced object wins
    noisy = prefix.replace("{", "").replace("}", "") + json.dumps(obj) + suffix
    assert repair_json(noisy) == obj


@settings(max_examples=100, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=10000, max_value=10**12).map(str),
        st.text(alphabet=st.characters(blacklist_characters='"\\', min_codepoint=32), max_size=30),
        min_size=1,
        max_size=5,
    )
)
def test_repair_regex_fallback_recovers_id_pairs(pairs):
    # truncated output (unclosed brace) → ladder falls through to regex
    body = ", ".join(f'"{k}": "{v}"' for k, v in pairs.items())
    truncated = "{" + body + ", "  # never closes
    assert repair_json(truncated) == pairs


# --------------------------------------------------------------------------
# Bin-packing core (operators/packing.py::best_fit_decreasing)
# --------------------------------------------------------------------------

from eligibility_etl_airflow_spark.operators.packing import best_fit_decreasing

token_lists = st.lists(st.integers(min_value=1, max_value=500), max_size=60)


@settings(max_examples=300, deadline=None)
@given(token_lists, st.integers(min_value=1, max_value=400))
def test_bfd_budget_and_coverage(tokens, budget):
    tokens = sorted(tokens, reverse=True)  # caller contract: descending
    assign = best_fit_decreasing(tokens, budget)
    assert len(assign) == len(tokens)
    bins: dict[int, list[int]] = {}
    for t, (b, over) in zip(tokens, assign):
        assert over == (t > budget)
        bins.setdefault(b, []).append((t, over))
    for members in bins.values():
        if any(o for _, o in members):
            assert len(members) == 1  # oversize items sit alone
        else:
            assert sum(t for t, _ in members) <= budget


@settings(max_examples=300, deadline=None)
@given(token_lists, st.integers(min_value=1, max_value=400))
def test_bfd_bin_count_guarantee(tokens, budget):
    import math

    tokens = sorted(tokens, reverse=True)
    assign = best_fit_decreasing(tokens, budget)
    regular = [t for t in tokens if t <= budget]
    n_regular_bins = len({b for (b, o) in assign if not o})
    if regular:
        lower = math.ceil(sum(regular) / budget)
        # BFD guarantee: ≤ 11/9·OPT + 1 (OPT ≥ the volume lower bound)
        assert n_regular_bins <= math.ceil(lower * 11 / 9) + 1


# --------------------------------------------------------------------------
# Union-find core (operators/components.py::union_find_labels)
# --------------------------------------------------------------------------

from eligibility_etl_airflow_spark.operators.components import union_find_labels

edge_lists = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)), max_size=60
)


@settings(max_examples=300, deadline=None)
@given(edge_lists)
def test_union_find_matches_transitive_closure(edges):
    labels = union_find_labels(edges)
    nodes = {v for e in edges for v in e}
    assert set(labels) == nodes
    # brute-force closure: repeatedly min-propagate until fixpoint
    truth = {v: v for v in nodes}
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            m = min(truth[a], truth[b])
            if truth[a] != m or truth[b] != m:
                truth[a] = truth[b] = m
                changed = True
        # propagate through labels (handles label chains)
        for v in nodes:
            if truth[truth[v]] < truth[v]:
                truth[v] = truth[truth[v]]
                changed = True
    assert labels == truth


@settings(max_examples=200, deadline=None)
@given(edge_lists)
def test_union_find_edge_order_invariant(edges):
    import random

    shuffled = edges[:]
    random.Random(0).shuffle(shuffled)
    assert union_find_labels(edges) == union_find_labels(shuffled)


# --------------------------------------------------------------------------
# Media codecs (operators/multimodal.py) — exact/1-LSB round-trips
# --------------------------------------------------------------------------

from eligibility_etl_airflow_spark.operators import multimodal as _mm


@settings(max_examples=100, deadline=None)
@given(
    st.integers(1, 6),
    st.integers(1, 6),
    st.integers(0, 2**32 - 1),
)
def test_bmp_roundtrip_property(h, w, seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (_mm.decode_bmp(_mm.encode_bmp_rgb24(px)) == px).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(-1.0, 1.0, allow_nan=False), min_size=1, max_size=64))
def test_wav_roundtrip_property(samples):
    import numpy as np

    payload = _mm.encode_wav_pcm16(samples, 8000)
    rate, nch, frames = _mm.decode_wav(payload)
    assert (rate, nch) == (8000, 1)
    assert np.abs(frames[:, 0] - np.asarray(samples)).max() < 1.5 / 32767


# --------------------------------------------------------------------------
# Chunk window math (operators/chunking.py::chunk_token_windows)
# --------------------------------------------------------------------------

chunk_params = st.tuples(
    st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=4), max_size=120),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=39),
).filter(lambda t: t[2] < t[1])


@settings(max_examples=300, deadline=None)
@given(chunk_params)
def test_chunk_windows_cover_and_overlap(params):
    from eligibility_etl_airflow_spark.operators.chunking import chunk_token_windows

    tokens, c, o = params
    wins = chunk_token_windows(tokens, c, o)
    stride = c - o
    if not tokens:
        assert wins == []
        return
    # reconstruction: dropping each window's leading overlap rebuilds input
    rebuilt = list(wins[0]) if wins else []
    for w in wins[1:]:
        rebuilt.extend(w[o:])
    assert rebuilt == tokens
    # shape: every window starts at i*stride, non-last are full-size,
    # the last is longer than the overlap (else it'd be contained)
    for i, w in enumerate(wins):
        assert w == tokens[i * stride : i * stride + c]
    assert all(len(w) == c for w in wins[:-1])
    if len(wins) > 1:
        assert len(wins[-1]) > o
    # count: minimal — one fewer window could not reach the end
    if len(wins) > 1:
        assert (len(wins) - 2) * stride + c < len(tokens)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=10**12), st.floats(min_value=1e-9, max_value=0.5))
def test_bloom_sizing_bounds(n, fpp):
    from eligibility_etl_airflow_spark.operators.bloom import MAX_BITS, bloom_sizing

    m, k = bloom_sizing(n, fpp)
    assert m % 64 == 0 and 64 <= m <= MAX_BITS
    assert 1 <= k <= 30
    # monotone in n until the cap: more keys never means fewer bits
    m2, _ = bloom_sizing(min(n * 2, 10**12), fpp)
    assert m2 >= m or m == MAX_BITS
