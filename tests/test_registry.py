"""Registry-window guards: the driver oracle-grades only the FIRST 50
registered queries, so ordering is a contract. These tests make a silent
displacement (someone registers a new oracle-backed query without
updating ``_DEFERRED``) a loud failure instead of a quietly lost
correctness row."""

from __future__ import annotations

import json
import os

from eligibility_etl_airflow_spark import registry

registry.load_all()

WINDOW = 50


def test_window_is_all_oracle_backed():
    names = list(registry.QUERIES)
    missing = [n for n in names[:WINDOW] if n not in registry.ORACLES]
    assert not missing, f"window slots without an oracle: {missing}"


# The round-6 rotation's 25 deliberate promotions (never driver-graded
# before; all held local DuckDB parity through rounds 4-5). Update this
# pin together with registry._ROTATED_OUT when the next rotation runs.
PROMOTED_R6 = {
    "bm25_search", "cluster_representatives", "containment_pairs",
    "corpus_data_card", "corpus_pair_drift", "decontamination_overlap",
    "dedup_connected_components", "document_chunks", "domain_hits",
    "domain_pagerank", "dsir_selection", "frontier_schedule",
    "html_text_extract", "hybrid_retrieval_rrf", "leakage_safe_split",
    "link_graph_edges", "merge_corpora_priority", "payload_triage",
    "robots_url_filter", "scd2_user_status", "semantic_dedup_label",
    "set_similarity_pairs", "sitemap_parse", "snapshot_diff_cdc",
    "url_components_parse",
}


def test_window_matches_rotated_graded_set():
    """The 50 in-window queries must be exactly (last round's graded set
    − the deliberate _ROTATED_OUT demotions) ∪ the pinned promotions —
    an ACCIDENTAL displacement (registering a new oracle-backed query
    without updating _DEFERRED) still fails loudly, while the rotation
    policy's deliberate swaps are recorded here."""
    path = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r05.json")
    graded_r5 = set(json.load(open(path)))
    expected = (graded_r5 - set(registry._ROTATED_OUT)) | PROMOTED_R6
    window = set(list(registry.QUERIES)[:WINDOW])
    assert window == expected, (
        f"window gained {sorted(window - expected)}, "
        f"lost {sorted(expected - window)}"
    )
    # rotation hygiene: every demotion really was graded last round, and
    # every promotion really was NOT
    assert set(registry._ROTATED_OUT) <= graded_r5
    assert not (PROMOTED_R6 & graded_r5)


def test_every_deferred_query_exists_and_has_coverage():
    for name in registry._DEFERRED:
        assert name in registry.QUERIES, f"_DEFERRED references unknown {name}"
    # deferred oracle-backed queries keep DuckDB parity via
    # tests/test_oracle_parity.py — assert its parametrization source is
    # still ALL of QUERIES, not just the graded window
    import inspect

    from tests import test_oracle_parity

    src = inspect.getsource(test_oracle_parity)
    assert "sorted(registry.QUERIES)" in src, (
        "oracle-parity no longer parametrizes every registered query — "
        "deferred queries would lose their local DuckDB check"
    )
    deferred_with_oracle = [n for n in registry._DEFERRED if n in registry.ORACLES]
    assert len(deferred_with_oracle) >= 8  # round-4 additions present
