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
