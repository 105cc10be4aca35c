"""Repair-ladder unit tests (FIXTURES.md §4 mock-LLM response fixtures)."""

from __future__ import annotations

from eligibility_etl_airflow_spark.functions.json_repair import repair_json


def test_direct_parse():
    assert repair_json('{"Rejected": {"123": "dup"}}') == {"Rejected": {"123": "dup"}}


def test_empty_rejected():
    assert repair_json('{"Rejected": {}}') == {"Rejected": {}}


def test_fenced_json():
    assert repair_json('```json\n{"Rejected": {"1": "x"}}\n```') == {"Rejected": {"1": "x"}}


def test_fenced_no_lang_tag():
    assert repair_json('```\n{"a": 1}\n```') == {"a": 1}


def test_chatty_wrapper_balanced_brace():
    text = 'Sure! Here you go: {"Rejected": {"55": "reason"}} — hope this helps.'
    assert repair_json(text) == {"Rejected": {"55": "reason"}}


def test_braces_inside_strings():
    text = 'prefix {"k": "va{lu}e", "n": {"m": 2}} suffix'
    assert repair_json(text) == {"k": "va{lu}e", "n": {"m": 2}}


def test_regex_pair_fallback_on_truncated_json():
    # truncated → unbalanced braces → ladder falls through to regex pairs
    text = '{"Rejected": {"12345": "missing diagnosis", "67890": "dup serv'
    out = repair_json(text)
    assert out == {"12345": "missing diagnosis"}


def test_garbage_and_empty():
    assert repair_json("no json here at all") == {}
    assert repair_json("") == {}
    assert repair_json(None) == {}


def test_escaped_quotes_in_reason():
    text = '{"9": "needs \\"prior\\" auth"}'
    assert repair_json(text) == {"9": 'needs "prior" auth'}
