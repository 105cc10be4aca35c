"""The COVERAGE.md driver-graded-history table must stay consistent
with the CORRECTNESS_r*.json files it claims to summarize — the table
is the rotation program's audit surface, so a stale row is a silently
wrong claim about what the driver independently confirmed.

Deliberately lenient in one direction: rounds NEWER than the table's
stated range may exist on disk unlisted (the driver writes
CORRECTNESS_r{N}.json after the round-N table was committed); the
table regenerates at the start of the next round via
`python tools/coverage_history.py`.
"""

from __future__ import annotations

import os
import re

from tools import coverage_history as ch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _table_rows(text: str) -> dict[str, tuple[str, str]]:
    sec = text[text.index(ch.MARKER):]
    rows = {}
    for line in sec.splitlines():
        m = re.match(r"\| ([a-z0-9_]+) \| (.*?) \| (.*?) \|", line)
        if m and m.group(1) != "Query":
            rows[m.group(1)] = (m.group(2), m.group(3))
    return rows


def test_history_table_matches_correctness_files():
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    assert ch.MARKER in text, "history section missing from COVERAGE.md"
    m = re.search(r"Rounds covered: (\d+)-(\d+)", text[text.index(ch.MARKER):])
    lo, hi = int(m.group(1)), int(m.group(2))

    greens, rounds = ch.history()
    assert lo == min(rounds)
    # hi may lag max(rounds) by exactly the driver's post-commit write
    assert hi <= max(rounds)

    rows = _table_rows(text)
    from eligibility_etl_airflow_spark import registry

    registry.load_all()
    assert set(rows) == set(registry.QUERIES), (
        "table rows != registered queries — regenerate "
        "(python tools/coverage_history.py)"
    )
    for name, (graded, last) in rows.items():
        want = [str(r) for r in greens.get(name, []) if r <= hi]
        want_str = ", ".join(want) or "—"
        assert graded == want_str, (name, graded, want_str)
        assert last == (want[-1] if want else "never"), name


def test_history_table_window_column_matches_registry():
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    sec = text[text.index(ch.MARKER):]
    from eligibility_etl_airflow_spark import registry

    registry.load_all()
    window = set(list(registry.QUERIES)[:50])
    marked = set()
    for line in sec.splitlines():
        m = re.match(r"\| ([a-z0-9_]+) \| .* \| (yes)? \|$", line)
        if m and m.group(1) != "Query" and m.group(2):
            marked.add(m.group(1))
    assert marked == window, (
        f"gained {sorted(marked - window)}, lost {sorted(window - marked)}"
    )
