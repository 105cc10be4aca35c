"""Regenerate COVERAGE.md's "Driver-graded history" section from the
CORRECTNESS_r*.json files the driver writes each round.

Usage: python tools/coverage_history.py            # rewrites COVERAGE.md
       python tools/coverage_history.py --print    # emit section to stdout
       python tools/coverage_history.py --check    # exit 1 if the committed
           table is stale (registry or CORRECTNESS files changed since the
           last regeneration) — run this after EVERY query registration,
           before committing; it needs no Spark session and finishes in ~1 s
       python tools/coverage_history.py --round N  # label the in-window
           column rN (default max(rounds)+1 — wrong once the CURRENT
           round's CORRECTNESS file is already on disk, e.g. when
           regenerating after the driver graded this round)

The section makes the grading-window rotation auditable at a glance:
per registered query, the rounds in which the driver's oracle check was
fully green (rows + schema + hash), the last such round, and whether the
query occupies one of the 50 graded slots in the CURRENT registry order.
tests/test_coverage_history.py asserts the committed table is consistent
with the JSON files for the rounds it lists (newer, not-yet-listed
rounds are allowed — the driver writes them after the table is
committed).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARKER = "## Driver-graded history"


def history() -> tuple[dict[str, list[int]], list[int]]:
    """Per-query list of fully-green rounds, plus all rounds on disk."""
    greens: dict[str, list[int]] = {}
    rounds: list[int] = []
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        rounds.append(rnd)
        for q, row in json.load(open(f)).items():
            ok = (
                bool(row.get("rows_match"))
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and row.get("err") is None
            )
            if ok:
                greens.setdefault(q, []).append(rnd)
    return greens, rounds


def render(cur: int | None = None) -> str:
    sys.path.insert(0, REPO)
    from eligibility_etl_airflow_spark import registry

    registry.load_all()
    greens, rounds = history()
    if not rounds:
        raise SystemExit(
            "no CORRECTNESS_r*.json files found — nothing to render "
            "(run from a repo the driver has graded at least once)"
        )
    names = list(registry.QUERIES)
    window = set(names[:50])
    if cur is None:
        cur = max(rounds) + 1  # the table is committed DURING round max+1
    out = [
        MARKER + " (generated from CORRECTNESS_r*.json)",
        "",
        f"Rounds covered: {min(rounds)}-{max(rounds)}. `in-window (r{cur})` = occupies",
        "one of the 50 driver-graded slots in the CURRENT registry order;",
        "every oracle-backed query keeps local DuckDB parity on every pytest",
        "run regardless of window position. Regenerate with",
        "`python tools/coverage_history.py` after each round's CORRECTNESS",
        "file lands; tests/test_coverage_history.py asserts consistency for",
        "the rounds listed here (newer rounds may exist unlisted).",
        "",
        f"| Query | Graded green (rounds) | Last graded | In-window (r{cur}) |",
        "|---|---|---|---|",
    ]
    for n in names:
        g = [str(r) for r in greens.get(n, [])]
        out.append(
            f"| {n} | {', '.join(g) or '—'} | {g[-1] if g else 'never'} |"
            f" {'yes' if n in window else ''} |"
        )
    return "\n".join(out) + "\n"


def main() -> None:
    cur = None
    for i, a in enumerate(sys.argv[1:], start=1):
        # accept both --round=N and --round N, with a usage error on a
        # missing value instead of an IndexError
        if a.startswith("--round"):
            try:
                cur = int(a.split("=", 1)[1] if "=" in a else sys.argv[i + 1])
            except (IndexError, ValueError):
                raise SystemExit("usage: coverage_history.py [--round N] [--print]")
    section = render(cur)
    if "--print" in sys.argv:
        print(section, end="")
        return
    path = os.path.join(REPO, "COVERAGE.md")
    if "--check" in sys.argv:
        text = open(path).read()
        committed = text[text.index(MARKER):] if MARKER in text else ""
        # The committed table may label an older in-window round; compare
        # against a regeneration at the SAME label so --check flags real
        # registry/CORRECTNESS drift, not the round-number cosmetic.
        m = re.search(r"In-window \(r(\d+)\)", committed)
        if m and cur is None:
            section = render(int(m.group(1)))
        if committed.strip() != section.strip():
            raise SystemExit(
                "COVERAGE.md driver-graded-history table is STALE — a query "
                "was (de)registered or a CORRECTNESS file landed since the "
                "last regeneration. Fix: python tools/coverage_history.py "
                "&& git add COVERAGE.md"
            )
        print("COVERAGE.md history table is current")
        return
    text = open(path).read()
    if MARKER in text:
        text = text[: text.index(MARKER)].rstrip() + "\n\n" + section
    else:
        text = text.rstrip() + "\n\n" + section
    open(path, "w").write(text)
    print(f"rewrote {path}")


if __name__ == "__main__":
    main()
