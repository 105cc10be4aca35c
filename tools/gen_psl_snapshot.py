"""Regenerate operators/psl_snapshot.py from a full Public Suffix List.

Usage:
    python tools/gen_psl_snapshot.py [path-to-public_suffix_list.dat]

Default input is the Debian `publicsuffix` package's copy
(/usr/share/publicsuffix/public_suffix_list.dat); any current download
of https://publicsuffix.org/list/public_suffix_list.dat works — the
list is a public resource (Mozilla-maintained, MPL-2.0).

The emitted module keeps the exact shape `operators/urls.py` compiles
into Catalyst IN-set predicates:

- ``SUFFIXES_<n>``           — plain rules with n labels (n >= 2; the
  1-label rules need no table: the last-two-labels default is already
  the right answer under a single-label public suffix)
- ``WILDCARD_PARENTS_<n>``   — ``*.parent`` rules keyed by the PARENT's
  label count
- ``EXCEPTION_HOSTS_<n>``    — ``!host`` carve-outs keyed by label count

Rules containing non-ASCII labels are emitted in BOTH forms — the
list's Unicode form and its punycode (`xn--…`) form — so hosts match
whichever encoding the crawl delivered.
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

DEFAULT_DAT = "/usr/share/publicsuffix/public_suffix_list.dat"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "eligibility_etl_airflow_spark", "operators", "psl_snapshot.py",
)

HEADER = '''"""Public-suffix tables, GENERATED from the full Public Suffix List.

A *public suffix* is a domain under which internet users can directly
register names (`publicsuffix.org` — the Mozilla-maintained Public
Suffix List, MPL-2.0, a public resource). The registered domain
(eTLD+1) of a host is one label more than its longest matching public
suffix; getting this wrong merges unrelated sites — `a.example.co.uk`
and `b.other.co.uk` are different registrants, but a naive
last-two-labels rule calls them both `co.uk` — which corrupts
politeness budgets, domain-grain PageRank, and domain blocklists.

Regenerate with ``python tools/gen_psl_snapshot.py`` (reads the Debian
`publicsuffix` package copy by default; pass a path to a newer
download). Single-label plain rules are omitted by design — the
last-two-labels default already answers them — and every non-ASCII
rule is emitted in both its Unicode and punycode forms.

The tuples compile into literal Catalyst ``IN``-set predicates —
JVM-side, codegen'd, zero join, zero shuffle — so the lookup runs at
scan speed; Catalyst switches In → InSet hash lookup past a handful of
entries, so the plan shape is size-independent. Wildcard (``*.ck``)
and exception (``!www.ck``) rules are separate ladders with PSL
precedence — exception beats wildcard beats explicit, longest match
first — applied as the ``when()`` ladder order in
``urls.registered_domain``.
"""

from __future__ import annotations

'''


def parse(path: str):
    plain: dict[int, list[str]] = defaultdict(list)
    wild: dict[int, list[str]] = defaultdict(list)
    exc: dict[int, list[str]] = defaultdict(list)

    def forms(rule: str) -> list[str]:
        out = [rule]
        if not rule.isascii():
            try:
                out.append(
                    ".".join(
                        lab if lab.isascii() else lab.encode("idna").decode("ascii")
                        for lab in rule.split(".")
                    )
                )
            except UnicodeError:
                pass
        return out

    for raw in open(path, encoding="utf-8"):
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        line = line.split()[0].lower()  # spec: rule ends at whitespace
        if line.startswith("!"):
            for r in forms(line[1:]):
                exc[r.count(".") + 1].append(r)
        elif line.startswith("*."):
            for r in forms(line[2:]):
                wild[r.count(".") + 1].append(r)
        else:
            n = line.count(".") + 1
            if n >= 2:  # 1-label rules: last-two default already correct
                for r in forms(line):
                    plain[n].append(r)
    return plain, wild, exc


def emit_tuple(name: str, vals: list[str]) -> str:
    vals = sorted(set(vals))
    lines = [f"{name} = ("]
    row: list[str] = []
    width = 0
    for v in vals:
        piece = f'"{v}",'
        if width + len(piece) + 1 > 74 and row:
            lines.append("    " + " ".join(row))
            row, width = [], 0
        row.append(piece)
        width += len(piece) + 1
    if row:
        lines.append("    " + " ".join(row))
    lines.append(")\n")
    return "\n".join(lines)


# The grains urls.py's registered_domain ladder is hard-coded to
# consume. A future PSL refresh that introduces a NEW grain (a 6-label
# plain rule, a 4-label exception, …) would otherwise emit a table the
# ladder never imports — silently dropping those rules — so the
# generator fails loudly instead and the ladder gets extended first.
CONSUMED = {
    "SUFFIXES_2", "SUFFIXES_3", "SUFFIXES_4", "SUFFIXES_5",
    "WILDCARD_PARENTS_1", "WILDCARD_PARENTS_2", "WILDCARD_PARENTS_3",
    "WILDCARD_PARENTS_4",
    "EXCEPTION_HOSTS_2", "EXCEPTION_HOSTS_3",
}


def main() -> None:
    dat = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_DAT
    plain, wild, exc = parse(dat)
    emitted = (
        {f"SUFFIXES_{n}" for n in plain}
        | {f"WILDCARD_PARENTS_{n}" for n in wild}
        | {f"EXCEPTION_HOSTS_{n}" for n in exc}
    )
    extra = emitted - CONSUMED
    if extra:
        raise SystemExit(
            f"PSL refresh introduces grain(s) {sorted(extra)} that "
            "urls.registered_domain's ladder does not consume — extend "
            "the ladder (and this allowlist) before regenerating, or "
            "those rules would be silently dropped"
        )
    parts = [HEADER]
    for n in sorted(plain):
        parts.append(
            f"# Plain {n}-label public suffixes: a host ending in one of these\n"
            f"# registers at label {n + 1} from the right.\n"
            + emit_tuple(f"SUFFIXES_{n}", plain[n])
        )
    for n in sorted(wild):
        parts.append(
            f"# Wildcard parents with {n} label(s): every DIRECT child of a\n"
            f"# listed parent is itself a public suffix (registration one label\n"
            f"# deeper); `!`-exceptions below carve hosts back out.\n"
            + emit_tuple(f"WILDCARD_PARENTS_{n}", wild[n])
        )
    for n in sorted(exc):
        parts.append(
            f"# Exception rules with {n} labels: NOT public suffixes — each is\n"
            f"# a registered domain itself despite a covering wildcard.\n"
            + emit_tuple(f"EXCEPTION_HOSTS_{n}", exc[n])
        )
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("\n".join(parts))
    counts = {
        **{f"SUFFIXES_{n}": len(set(v)) for n, v in sorted(plain.items())},
        **{f"WILDCARD_PARENTS_{n}": len(set(v)) for n, v in sorted(wild.items())},
        **{f"EXCEPTION_HOSTS_{n}": len(set(v)) for n, v in sorted(exc.items())},
    }
    print(f"wrote {OUT}: {counts}")


if __name__ == "__main__":
    main()
