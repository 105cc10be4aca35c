"""Declarative data-quality constraint suite — Deequ-shaped checks as
one aggregate pass.

The reference gates loads on a single null-ratio rule
(dags/eligibilty_etl.py:288-321; engine twin ``sources/sinks.py::expect``).
Production tables need a SUITE: completeness, uniqueness, ranges,
patterns, referential membership — and the naive form (one action per
rule) rescans the table per rule. Here every row-level rule compiles to
a conditional-count column in a SINGLE aggregate over one scan; only
uniqueness adds a second aggregate (count distinct needs its own
shuffle). At 100 TB the suite costs one pass + one distinct per unique
rule, not rules × scans.

Each rule is a (name, violation_predicate) pair; the report is one row
per rule with violation counts — small, joinable, and loggable. The
gate form raises on any failing rule, mirroring ``expect()``'s abort
contract.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named constraint: ``violated`` is a boolean Column that is True
    on each BAD row. ``unique_col`` rules are marked instead (they are
    set-level, not row-level)."""

    name: str
    violated: Column | None = None
    unique_col: str | None = None


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Rule:
    c = F.col(col)
    return Rule(f"in_range({col},{lo},{hi})", c.isNull() | (c < lo) | (c > hi))


def matches(col: str, pattern: str) -> Rule:
    c = F.col(col)
    return Rule(f"matches({col})", c.isNull() | ~c.rlike(pattern))


def isin(col: str, allowed: tuple) -> Rule:
    c = F.col(col)
    return Rule(f"isin({col})", c.isNull() | ~c.isin(*allowed))


def satisfies(name: str, good: Column) -> Rule:
    """Custom rule: ``good`` is the PASS predicate (null counts as fail)."""
    return Rule(name, ~F.coalesce(good, F.lit(False)))


def unique(col: str) -> Rule:
    return Rule(f"unique({col})", unique_col=col)


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule and return the report:
    (rule, n_violations, n_rows, passed). Row-level rules share ONE
    aggregate pass; each unique() rule adds one count-distinct
    aggregate. Row order of the report follows the rule list."""
    if not rules:
        raise ValueError("rules must not be empty")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(
            f"duplicate rule names {dupes} — rule names key the report; "
            "give custom satisfies() rules distinct names"
        )
    row_rules = [r for r in rules if r.unique_col is None]
    uniq_rules = [r for r in rules if r.unique_col is not None]

    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, r in enumerate(row_rules):
        # coalesce: sum over an empty table is NULL — an empty table
        # passes every rule (zero violations), it does not crash
        aggs.append(
            F.coalesce(F.sum(F.when(r.violated, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(f"__v{i}")
        )
    for i, r in enumerate(uniq_rules):
        # violations = rows beyond one per distinct value (null keys are
        # each their own violation of uniqueness-as-key semantics? No:
        # count() counts non-null; nulls are not compared equal, so only
        # non-null duplicates violate — pair with not_null to forbid nulls)
        aggs.append(
            (F.count(r.unique_col) - F.count_distinct(r.unique_col))
            .cast("long")
            .alias(f"__u{i}")
        )
    totals = df.agg(*aggs).head()

    spark = df.sparkSession
    rows = []
    for i, r in enumerate(row_rules):
        rows.append((r.name, int(totals[f"__v{i}"]), int(totals["__n"])))
    for i, r in enumerate(uniq_rules):
        rows.append((r.name, int(totals[f"__u{i}"]), int(totals["__n"])))
    by_name = {name: (v, n) for name, v, n in rows}
    ordered = [(r.name, *by_name[r.name]) for r in rules]
    out = spark.createDataFrame(ordered, "rule string, n_violations long, n_rows long")
    return out.withColumn("passed", F.col("n_violations") == 0)


class QualitySuiteError(ValueError):
    """Raised by :func:`enforce` when any rule fails."""

    def __init__(self, failures: list[tuple[str, int]]):
        msg = "; ".join(f"{name}: {n} violation(s)" for name, n in failures)
        super().__init__(f"quality suite failed — {msg}")
        self.failures = failures


def enforce(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Run :func:`check` and raise :class:`QualitySuiteError` if any
    rule fails (the abort-before-load contract of ``expect()``, suite
    form). Returns the report on success."""
    report = check(df, rules)
    failures = [
        (r["rule"], r["n_violations"]) for r in report.collect() if not r["passed"]
    ]
    if failures:
        raise QualitySuiteError(failures)
    return report


def profile(
    df: DataFrame, cols: list[str] | None = None, exact_distinct: bool = False
) -> DataFrame:
    """Observed per-column statistics — the ANALYZE/profiling twin of the
    asserted :func:`check` rules:
    (column, n_rows, n_nulls, n_distinct, min_value, max_value).

    One aggregate pass over one scan computes every column's stats
    side by side (min/max surface as strings so heterogeneous column
    types share one report schema). ``n_distinct`` defaults to the HLL
    approximation (map-side mergeable — the 100 TB form); pass
    ``exact_distinct=True`` when exactness matters more than the
    count-distinct expansion it costs. The profile is what you run
    FIRST on an unknown table; its numbers become the thresholds of the
    check() suite you then enforce.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("cols must not be empty")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        distinct = (
            F.count_distinct(col) if exact_distinct else F.approx_count_distinct(col)
        )
        aggs += [
            # count() never returns NULL, so total − non-null needs no
            # empty-table workaround (unlike check()'s arbitrary predicates)
            (F.count(F.lit(1)) - F.count(col)).cast("long").alias(f"__nl{i}"),
            distinct.cast("long").alias(f"__d{i}"),
            F.min(col).cast("string").alias(f"__mn{i}"),
            F.max(col).cast("string").alias(f"__mx{i}"),
        ]
    t = df.agg(*aggs).head()
    rows = [
        (c, int(t["__n"]), int(t[f"__nl{i}"]), int(t[f"__d{i}"]),
         t[f"__mn{i}"], t[f"__mx{i}"])
        for i, c in enumerate(cols)
    ]
    return df.sparkSession.createDataFrame(
        rows,
        "column string, n_rows long, n_nulls long, n_distinct long, "
        "min_value string, max_value string",
    )
