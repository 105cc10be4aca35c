"""Scalar function library (SURVEY.md §2.8 F1-F15).

Everything here is built-in column expressions — JVM-side, inside
whole-stage codegen. No Python UDFs: at 100 TB a row-at-a-time Python
function in the hot path is a 10-100x slowdown (SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decode_map(col: Column, mapping: dict[str, str], default: Column | str | None = None) -> Column:
    """CASE value decode (eligibility_enhanced.sql:17-44 marital/id-type;
    eligibility.py:631-638 gender/marital dicts with passthrough default).

    ``default=None`` passes the input through unchanged (dict.get(x, x)).
    """
    out = None
    for raw, label in mapping.items():
        cond = col == raw
        out = F.when(cond, label) if out is None else out.when(cond, label)
    if default is None:
        return out.otherwise(col)
    return out.otherwise(default if isinstance(default, Column) else F.lit(default))


def parse_timestamp_multi(col: Column, formats: list[str]) -> Column:
    """F4: multi-format timestamp parse, NULL if nothing matches
    (eligibility.py:297-314 change_date; lch_eligibility.py:84-94).

    The reference strips fractional seconds first; try_to_timestamp with a
    fractional-aware format covers that without a UDF.
    """
    attempts = [F.try_to_timestamp(col, F.lit(fmt)) for fmt in formats]
    return F.coalesce(*attempts)


def parse_date_multi(col: Column, formats: list[str]) -> Column:
    """F4 variant emitting DATE (the reference emits '%Y-%m-%d' strings)."""
    return parse_timestamp_multi(col, formats).cast("date")


def age_years(born: Column, anchor: Column) -> Column:
    """F6: birthday-corrected age in whole years
    (resubmission_update.sql:123-139; the naive DATEDIFF(YEAR) variant at
    resubmission.sql:34 overcounts before the birthday)."""
    year_diff = F.year(anchor) - F.year(born)
    before_birthday = (F.month(anchor) < F.month(born)) | (
        (F.month(anchor) == F.month(born)) & (F.dayofmonth(anchor) < F.dayofmonth(born))
    )
    return (year_diff - F.when(before_birthday, 1).otherwise(0)).cast("long")


def coalesce_conflict(primary: Column, alternate: Column) -> Column:
    """P10: name_conflict column coalescing (eligibility.py:158-176) —
    fill the primary column from its alternate-generation twin."""
    return F.coalesce(primary, alternate)


def safe_long(col: Column) -> Column:
    """P12: ``pd.to_numeric(errors="coerce").astype("Int64")`` →
    try_cast to BIGINT, NULL on garbage (eligibility.py:256-259)."""
    return col.cast("string").try_cast("long")


def normalize_key(col: Column) -> Column:
    """F12: join-key normalization ``.str.strip().str.lower()``."""
    return F.lower(F.trim(col))


def full_name(*parts: Column) -> Column:
    """F1: CONCAT of name parts, null-skipping (eligibility_enhanced.sql:13)."""
    return F.concat_ws(" ", *parts)


def strip_markdown_fences(col: Column) -> Column:
    """F10: remove ```json fences around LLM output (predictions.py:170-176)."""
    return F.regexp_replace(
        F.regexp_replace(col, r"^\s*```(?:json)?\s*", ""), r"\s*```\s*$", ""
    )


def contains_word(col: Column, word: str) -> Column:
    """F10: whole-word search (``\\bapproved\\b``, predictions.py:179-191)."""
    return col.rlike(rf"\b{word}\b")
