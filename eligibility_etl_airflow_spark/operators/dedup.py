"""Deterministic dedup operators.

The reference relies on pandas row order for ``drop_duplicates(keep=...)``
and "first row per group" selection (dags/eligibilty_etl.py:137-147,
src/predictions.py:221, 244-253) — irreproducible on a distributed engine
(SURVEY.md §7.8). Every operator here demands an explicit ordering key and
compiles to a single hash-partitioned window or aggregate: one shuffle on
the dedup key, bounded per-task state, no driver participation — the only
shape that holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__engine_dedup_rn"


def keep_last(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """``drop_duplicates(keep="last")`` with an explicit ordering.

    Keeps, per key group, the row with the HIGHEST order_by value
    (descending row_number = 1).
    """
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order_by])
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )


def keep_first(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """``drop_duplicates(keep="first")`` with an explicit ordering."""
    w = Window.partitionBy(*keys).orderBy(*[c.asc() for c in order_by])
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )


def label_duplicates(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    label_col: str = "dup_label",
    label: str = "Duplicated Service",
    keep_label: str = "ok",
) -> DataFrame:
    """Label (not drop) every non-first row per key group — the outpatient
    duplicate auto-reject (predictions.py:244-253) as pure column logic."""
    w = Window.partitionBy(*keys).orderBy(*[c.asc() for c in order_by])
    return df.withColumn(
        label_col,
        F.when(F.row_number().over(w) > 1, label).otherwise(keep_label),
    )


def dedup_exact(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Full-row (or column-subset) exact dedup — hash aggregate, one shuffle."""
    return df.dropDuplicates(cols) if cols else df.dropDuplicates()
