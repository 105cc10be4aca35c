"""Dimension-history operators: SCD type-2 construction and CDC
snapshot diffing — the warehouse bookkeeping around every ETL load the
reference performs destructively (its MERGE upsert overwrites state;
src/etl_utils.py:87-145 keeps no history and emits no changeset).

Both operators are single declarative plans: SCD2 is two window
functions over one hash partition by entity key; snapshot diff is one
full-outer join on the key. Catalyst handles pushdown/pruning; nothing
iterates and nothing reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change
    log: one row per (key, attribute-version) with ``valid_from``,
    ``valid_to`` (null = still current) and ``is_current``.

    Consecutive log rows whose tracked attributes are unchanged are
    compacted away first (a real change log carries heartbeats and
    no-op updates; SCD2 versions only on actual change). Ordering is
    ``ts_col`` then ``tiebreak_cols`` — pass a unique tiebreaker (e.g.
    the log sequence id) whenever timestamps can collide, otherwise the
    version history is not well-defined.

    Scale shape: one shuffle on the entity key; both the change-compare
    (lag) and the interval close (lead) run in the same window sort.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)

    changed = changes.withColumn(
        "__is_change",
        F.coalesce(
            # null-safe inequality against the previous row, any attr
            ~F.struct(*[F.col(c) for c in attr_cols]).eqNullSafe(
                F.lag(F.struct(*[F.col(c) for c in attr_cols])).over(w)
            ),
            F.lit(True),  # first row per key is always a version start
        ),
    ).filter(F.col("__is_change"))

    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*keys, *attr_cols, "valid_from", "valid_to", "is_current")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    change_col: str = "change_type",
) -> DataFrame:
    """CDC changeset between two snapshots of the same table: one row
    per key that was inserted, deleted, or updated (unchanged keys are
    dropped). Non-key columns come back twice, prefixed ``old_`` /
    ``new_`` (null on the missing side of inserts/deletes).

    ``compare_cols`` limits which columns define "updated" (default:
    every shared non-key column). Comparison is null-safe — a value
    moving to/from NULL is an update, two NULLs are equal.

    One full-outer shuffle join on the key; at 100 TB both sides
    partition-prune and the join is the unavoidable cost of a diff.
    """
    shared = [c for c in old.columns if c in set(new.columns) and c not in keys]
    cmp_cols = compare_cols or shared
    missing = [c for c in cmp_cols if c not in shared]
    if missing:
        raise ValueError(f"compare_cols not in both snapshots: {missing}")

    o = old.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in shared],
    )
    n = new.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in shared],
    )
    joined = o.join(n, keys, "full_outer")

    differs = F.lit(False)
    for c in cmp_cols:
        differs = differs | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))

    return (
        joined.withColumn(
            change_col,
            F.when(F.col("__in_old").isNull(), F.lit("insert"))
            .when(F.col("__in_new").isNull(), F.lit("delete"))
            .when(differs, F.lit("update")),
        )
        .filter(F.col(change_col).isNotNull())
        .drop("__in_old", "__in_new")
    )
