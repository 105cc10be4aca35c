"""Skew-handling join: salting for hot keys (SURVEY.md §4 / 100 TB design).

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains the tool when one key dominates so
heavily that even split partitions bottleneck, or when the skewed side
feeds a non-AQE-splittable pattern. Semantics are identical to the plain
join — the salted query is oracle-checked against the unsalted SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    big rows get a deterministic salt in [0, salt); small rows are
    exploded ×salt so every (key, salt) combination exists. The shuffle
    key becomes (key, salt) — a hot key's rows spread over ``salt``
    reducers instead of one. Replication cost: |small| × salt rows, so
    keep the replicated side the smaller one.

    ``how`` is restricted to joins whose semantics survive replicating the
    small side: inner/left/left_semi/left_anti (big-side rows pass through
    once regardless of replication). right/full/outer would emit each
    unmatched small-side row ``salt`` times — once per replica — so they
    are rejected rather than silently wrong."""
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "replicating the small side would duplicate its unmatched rows "
            "under right/full joins"
        )
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(salt))
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")


def hot_keys(df: DataFrame, key: str, k: int = 10) -> DataFrame:
    """(key, cnt, share, rnk) top-k hottest join/grouping keys — the
    diagnostic that decides between plain join, AQE skew splitting, and
    :func:`salted_join`. One partial-aggregated count plus a bounded
    top-k window over the (small) per-key count relation; share is the
    key's fraction of all rows, rounded to 6 dp."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    # total derives from the per-key relation — NOT a second scan of df
    total = counts.agg(F.sum("cnt").alias("total"))
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("cnt"), F.asc(key))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("cnt") / F.col("total"), 6))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            key,
            F.col("cnt").cast("long").alias("cnt"),
            "share",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def skew_stats(df: DataFrame, key: str) -> DataFrame:
    """One-row skew summary for a key: total rows, distinct keys, max
    per-key count, and skew_ratio = max/mean per-key count (rounded to
    4 dp). skew_ratio ≈ 1 means uniform; ≳ 10 means a hot key that will
    bottleneck a shuffle reducer and warrants salting or finer AQE skew
    thresholds. Two aggregates, constant-size result."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    return counts.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_key_rows"),
        F.round(F.max("cnt") / F.avg("cnt"), 4).alias("skew_ratio"),
    )
