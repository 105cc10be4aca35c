"""Bucketized range (interval) join — the second join family the
reference lacks (SURVEY.md §2.3: "No theta/range/as-of/interval joins
exist").

Problem shape: join rows whose timestamps fall within a tolerance of
each other, with NO equality key. Spark plans a raw inequality join as
BroadcastNestedLoopJoin — O(|L|·|R|) comparisons, a non-starter at
100 TB.

Scale design (the standard bucketization rewrite range-join optimizers
apply, e.g. Databricks' range-join hints and DuckDB's IEJoin
alternative): quantize time into buckets of width >= the tolerance,
replicate the RIGHT side into each bucket it can match (its own bucket
±1 — constant-factor expansion, not quadratic), then equi-join on the
bucket id and post-filter the exact predicate. Catalyst executes the
equi-join as a plain shuffled hash/sort-merge join, so the cost model is
the same as any equi-join: one shuffle of |L| + 3·|R| rows, with AQE
handling skewed buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch_s(ts: Column) -> Column:
    """Seconds since epoch as double, for both TIMESTAMP and
    TIMESTAMP_NTZ inputs. ANSI mode (Spark 4 default) forbids a direct
    NTZ→DOUBLE cast; NTZ→TIMESTAMP is allowed and interprets the naive
    value in the session time zone (UTC here) — the same convention as
    DuckDB's epoch() over naive timestamps."""
    return F.unix_micros(ts.cast("timestamp")) / F.lit(1_000_000.0)


def _bucket(ts: Column, width_s: int) -> Column:
    return (_epoch_s(ts) / F.lit(float(width_s))).cast("long")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance_s: int,
    how: str = "inner",
) -> DataFrame:
    """All (left, right) row pairs with
    ``|left_ts - right_ts| <= tolerance_s``.

    The bucket width equals the tolerance, so a left row's matches can
    only live in its own bucket or the two adjacent ones; replicating
    the right side into bucket-1/bucket/bucket+1 (explode of a 3-element
    array) makes the match an exact equi-join on the bucket id. Column
    name collisions are the caller's responsibility (select/alias
    before joining).
    """
    if how != "inner":
        raise ValueError("only inner range joins are supported")
    lb = left.withColumn("_rb", _bucket(F.col(left_ts), tolerance_s))
    rb = right.withColumn(
        "_rb",
        F.explode_outer(
            F.array(
                *[
                    _bucket(F.col(right_ts), tolerance_s) + F.lit(d)
                    for d in (-1, 0, 1)
                ]
            )
        ),
    )
    joined = lb.join(rb, "_rb").where(
        F.abs(_epoch_s(F.col(left_ts)) - _epoch_s(F.col(right_ts)))
        <= F.lit(float(tolerance_s))
    )
    # a right row can land in the same bucket as a left row via at most
    # one of its three replicas, so no dedup is needed
    return joined.drop("_rb")
