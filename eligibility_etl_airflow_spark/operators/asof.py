"""As-of (time-travel) join — a capability the reference lacks entirely
(SURVEY.md §2.3: "No theta/range/as-of/interval joins exist") but that a
complete analytics engine needs for event-stream enrichment: for each
left row, attach the most recent right row with the same key whose
timestamp is <= the left timestamp.

Scale design: the naive formulation is an inequality join (every left
row against every earlier right row of the same key — quadratic blow-up
per key, and Spark would plan a broadcast-nested-loop for a raw theta
join). Instead we use the union + ordered-window formulation:

1. tag both sides and union them (one narrow column set),
2. one shuffle on the key, one in-partition sort by (ts, side),
3. ``last(right_payload, ignorenulls=True)`` over an unbounded-preceding
   running frame carries the latest right payload forward onto each
   left row.

Cost is exactly one shuffle + one sort of |L|+|R| rows — the same cost
envelope as a sort-merge join, with no pairwise expansion — so it holds
at 100 TB the same way a regular SMJ does (AQE handles skewed keys).
This is the standard scalable as-of pattern (same shape Flink's temporal
join and kdb's aj use: merge-sort the streams, carry last value).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    how: str = "inner",
    suffix: str = "_asof",
) -> DataFrame:
    """For each ``left`` row, attach the latest ``right`` row (same key,
    ``right_ts <= left_ts``). ``right_cols`` are carried over, renamed
    ``<col><suffix>``. ``how`` is ``inner`` (drop unmatched left rows —
    DuckDB ``ASOF JOIN`` semantics) or ``left`` (keep them with nulls).

    Inclusive bound: a right row at exactly the left timestamp matches
    (sides are ordered right-before-left at equal ts).
    """
    keys = [on] if isinstance(on, str) else list(on)
    left_out = [c for c in left.columns]

    payload = F.struct(*[F.col(c).alias(c) for c in right_cols])
    # NULL-timestamp right rows must never match (DuckDB/kdb ASOF compares
    # right_ts <= left_ts, which is never true for NULL); without this
    # filter they sort nulls-first and would be carried as "infinitely old"
    # matches onto every left row until the first real one.
    right = right.filter(F.col(right_ts).isNotNull())
    r = right.select(
        *[F.col(k).alias(f"_k_{i}") for i, k in enumerate(keys)],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left_out],
    )
    l = left.select(
        *[F.col(k).alias(f"_k_{i}") for i, k in enumerate(keys)],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left_out],
    )
    w = (
        Window.partitionBy(*[f"_k_{i}" for i in range(len(keys))])
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if how == "inner":
        carried = carried.filter(F.col("_match").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return carried.select(
        *[F.col(f"_l_{c}").alias(c) for c in left_out],
        *[F.col("_match").getField(c).alias(f"{c}{suffix}") for c in right_cols],
    )
