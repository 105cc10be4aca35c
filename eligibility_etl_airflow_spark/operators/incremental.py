"""Incremental aggregate maintenance — keep a materialized per-key
aggregate current by merging deltas instead of re-aggregating history.

At 100 TB the difference is the whole game: a daily rollup over three
years of facts re-scans ~1000 partitions per refresh if recomputed, vs
one partial aggregate over the new day + one merge join against the
state table. This works because the maintained statistics are
MERGEABLE (commutative monoids): count and sum merge by sum, min/max
by min/max; avg is derived at read time from sum/count (it is NOT
mergeable itself — the classic incremental-view bug is averaging
averages).

Shapes: ``aggregate_state`` is one partial-agg shuffle over the input;
``merge_states`` is one union + re-aggregate on the key (Spark plans
the union's two sides independently — the delta side is small);
``finalize`` is a projection. Nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# measure op → (state builder, state merger)
_OPS = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}

Measures = dict[str, tuple[str, ...]]


def _state_cols(measures: Measures) -> list[tuple[str, str, str]]:
    out = []
    for col, ops in measures.items():
        for op in ops:
            if op not in _OPS:
                raise ValueError(
                    f"unsupported measure op {op!r} (mergeable ops: {sorted(_OPS)}; "
                    "derive avg at read time via finalize)"
                )
            out.append((col, op, f"{op}_{col}"))
    return out


def aggregate_state(df: DataFrame, keys: list[str], measures: Measures) -> DataFrame:
    """Build the mergeable state table: one row per key, columns
    ``<op>_<col>`` per measure plus ``n_rows``."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        _OPS[op][0](F.col(col)).alias(name) for col, op, name in _state_cols(measures)
    ]
    return df.groupBy(*keys).agg(*aggs)


def merge_states(
    prev: DataFrame, delta: DataFrame, keys: list[str], measures: Measures
) -> DataFrame:
    """Merge two state tables (e.g. yesterday's materialized state + the
    new day's partial aggregate) into an updated state. Exactly the
    shuffle cost of aggregating the DELTA, not the history."""
    aggs = [F.sum("n_rows").cast("long").alias("n_rows")] + [
        _OPS[op][1](F.col(name)).alias(name) for _, op, name in _state_cols(measures)
    ]
    return prev.unionByName(delta).groupBy(*keys).agg(*aggs)


def ingest_delta(
    state: DataFrame, delta_rows: DataFrame, keys: list[str], measures: Measures
) -> DataFrame:
    """Convenience: partial-aggregate the raw delta rows, then merge
    into the existing state."""
    return merge_states(state, aggregate_state(delta_rows, keys, measures), keys, measures)


def finalize(state: DataFrame, measures: Measures, avg_cols: list[str] | None = None) -> DataFrame:
    """Read-time projection of derived statistics: ``avg_<col>`` =
    ``sum_<col> / count_<col>`` for each requested column (both
    components must be maintained in ``measures``)."""
    out = state
    for col in avg_cols or []:
        s, c = f"sum_{col}", f"count_{col}"
        if s not in state.columns or c not in state.columns:
            raise ValueError(
                f"avg_{col} needs both sum and count maintained for {col!r}"
            )
        out = out.withColumn(f"avg_{col}", F.col(s) / F.col(c))
    return out
