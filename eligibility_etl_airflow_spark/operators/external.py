"""External-call operators — the REST / LLM fan-out surface
(SURVEY.md §2.1 S9-S11, §2.10 G1-G9, §4 "custom Spark work").

The reference loops ``iterrows()`` with per-row HTTP calls and manual
sleeps (src/eligibility.py:207-268, src/predictions.py:201-290). The
engine's shape is different and scale-first:

- **mapInPandas** iterator UDFs for per-row enrichment: one transport per
  partition (connection reuse), a token-bucket rate limiter (the 10-20 ms
  jitter of eligibility.py:227-228 generalized), retry with backoff
  (etl_utils.py:69-81 semantics) — all inside the executor, no driver loop.
- **applyInPandas** for per-group (per-visit) LLM calls; the group is the
  unit of work exactly as in predictions.py:207-255, with the
  failed-group second pass (predictions.py:297-316) expressed as a retry
  *inside* the UDF, so one job covers both passes.
- Transports are injected callables: production code passes an HTTP
  client; tests pass deterministic mocks (SURVEY.md §7.8 —
  "never benchmark through the network").

Parallelism scales with partitions: 1000 executors × rate-limited
partitions is the distributed equivalent of the reference's batch loops.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class RetryPolicy:
    """Retry-with-backoff envelope (reference: 2x/300s reads, 3x/180s
    writes, 60s LLM backoff — BASELINE.md)."""

    attempts: int = 3
    backoff_s: float = 0.0  # tests use 0; production sets the real budget
    backoff_multiplier: float = 1.0

    def run(self, fn: Callable[[], dict], on_error: Callable[[Exception], dict]) -> dict:
        delay = self.backoff_s
        for attempt in range(self.attempts):
            try:
                return fn()
            except Exception as exc:  # noqa: BLE001 — transport errors are data
                if attempt == self.attempts - 1:
                    return on_error(exc)
                if delay > 0:
                    time.sleep(delay)
                delay *= self.backoff_multiplier
        return on_error(RuntimeError("unreachable"))


class RateLimiter:
    """Token-bucket pacing per executor task (eligibility.py:227-228)."""

    def __init__(self, max_per_sec: float | None):
        self.min_interval = 1.0 / max_per_sec if max_per_sec else 0.0
        self._last = 0.0

    def wait(self) -> None:
        if self.min_interval <= 0:
            return
        now = time.monotonic()
        sleep_for = self._last + self.min_interval - now
        if sleep_for > 0:
            time.sleep(sleep_for)
        self._last = time.monotonic()


def rest_enrich(
    df: DataFrame,
    transport_factory: Callable[[], Callable[[dict], dict]],
    output_schema: str,
    max_per_sec: float | None = None,
    retry: RetryPolicy | None = None,
    error_row: Callable[[dict, Exception], dict] | None = None,
) -> DataFrame:
    """S9/S10: per-row REST enrichment as a mapInPandas iterator UDF.

    ``transport_factory`` is called once per partition (connection reuse);
    the returned transport maps an input-row dict to an output-row dict
    matching ``output_schema``. Failed rows become error rows instead of
    failing the task (eligibility.py:405-406 ``{"status": "error"}``).
    """
    retry = retry or RetryPolicy()
    err = error_row or (lambda row, exc: {**row, "status": "error"})

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = transport_factory()
        limiter = RateLimiter(max_per_sec)
        for batch in batches:
            out = []
            for row in batch.to_dict("records"):
                limiter.wait()
                out.append(
                    retry.run(lambda r=row: transport(r), lambda exc, r=row: err(r, exc))
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=output_schema)


def llm_per_group(
    df: DataFrame,
    group_col: str,
    respond: Callable[[pd.DataFrame], str],
    parse: Callable[[str], dict],
    result_schema: str,
    merge_batch: Callable[[pd.DataFrame, "pd.Series"], pd.DataFrame],
    retry: RetryPolicy | None = None,
) -> DataFrame:
    """S11/G1-G8: per-group (per-visit) LLM operator.

    Per group: ``respond`` produces the raw LLM text (production: HTTP;
    tests: deterministic mock) and ``parse`` is the repair ladder. The
    failed-group second pass (predictions.py:297-316) happens inside the
    executor via ``retry``; a group that still fails parses to
    ``{"__failed__": True}`` so ``merge_batch`` can label it ("Failed to
    reach LLM", predictions.py:346-390) instead of aborting the job.

    Execution shape — measured against the obvious alternative:
    ``groupBy().applyInPandas`` pays one Python call + one Arrow batch per
    GROUP; with millions of small visit groups that overhead dominated
    (49 s vs <10 s at sf0.1). Instead: hash-partition on the group key,
    sort within partitions so groups are contiguous, mapInPandas with
    group-boundary carry between Arrow batches, numpy-boundary slicing
    (no per-group pandas copies), and ONE vectorized ``merge_batch``
    call per Arrow batch. Same single shuffle; ~thousands of groups per
    Python call.

    ``merge_batch(batch, parsed)`` receives the batch rows plus a Series
    (aligned to ``batch.index``) holding each row's group parse result.

    Token accounting (A9, reference src/predictions.py:320-339): when
    ``respond`` returns a :class:`~.transports.ChatResult` (anything with
    ``.text``/``.input_tokens``/``.output_tokens``) instead of a bare
    string, the group's parse dict is augmented with reserved
    ``"__input_tokens__"`` / ``"__output_tokens__"`` keys so
    ``merge_batch`` can emit per-row token columns and
    :func:`metrics_totals` can roll them up. Reserved keys are
    double-underscore-fenced; data keys must not collide with them.
    """
    import numpy as np

    retry = retry or RetryPolicy()

    def handle(group: pd.DataFrame) -> dict:
        # tokens are billed per CALL, so every attempt that reached the
        # service counts — a retried group reports the SUM of its
        # attempts' tokens, and a group that ultimately fails still
        # carries what its failed attempts billed (the reference
        # accumulates per call, predictions.py:320-339; reporting only
        # the winning attempt would under-state real spend on any retry)
        billed = {"in": 0, "out": 0}

        def call() -> dict:
            resp = respond(group)
            if isinstance(resp, str):
                return parse(resp)
            billed["in"] += int(resp.input_tokens)
            billed["out"] += int(resp.output_tokens)
            out = dict(parse(resp.text))
            out["__input_tokens__"] = billed["in"]
            out["__output_tokens__"] = billed["out"]
            return out

        result = retry.run(call, lambda _exc: {"__failed__": True})
        if result.get("__failed__") and (billed["in"] or billed["out"]):
            result = dict(result)
            result["__input_tokens__"] = billed["in"]
            result["__output_tokens__"] = billed["out"]
        return result

    parts = df.repartition(group_col).sortWithinPartitions(group_col)

    def emit(batch: pd.DataFrame) -> pd.DataFrame:
        keys = batch[group_col].to_numpy()
        # groups are contiguous post-sort: boundaries via adjacent-diff
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], len(keys)]
        # fill through a raw object ndarray: per-group pandas .iloc
        # assignment re-validates the index on every group (~40% of the
        # batch time with tens of thousands of small groups). The repeat
        # list (not a bare scalar assign) keeps broadcast semantics even
        # if a caller's parse returns an array-like — numpy would
        # otherwise spread a list result element-wise across the rows.
        vals = np.empty(len(batch), dtype=object)
        for s, e in zip(starts, ends):
            vals[s:e] = [handle(batch.iloc[s:e])] * (e - s)
        parsed = pd.Series(vals, index=batch.index)
        return merge_batch(batch, parsed)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pending: pd.DataFrame | None = None
        for batch in batches:
            if pending is not None:
                batch = pd.concat([pending, batch], ignore_index=True)
                pending = None
            if batch.empty:
                continue
            # the last key may continue into the next Arrow batch — hold it
            last_key = batch[group_col].iloc[-1]
            tail_mask = (batch[group_col] == last_key).to_numpy()
            pending = batch[tail_mask]
            ready = batch[~tail_mask]
            if not ready.empty:
                yield emit(ready.reset_index(drop=True))
        if pending is not None and not pending.empty:
            yield emit(pending.reset_index(drop=True))

    return parts.mapInPandas(run, schema=result_schema)


def with_processed_anti_join(df: DataFrame, done: DataFrame, key: str) -> DataFrame:
    """G9/J7: resume primitive — drop rows whose key already reached the
    sink (replaces checkpoint files, run_predictions.py:215-226)."""
    return df.join(done.select(key), key, "left_anti")


def metrics_totals(df: DataFrame, token_cols: dict[str, str]) -> DataFrame:
    """A9: token/cost accounting as a partial-aggregatable sum over the
    UDF-produced metric columns (predictions.py:320-339)."""
    aggs = [F.sum(F.col(src)).alias(dst) for dst, src in token_cols.items()]
    return df.agg(*aggs)


def llm_cost_totals(
    df: DataFrame,
    input_col: str = "input_tokens",
    output_col: str = "output_tokens",
    input_price_nanousd: int = 560,
    output_price_nanousd: int = 1680,
) -> DataFrame:
    """A9: the reference's cost rollup (predictions.py:320-339 — $0.56 /
    $1.68 per 1M tokens, i.e. 560 / 1680 nano-USD per token) as ONE
    partial-aggregatable pass. Cost is integer nano-USD so the result is
    exact and oracle-hashable; divide by 1e9 for dollars at the edge."""
    return df.agg(
        F.sum(F.col(input_col)).cast("long").alias("total_input_tokens"),
        F.sum(F.col(output_col)).cast("long").alias("total_output_tokens"),
        (F.sum(F.col(input_col)) + F.sum(F.col(output_col)))
        .cast("long")
        .alias("total_tokens"),
        (
            F.sum(F.col(input_col)) * F.lit(input_price_nanousd)
            + F.sum(F.col(output_col)) * F.lit(output_price_nanousd)
        )
        .cast("long")
        .alias("total_cost_nanousd"),
    )
