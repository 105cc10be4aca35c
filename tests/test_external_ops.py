"""External-call operator tests — retry, failure labeling, resume anti-join.

Transports are deterministic mocks (SURVEY.md §7.8); failure injection is
keyed on row values so it's reproducible across partitioning layouts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators.external import (
    RetryPolicy,
    llm_per_group,
    rest_enrich,
    with_processed_anti_join,
)


def test_rest_enrich_error_rows_do_not_fail_task(spark):
    df = spark.range(20).select(F.col("id").cast("long").alias("k"))

    def factory():
        def call(row):
            if row["k"] % 5 == 0:
                raise RuntimeError("boom")
            return {"k": row["k"], "status": "ok"}

        return call

    out = rest_enrich(
        df,
        factory,
        output_schema="k long, status string",
        retry=RetryPolicy(attempts=2, backoff_s=0.0),
        error_row=lambda row, exc: {"k": row["k"], "status": "error"},
    ).toPandas()
    assert len(out) == 20
    assert set(out[out.status == "error"].k) == {0, 5, 10, 15}
    assert (out[out.k % 5 != 0].status == "ok").all()


def test_rest_enrich_retry_recovers_flaky_transport(spark):
    df = spark.range(10).select(F.col("id").cast("long").alias("k"))

    def factory():
        seen: dict[int, int] = {}

        def call(row):
            k = row["k"]
            seen[k] = seen.get(k, 0) + 1
            if seen[k] == 1 and k % 2 == 0:
                raise TimeoutError("first attempt fails for evens")
            return {"k": k, "attempts": seen[k]}

        return call

    out = rest_enrich(
        df,
        factory,
        output_schema="k long, attempts long",
        retry=RetryPolicy(attempts=3, backoff_s=0.0),
    ).toPandas()
    assert len(out) == 10
    assert (out[out.k % 2 == 0].attempts == 2).all()
    assert (out[out.k % 2 == 1].attempts == 1).all()


def test_llm_per_group_failed_marker(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], ["gid", "item"]
    )

    def respond(group: pd.DataFrame) -> str:
        if int(group["gid"].iloc[0]) == 2:
            raise TimeoutError("LLM timeout")
        return '{"ok": true}'

    def merge_batch(batch, parsed):
        out = batch[["gid", "item"]].copy()
        out["label"] = [
            "Failed to reach LLM" if (m is None or m.get("__failed__")) else "done"
            for m in parsed
        ]
        return out

    out = llm_per_group(
        df,
        group_col="gid",
        respond=respond,
        parse=lambda t: {"parsed": True},
        result_schema="gid long, item string, label string",
        merge_batch=merge_batch,
        retry=RetryPolicy(attempts=2, backoff_s=0.0),
    ).toPandas()
    assert set(out[out.gid == 1].label) == {"done"}
    assert set(out[out.gid == 2].label) == {"Failed to reach LLM"}


def test_with_processed_anti_join_resume(spark):
    todo = spark.createDataFrame([(i,) for i in range(10)], ["k"])
    done = spark.createDataFrame([(i,) for i in range(0, 10, 2)], ["k"])
    remaining = with_processed_anti_join(todo, done, "k").toPandas()
    assert sorted(remaining.k) == [1, 3, 5, 7, 9]


def test_metrics_totals_sums_token_columns(spark):
    from eligibility_etl_airflow_spark.operators.external import metrics_totals

    df = spark.createDataFrame(
        [(100, 20, 0.5), (200, 30, 1.0), (50, 10, 0.25)],
        "in_tokens long, out_tokens long, cost double",
    )
    row = metrics_totals(
        df,
        {"total_in": "in_tokens", "total_out": "out_tokens", "total_cost": "cost"},
    ).first()
    assert (row.total_in, row.total_out, row.total_cost) == (350, 60, 1.75)


def test_token_accounting_accumulates_across_retries(spark):
    """Tokens are billed per CALL: a group whose first response fails to
    parse reports the SUM of both attempts' tokens; a group that never
    parses still carries what its failed attempts billed."""
    from eligibility_etl_airflow_spark.operators.external import (
        RetryPolicy,
        llm_per_group,
    )
    from eligibility_etl_airflow_spark.operators.transports import ChatResult

    calls = {}

    def respond(group):
        gid = int(group["g"].iloc[0])
        calls[gid] = calls.get(gid, 0) + 1
        # g=1: first attempt malformed, second parses; g=2: never parses
        bad = (gid == 1 and calls[gid] == 1) or gid == 2
        return ChatResult(
            text="not json at all {{{" if bad else '{"ok": 1}',
            input_tokens=10,
            output_tokens=5,
        )

    def parse(text):
        import json

        return json.loads(text)

    def merge(batch, parsed):
        import pandas as pd

        return pd.DataFrame(
            {
                "g": batch["g"],
                "failed": [bool(m.get("__failed__", False)) for m in parsed],
                "in_tok": [m.get("__input_tokens__", 0) for m in parsed],
                "out_tok": [m.get("__output_tokens__", 0) for m in parsed],
            }
        )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "g long, v string").coalesce(1)
    out = {
        r.g: r
        for r in llm_per_group(
            df,
            group_col="g",
            respond=respond,
            parse=parse,
            result_schema="g long, failed boolean, in_tok long, out_tok long",
            merge_batch=merge,
            retry=RetryPolicy(attempts=2, backoff_s=0.0),
        ).collect()
    }
    assert not out[1].failed and out[1].in_tok == 20 and out[1].out_tok == 10
    assert out[2].failed and out[2].in_tok == 20 and out[2].out_tok == 10
