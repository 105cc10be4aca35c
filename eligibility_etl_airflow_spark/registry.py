"""Query registry — the engine's public query surface.

Every operator from SURVEY.md §2 is exposed as a named query; the driver
runs each Spark query against its DuckDB oracle twin (same column names,
same values) at sf0.01. Non-SQL-expressible operators register without an
oracle and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every plans module so registrations run."""
    from eligibility_etl_airflow_spark.plans import (  # noqa: F401
        eligibility,
        relational,
        resubmission,
        predictions,
        fhir,
        llm_pipeline,
        streaming_batch,
        extras,
    )
