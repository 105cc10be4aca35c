"""Source readers (SURVEY.md §2.1 S1): schema-explicit CSV/JSON/parquet.

The reference infers every schema at runtime (pandas from SQL cursors /
parquet / Excel, SURVEY.md §1.3) — the engine's rule is the opposite:
every source declares its schema (FIXTURES.md), so a drifted upstream
file fails loudly at the scan instead of corrupting downstream types.
``mode="FAILFAST"`` enforces it; PERMISSIVE + corrupt-record capture is
the opt-in for quarantine flows.

JDBC (the reference's actual SQL Server source, src/etl_utils.py:21-81)
maps to ``spark.read.format("jdbc").option("query", ...)`` with
predicate pushdown; this environment has no database, so ``read_jdbc``
builds the reader but is exercised only for its option plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    mode: str = "FAILFAST",
    **options: str,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", mode)
        .options(**options)
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "FAILFAST",
    **options: str,
) -> DataFrame:
    return spark.read.schema(schema).option("mode", mode).options(**options).json(path)


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
    header: bool = True,
) -> DataFrame:
    """PERMISSIVE read with the corrupt raw line captured in
    ``corrupt_col`` — the quarantine pattern: valid rows flow on,
    unparseable ones are filterable for a dead-letter sink."""
    full = f"{schema}, {corrupt_col} STRING" if isinstance(schema, str) else schema.add(corrupt_col, "string")
    return (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
    )


def jdbc_options(
    url: str,
    query: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 1000,
) -> dict[str, str]:
    """The JDBC reader's option map as a pure, testable function —
    validation lives here so a misconfigured reader fails at build time,
    not minutes later inside an executor.

    Partitioned reads require column + both bounds together: Spark
    silently single-streams when partitionColumn is present without
    bounds, which at 100 TB is the difference between a parallel scan
    and one cursor (the reference's pd.read_sql_query failure mode,
    src/etl_utils.py:58-81)."""
    opts = {"url": url, "query": query, "fetchsize": str(fetch_size)}
    if driver:
        opts["driver"] = driver
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound "
                "(without bounds Spark reads through a single cursor)"
            )
        # Spark rejects query+partitionColumn together; the documented
        # pattern is dbtable with a subquery alias.
        opts["dbtable"] = f"({opts.pop('query')}) spark_subq"
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions or 8),
        )
    return opts


def read_jdbc(
    spark: SparkSession,
    url: str,
    query: str,
    **kwargs,
):
    """S1: query-pushdown JDBC reader builder. With partition bounds the
    scan parallelizes into ``num_partitions`` range-partitioned queries —
    the distributed replacement for the reference's single-cursor
    ``pd.read_sql_query`` (src/etl_utils.py:58-81)."""
    return spark.read.format("jdbc").options(**jdbc_options(url, query, **kwargs))
