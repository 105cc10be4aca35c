"""Table catalog over the driver's parquet testdata.

The reference reads whole T-SQL resultsets into pandas
(src/etl_utils.py:58-81 ``read_data``); the engine instead registers each
table as a lazily-scanned parquet source so Catalyst can push filters and
prune columns down to the scan — at 100 TB the scan is the dominant cost
and pushdown/pruning are the two levers that matter most.
"""

from __future__ import annotations

import os

import pyarrow.parquet as _pq
import pyarrow.types as _pat
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.config import TABLES


class Catalog:
    """Lazy parquet-backed catalog for one scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            path = os.path.join(self.sf_dir, f"{name}.parquet")
            df = self.spark.read.parquet(path)
            # TIMESTAMP(NANOS) columns arrive as long (nanosAsLong); restore
            # them to timestamps (integer-div to micros == DuckDB's ns->us).
            schema = _pq.read_schema(path)
            for field in schema:
                if _pat.is_timestamp(field.type) and field.type.unit == "ns":
                    df = df.withColumn(
                        field.name,
                        F.timestamp_micros(F.expr(f"`{field.name}` div 1000")),
                    )
            self._cache[name] = df
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every table as a temp view for spark.sql queries."""
        for name in TABLES:
            path = os.path.join(self.sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                self.table(name).createOrReplaceTempView(name)
