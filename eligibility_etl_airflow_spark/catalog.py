"""Table catalog over the driver's parquet testdata.

The reference reads whole T-SQL resultsets into pandas
(src/etl_utils.py:58-81 ``read_data``); the engine instead registers each
table as a lazily-scanned parquet source so Catalyst can push filters and
prune columns down to the scan — at 100 TB the scan is the dominant cost
and pushdown/pruning are the two levers that matter most.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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
            self._cache[name] = self.spark.read.parquet(path)
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
