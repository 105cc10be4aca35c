"""Local mirror of the driver's DuckDB-oracle correctness check.

Runs a registered Spark query and its oracle SQL side by side on the same
parquet directory and compares row count, column names, and (order-
insensitively) values — the same contract CORRECTNESS_r{N}.json grades.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

from eligibility_etl_airflow_spark.config import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.sql(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif s.dtype == object:
            import datetime

            non_null = s.dropna()
            if len(non_null) and all(
                isinstance(v, datetime.date) and not isinstance(v, datetime.datetime)
                for v in non_null
            ):
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
            else:
                df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    key = df.apply(lambda row: tuple(str(v) for v in row), axis=1)
    df = df.iloc[key.argsort(kind="stable").to_numpy()].reset_index(drop=True)
    return df


def assert_parity(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str) -> None:
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs {len(oracle_df)}"
    )
    a, b = normalize(spark_df), normalize(oracle_df)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False,
                                  rtol=1e-6, atol=1e-9, obj=name)
