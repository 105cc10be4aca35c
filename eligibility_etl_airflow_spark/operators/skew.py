"""Skew-handling join: salting for hot keys (SURVEY.md §4 / 100 TB design).

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains the tool when one key dominates so
heavily that even split partitions bottleneck, or when the skewed side
feeds a non-AQE-splittable pattern. Semantics are identical to the plain
join — the salted query is oracle-checked against the unsalted SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    big rows get a deterministic salt in [0, salt); small rows are
    exploded ×salt so every (key, salt) combination exists. The shuffle
    key becomes (key, salt) — a hot key's rows spread over ``salt``
    reducers instead of one. Replication cost: |small| × salt rows, so
    keep the replicated side the smaller one.

    ``how`` is restricted to joins whose semantics survive replicating the
    small side: inner/left/left_semi/left_anti (big-side rows pass through
    once regardless of replication). right/full/outer would emit each
    unmatched small-side row ``salt`` times — once per replica — so they
    are rejected rather than silently wrong."""
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "replicating the small side would duplicate its unmatched rows "
            "under right/full joins"
        )
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(salt))
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")
