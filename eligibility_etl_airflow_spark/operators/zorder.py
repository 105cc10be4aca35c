"""Z-order (Morton-curve) clustered writes — multi-column file pruning.

``write_clustered`` (range clustering) makes parquet min/max statistics
selective on ONE leading key; a predicate on any other column still
touches every file. Z-ordering interleaves the bits of several columns'
rank-buckets into one sort key, so files become *approximately*
disjoint in EVERY z-ordered dimension at once — a range or point
predicate on any of them prunes most files at the scan. This is the
standard lakehouse layout technique for multi-dimensional access
patterns (the same idea Delta/Iceberg expose as ``OPTIMIZE ZORDER BY``),
built here from plain DataFrame operations.

Scale shape: one ``approxQuantile`` aggregate per z-column (driver
receives 2^bits−1 boundary scalars per column — bounded by the bucket
resolution, never by data), one bit-interleave projection (pure JVM
column arithmetic, no UDF), and one range shuffle on the z-key. The
quantile bucketing makes the curve SKEW-RESISTANT: equal-population
buckets, not equal-width, so a hot key range cannot collapse the curve.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, boundaries: list[float]) -> Column:
    """Equal-population bucket id in [0, len(boundaries)]: the number of
    quantile boundaries strictly below the value. O(2^bits) JVM
    comparisons per row via a fold over the broadcast literal array."""
    bnds = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.aggregate(
        bnds,
        F.lit(0),
        lambda acc, b: acc + F.when(col > b, 1).otherwise(0),
    )


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton interleave of k bucket ids of ``bits`` bits each into one
    long: bit i of column j lands at position i*k + j."""
    k = len(buckets)
    terms = [
        F.shiftleft(
            F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), i * k + j
        )
        for j, b in enumerate(buckets)
        for i in range(bits)
    ]
    return reduce(lambda a, c: a + c, terms)


def lex_prefix_code(col: Column, nbytes: int = 6) -> Column:
    """Order-preserving numeric proxy for a STRING column: the first
    ``nbytes`` UTF-8 BYTES read as a big-endian integer (zero-padded on
    the right, so shorter strings sort first — exactly lexicographic
    byte order up to prefix ties). Use it to z-order string dimensions:

        with_zorder(df.withColumn("s_code", lex_prefix_code(F.col("s"))),
                    ["s_code", "x"])

    Truncation happens on the ENCODED bytes (multibyte text is safe —
    character-level truncation would overflow ``conv``'s 64-bit range).
    ``nbytes`` ≤ 6 (48 bits) stays exact inside double's 53-bit integer
    range; 7 is allowed for bucketing, where the last byte may tie.
    Pure JVM expression — encode/substring/hex/pad/conv, no UDF."""
    if not 1 <= nbytes <= 7:
        raise ValueError(f"nbytes must be in [1, 7], got {nbytes}")
    prefix_bytes = F.substring(F.encode(col, "UTF-8"), 1, nbytes)
    return F.conv(F.rpad(F.hex(prefix_bytes), 2 * nbytes, "0"), 16, 10).cast("double")


def with_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 6,
    key_col: str = "z_key",
    rel_err: float = 0.01,
) -> DataFrame:
    """Attach the z-order key column computed from ``cols`` (numeric).

    ``bits`` is the per-column bucket resolution (2^bits equal-population
    buckets from an ``approxQuantile`` pass). 6 bits × 2-3 columns is
    plenty for file-level pruning; resolution beyond the file count buys
    nothing. Raises on non-numeric columns (z-order strings by
    dictionary-encoding them to codes first)."""
    if not cols or bits < 1 or bits > 16:
        raise ValueError(f"need ≥1 column and 1 ≤ bits ≤ 16, got {cols}, {bits}")
    if len(cols) * bits > 63:
        # beyond 63 the JVM masks the shift count and bit positions
        # silently collide — the z-key would be garbage, not an error
        raise ValueError(
            f"z-key needs {len(cols)}×{bits} = {len(cols) * bits} bits; "
            "a long holds 63 — lower bits or drop columns"
        )
    if key_col in df.columns:
        raise ValueError(f"column {key_col!r} already exists in the input")
    # explicit type check: relying on cast("double") to fail only holds
    # under ANSI mode — with ANSI off, non-numeric values cast to NULL
    # and would silently collapse into one bucket (or trip the unrelated
    # all-NULL error), not raise as the contract promises
    non_numeric = [
        c
        for c in cols
        if df.schema[c].dataType.simpleString()
        not in ("tinyint", "smallint", "int", "bigint", "float", "double", "date", "timestamp", "timestamp_ntz")
        and not df.schema[c].dataType.simpleString().startswith("decimal")
    ]
    if non_numeric:
        raise ValueError(
            f"non-numeric z-order columns: {non_numeric} — encode strings "
            "with lex_prefix_code first"
        )
    n_bnd = (1 << bits) - 1
    probs = [(i + 1) / (1 << bits) for i in range(n_bnd)]
    numeric = df.select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    )
    # one approxQuantile action; driver state = n_bnd scalars per column
    all_bnds = numeric.approxQuantile(cols, probs, rel_err)
    empty = [c for c, b in zip(cols, all_bnds) if not b]
    if empty:
        # approxQuantile ignores nulls: an all-NULL column would become
        # a constant bucket that still consumes interleave bits, halving
        # every other column's selectivity with no diagnostic
        raise ValueError(
            f"z-order columns with no non-null values: {empty} — drop them "
            "from the z-key or backfill first"
        )
    buckets = [
        _bucket(F.col(c).cast("double"), bnds) for c, bnds in zip(cols, all_bnds)
    ]
    return df.withColumn(key_col, _interleave(buckets, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 6,
    mode: str = "overwrite",
    num_files: int | None = None,
) -> None:
    """Z-order-clustered parquet write: compute the z-key, then delegate
    to ``sinks.write_clustered`` on it (one shared range-shuffle/sort/
    write path), dropping the helper column before the files land. Same
    contract as ``write_clustered`` but min/max pruning works on EVERY
    column in ``cols``, not just the leading one."""
    from eligibility_etl_airflow_spark.sources import sinks

    key = "__z"
    while key in df.columns:  # never clobber a user column
        key += "_"
    z = with_zorder(df, cols, bits=bits, key_col=key)
    sinks.write_clustered(
        z, path, [key], mode=mode, num_files=num_files, drop_after_sort=[key]
    )
