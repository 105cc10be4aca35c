"""Bloom-filter join pruning — drop non-matching fact rows map-side,
before the join shuffle moves them.

The 100 TB problem this solves: a semi join of a huge fact table against
a key set that is too large to broadcast as an IN-list but whose
*membership* fits a few megabytes of bits. Exact semi join shuffles
every fact row on the key; with a Bloom prefilter the fact scan drops
(1 − fpp) of the non-matching rows in the same stage as the scan, so
the shuffle carries only (matches + fpp · non-matches). The follow-up
exact join then removes the false positives — the composed operator is
exact (Bloom filters have no false negatives).

Construction is fully distributed and parameter-bounded:

- Both sides hash the key with JVM ``xxhash64`` (cast to STRING first —
  one fixed representation, so build and probe can never disagree on
  numeric widths; same discipline as ``sketches.count_min``). The k
  probe positions come from Kirsch–Mitzenmacher double hashing
  pos_i = (h1 + i·(h2|1)) mod m, computed by the *same* SQL expression
  on both sides — bit-identical by construction, including Java long
  wraparound.
- The build side explodes the k positions and folds them into 64-bit
  words with one ``bit_or`` group-by; the driver collects only the
  non-zero words — at most min(n·k, m/64) rows, and m is capped, so
  driver memory is parameter-bounded, never data-bounded.
- The probe side computes the k position columns JVM-side and tests the
  broadcast bit array in one Arrow-batched pandas UDF (pure numpy
  gather + shift — memory-bandwidth speed; the only Python in the
  operator, and it sees k longs per row, never the payload columns).

Spark's own runtime row-level filtering (``spark.sql.optimizer.
runtime.bloomFilter.enabled``) does the same trick automatically for
joins *inside one query*; this operator makes the sketch a first-class
value so it can prune a scan in a different job, a different stage, or
a streaming micro-batch (the reference's incremental-resume shape:
"skip rows whose key already reached the DWH").
"""

from __future__ import annotations

import math
import weakref
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

# 2^27 bits = 16 MiB of bit array — comfortably broadcastable, and with
# fpp=0.01 enough for ~14 M distinct keys. A larger key set should raise
# fpp or the cap explicitly rather than silently ballooning the driver.
MAX_BITS = 1 << 27


@dataclass(frozen=True, eq=False)
class BloomSketch:
    """A built Bloom filter: the packed bit words plus the two
    parameters the probe side needs to recompute positions.
    ``eq=False`` keeps identity hashing so a sketch can key the
    per-sketch broadcast cache below (an ndarray field would make the
    generated ``__hash__`` raise)."""

    words: np.ndarray  # uint64[num_bits // 64]
    num_bits: int
    num_hashes: int

    @property
    def size_bytes(self) -> int:
        return int(self.words.nbytes)


# one SparkContext broadcast per live sketch, however many probes reuse
# it: a fresh broadcast per bloom_might_contain call would leak up to
# 16 MiB per call in exactly the repeated-use scenario the module is
# for (a streaming foreachBatch probing the same sketch every batch).
# WeakKey: when the sketch goes away, the entry (and eventually the JVM
# broadcast, via ContextCleaner once the Python ref drops) follows.
_BROADCASTS: "weakref.WeakKeyDictionary[BloomSketch, object]" = (
    weakref.WeakKeyDictionary()
)


def _position_cols(key_col: str, num_bits: int, num_hashes: int) -> list[Column]:
    """The k probe-position columns of ``key_col`` — identical on build
    and probe sides by construction. Both hashes are reduced mod m
    *before* the i·h2 step so h1 + i·h2 ≤ (k+1)·m ≪ 2^63 and the
    arithmetic can never overflow under ANSI mode (Spark 4 default);
    h2|1 keeps the stride odd, so reducing mod m (a multiple of 64)
    preserves oddness and the k probes stay distinct.

    Scalar expressions, not ``element_at(transform(sequence(...)))``:
    the array form rebuilds the whole k-element array (and its two
    hashes per element) for every extracted position — O(k²) hash work
    per row, measured ~2× on the probe stage. The repeated h1/h2
    subtrees here are collapsed by whole-stage codegen's subexpression
    elimination."""
    m = F.lit(num_bits)
    h1 = F.pmod(F.xxhash64(F.col(key_col).cast("string")), m)
    h2 = F.pmod(
        F.xxhash64(F.col(key_col).cast("string"), F.lit(1)).bitwiseOR(F.lit(1)), m
    )
    return [F.pmod(h1 + F.lit(i) * h2, m) for i in range(num_hashes)]


def bloom_sizing(n: int, fpp: float, max_bits: int = MAX_BITS) -> tuple[int, int]:
    """Classic Bloom sizing as a pure function (hypothesis-tested core,
    tests/test_properties.py): m = ceil(−n·ln(fpp)/ln²2) rounded up to a
    64-bit word, floored at one word and clamped to ``max_bits``;
    k = round((m/n)·ln 2) clamped to [1, 30] (past ~30 hashes extra
    probes stop buying fpp, and each probe is one more position column
    on the probe side). Clamping m degrades fpp, never correctness."""
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    n = max(int(n), 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = min(max((m + 63) // 64 * 64, 64), max_bits)
    k = min(max(1, round(m / n * math.log(2))), 30)
    return m, k


def bloom_build(
    keys_df: DataFrame,
    key_col: str,
    fpp: float = 0.01,
    expected_items: int | None = None,
    max_bits: int = MAX_BITS,
) -> BloomSketch:
    """Build a :class:`BloomSketch` over the distinct values of
    ``key_col`` with one distributed pass.

    ``expected_items`` sizes the filter; when omitted it is estimated
    with ``approx_count_distinct`` (an HLL pass — cheap, map-side
    mergeable). The classic sizing m = −n·ln(fpp)/ln(2)² and
    k = (m/n)·ln 2 applies, with m clamped to ``max_bits``; clamping
    degrades fpp, it never breaks correctness (no false negatives
    regardless).
    """
    n = expected_items
    if n is None:
        n = keys_df.agg(
            F.approx_count_distinct(key_col).alias("n")
        ).head()["n"]
    m, k = bloom_sizing(int(n), fpp, max_bits)

    words_rows = (
        keys_df.select(F.explode(F.array(*_position_cols(key_col, m, k))).alias("pos"))
        .groupBy(F.shiftright("pos", 6).alias("word_idx"))
        .agg(F.expr("bit_or(shiftleft(1L, cast(pmod(pos, 64) as int)))").alias("bits"))
        .collect()
    )
    words = np.zeros(m // 64, dtype=np.uint64)
    for row in words_rows:
        words[row["word_idx"]] = np.uint64(row["bits"] & 0xFFFFFFFFFFFFFFFF)
    return BloomSketch(words=words, num_bits=m, num_hashes=k)


def bloom_add(sketch: BloomSketch, keys_df: DataFrame, key_col: str) -> BloomSketch:
    """A NEW sketch containing the old one's keys plus ``keys_df``'s —
    the safe form of cross-batch reuse. Positions are computed with the
    SAME (m, k), so membership of previously-inserted keys is preserved
    exactly; the returned sketch is a fresh object (sketches are
    immutable — the broadcast cache keys on identity).

    This is what a streaming resume loop must call after appending a
    batch to the sink: a stale sketch misses the just-appended keys,
    they probe bloom-negative, and duplicates bypass the exact
    anti-join. Adding beyond the sizing's expected_items degrades fpp
    gradually (more bits set), never correctness."""
    m, k = sketch.num_bits, sketch.num_hashes
    rows = (
        keys_df.select(F.explode(F.array(*_position_cols(key_col, m, k))).alias("pos"))
        .groupBy(F.shiftright("pos", 6).alias("word_idx"))
        .agg(F.expr("bit_or(shiftleft(1L, cast(pmod(pos, 64) as int)))").alias("bits"))
        .collect()
    )
    words = sketch.words.copy()
    for row in rows:
        words[row["word_idx"]] |= np.uint64(row["bits"] & 0xFFFFFFFFFFFFFFFF)
    return BloomSketch(words=words, num_bits=m, num_hashes=k)


def bloom_might_contain(df: DataFrame, key_col: str, sketch: BloomSketch) -> Column:
    """Boolean column: may ``key_col`` be in the sketch's key set?
    True for every present key (no false negatives); true for an absent
    key with probability ≈ fpp."""
    spark = df.sparkSession
    bc = _BROADCASTS.get(sketch)
    if bc is None:
        bc = spark.sparkContext.broadcast(sketch.words)
        _BROADCASTS[sketch] = bc

    @F.pandas_udf(BooleanType())
    def _test(*pos_cols: pd.Series) -> pd.Series:
        words = bc.value
        ok = None
        for col in pos_cols:
            # positions are non-null even for null keys (xxhash64(NULL)
            # returns the seed, not NULL) — the isNull guard OUTSIDE this
            # UDF is what makes null keys non-members; the fillna is a
            # belt-and-braces bound for any engine-introduced null
            pos = col.fillna(0).to_numpy(dtype=np.int64)
            hit = (words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
            ok = hit.astype(bool) if ok is None else (ok & hit.astype(bool))
        return pd.Series(ok)

    args = _position_cols(key_col, sketch.num_bits, sketch.num_hashes)
    # this guard IS the null semantics: xxhash64(NULL) returns the seed
    # (not NULL), so without it every null key would probe the positions
    # of hash(42) and pass whenever those bits happen to be set. Null
    # keys must be non-members, matching semi-join equi-match semantics.
    return F.when(F.col(key_col).isNull(), F.lit(False)).otherwise(_test(*args))


def bloom_prefilter(df: DataFrame, key_col: str, sketch: BloomSketch) -> DataFrame:
    """Keep only rows whose key *might* be in the sketch — a superset of
    the exact semi join, smaller by ≈ (1 − fpp) of the non-matches."""
    return df.filter(bloom_might_contain(df, key_col, sketch))


def bloom_semi_join(
    fact: DataFrame,
    fact_key: str,
    keys_df: DataFrame,
    key_col: str,
    fpp: float = 0.01,
    expected_items: int | None = None,
) -> DataFrame:
    """Exact semi join with a Bloom prefilter ahead of the shuffle.

    Result rows are exactly ``fact semi-join keys`` (the follow-up
    left_semi removes Bloom false positives); the prefilter runs in the
    fact's scan stage, so at 100 TB the shuffle moves only
    matches + fpp·non-matches instead of every row. The reference's
    equivalent is the resume anti/semi filter over already-loaded keys
    (src/etl_utils.py read-back + pandas isin); this is its
    shuffle-avoiding scale form.
    """
    sketch = bloom_build(keys_df, key_col, fpp=fpp, expected_items=expected_items)
    pruned = bloom_prefilter(fact, fact_key, sketch)
    # left_semi deduplicates the build side itself — no distinct shuffle
    return pruned.join(
        keys_df.select(F.col(key_col).alias(fact_key)), on=fact_key, how="left_semi"
    )
