"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

The standard LLM-corpus dedup stack, built Spark-first:

- **shingling / MinHash** are pure column expressions (higher-order
  functions over arrays) — JVM-side, codegen, no Python.
- **LSH banding** is explode → hash-partition by (band, signature) →
  self-join inside buckets: the shuffle is on the band key, candidate
  generation is local to each bucket, and nothing ever does an all-pairs
  comparison. This is the only shape that survives 100 TB: cost scales
  with bucket sizes, not corpus².
- **bucket-size capping** guards against degenerate buckets (boilerplate
  shingles) producing quadratic pair blowups — capped buckets are dropped
  and reported, not silently exploded.
- **SimHash** runs as an Arrow-batched mapInPandas (numpy bit-twiddling;
  a 64-expression column formula would bloat codegen past JIT limits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators.text import normalize_text

# Affine MinHash permutations h_i(x) = (a_i * x32 + b_i) mod P.
# x32 = xxhash64 folded to 31 bits so a*x stays < 2^62 (no ANSI overflow).
_P = (1 << 61) - 1
_SEED_A = 0x9E3779B97F4A7C15
_SEED_B = 0xC2B2AE3D27D4EB4F


def _perm_params(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via a splitmix-style scramble — no RNG
    object, reproducible across sessions/partitions by construction."""
    params = []
    for i in range(num_perm):
        a = ((_SEED_A * (i + 1)) ^ (_SEED_B >> (i % 13))) % ((1 << 31) - 1)
        b = ((_SEED_B * (i + 7)) ^ (_SEED_A >> (i % 17))) % ((1 << 31) - 1)
        params.append((a | 1, b))  # odd a → proper permutation mod 2^31
    return params


def char_shingles(col: Column, k: int = 5) -> Column:
    """Distinct character k-shingles of the normalized text."""
    norm = normalize_text(col)
    n = F.length(norm)
    starts = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(starts, lambda i: F.substring(norm, i, k)))


def minhash_signature(shingles: Column, num_perm: int = 64) -> Column:
    """MinHash signature as an array<long> of length ``num_perm``."""
    def perm_min(a: int, b: int) -> Column:
        def h(s: Column) -> Column:
            h32 = F.pmod(F.xxhash64(s), F.lit(1 << 31))
            return F.pmod(F.lit(a) * h32 + F.lit(b), F.lit(_P))

        return F.array_min(F.transform(shingles, h))

    return F.array(*[perm_min(a, b) for a, b in _perm_params(num_perm)])


def lsh_band_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """id → (band_idx, band_sig) rows: the LSH index relation."""
    rows_per_band = num_perm // bands
    sig = minhash_signature(char_shingles(F.col(text_col), shingle_k), num_perm)
    banded = df.select(F.col(id_col).alias("id"), sig.alias("sig")).select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ":",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_sig"),
    )
    return banded


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with exact Jaccard verification.

    candidate generation: same (band_idx, band_sig) bucket; buckets larger
    than ``max_bucket_size`` are dropped (boilerplate guard — at corpus
    scale one degenerate bucket is a quadratic bomb). Verification joins
    the shingle sets back and computes exact Jaccard.
    """
    bandtab = lsh_band_table(df, id_col, text_col, num_perm, bands, shingle_k)
    bucket_sizes = bandtab.groupBy("band_idx", "band_sig").count()
    bandtab = (
        bandtab.join(
            bucket_sizes.filter(F.col("count") <= max_bucket_size),
            ["band_idx", "band_sig"],
        )
        .drop("count")
    )
    left = bandtab.withColumnRenamed("id", "id_a")
    right = bandtab.withColumnRenamed("id", "id_b")
    candidates = (
        left.join(right, ["band_idx", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    shingle_tab = df.select(
        F.col(id_col).alias("sid"),
        char_shingles(F.col(text_col), shingle_k).alias("shingles"),
    )
    verified = (
        candidates.join(shingle_tab.withColumnRenamed("sid", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(shingle_tab.withColumnRenamed("sid", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    shingle_k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for every pair inside a blocking key (e.g.
    same language + length bucket). Blocking bounds the pair count; the
    join shuffles once on the block key."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("block"),
        char_shingles(F.col(text_col), shingle_k).alias("sh"),
    )
    a = sh.select(F.col("id").alias("id_a"), "block", F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), "block", F.col("sh").alias("sh_b"))
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "block",
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document (Arrow-batched numpy, no per-row Python).

    Hamming-close signatures ≈ near-duplicates; pairing is done by
    splitting the signature into 4 × 16-bit blocks (documents within
    hamming distance 3 share at least one block) — same ban-the-cross-join
    philosophy as MinHash-LSH.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    def batch(frames):
        for pdf in frames:
            sigs = []
            for text in pdf[text_col].astype(str):
                toks = text.lower().split()
                if not toks:
                    sigs.append(0)
                    continue
                hashes = np.array(
                    [
                        int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                        for t in toks
                    ],
                    dtype=np.uint64,
                )
                bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
                counts = bits.sum(axis=0)
                sig = ((counts * 2 > len(hashes)).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()
                sigs.append(int(sig) - (1 << 63))  # store as signed long
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": sigs})

    return df.select(id_col, text_col).mapInPandas(batch, schema=f"{id_col} long, simhash long")


def simhash_block_pairs(sim_df: DataFrame, id_col: str, max_hamming: int = 3) -> DataFrame:
    """Candidate pairs sharing ≥1 of 4 16-bit signature blocks, verified
    by exact popcount hamming distance."""
    u = F.col("simhash").cast("long")
    blocks = F.array(
        *[F.shiftrightunsigned(u, i * 16).bitwiseAND(F.lit(0xFFFF)).cast("long") for i in range(4)]
    )
    tab = sim_df.select(
        F.col(id_col).alias("id"), "simhash", F.posexplode(blocks).alias("block_idx", "block_val")
    )
    a = tab.select(F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"), "block_idx", "block_val")
    b = tab.select(F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"), "block_idx", "block_val")
    pairs = (
        a.join(b, ["block_idx", "block_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return pairs
