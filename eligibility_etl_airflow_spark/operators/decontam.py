"""Benchmark decontamination — flag corpus documents that overlap an
evaluation set by shared word n-grams.

Every serious training-data pipeline runs this before training: a
document that contains a benchmark's prompts or answers leaks the test
set into the training set (the GPT-3/PaLM appendices describe the same
13-gram collision scan). The relational shape is corpus-friendly:

- Both sides tokenize with the same JVM regex split used by the TF-IDF
  and quality queries (lowercase, ``[^a-z]+`` separators) and expand to
  *distinct* word n-grams per document — a Generate inside the scan
  stage, no shuffle.
- The benchmark side is small by definition (an eval set, not a second
  corpus), so its distinct n-grams broadcast; the corpus side never
  shuffles at all — explode → broadcast-hash left join → partial-agg
  per doc_id. At 100 TB the whole scan is one map-side pass plus the
  per-doc aggregate on the corpus's own key.
- ``hash_ngrams=True`` (default) replaces each n-gram string with its
  ``xxhash64`` before the join — 8 bytes instead of ~50 per n-gram in
  the broadcast table and the join probe. The string form exists for
  engines that must compare against a portable oracle (DuckDB has no
  xxhash64).

A doc with fewer than n tokens has no n-grams: it survives with
``n_ngrams = 0`` and can never be flagged (explode_outer, not explode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators.tokenize import (  # noqa: F401
    TOKEN_SPLIT as TOKEN_SPLIT_RE,
    tokens_of,
)

# tokens_of must be staged as its OWN projection alias before feeding
# ngrams_of_tokens: the n-gram lambda references the token array once
# per position, and an inline split expression would re-split the whole
# document per n-gram (the measured O(len²) higher-order-function
# re-evaluation trap). A multi-referenced non-trivial alias stays an
# attribute under CollapseProject, so the split runs once per row.


def ngrams_of_tokens(toks: F.Column, n: int = 8) -> F.Column:
    """Distinct word n-grams from a STAGED token-array column; empty
    array when the doc has fewer than n tokens. The ``size >= n`` guard
    matters: Spark's ``sequence(1, 0)`` counts *down* (yielding [1, 0]),
    it is not empty like most engines'."""
    ngrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.array_distinct(F.when(F.size(toks) >= n, ngrams).otherwise(F.array()))


def word_ngrams(col: F.Column, n: int = 8) -> F.Column:
    """Distinct word n-grams straight from a text column. Convenience
    for SMALL relations (the bench side): used inline, the token split
    re-evaluates per n-gram position — on a corpus-side hot path, stage
    :func:`tokens_of` into a projection and use
    :func:`ngrams_of_tokens` instead."""
    return ngrams_of_tokens(tokens_of(col), n)


def benchmark_ngrams(
    bench: DataFrame, text_col: str, n: int = 8, hash_ngrams: bool = True
) -> DataFrame:
    """(ng) relation of the eval set's distinct n-grams — the broadcast
    side of the contamination join."""
    ng = F.explode(word_ngrams(F.col(text_col), n)).alias("ng")
    out = bench.select(ng).distinct()
    if hash_ngrams:
        out = out.select(F.xxhash64("ng").alias("ng"))
    return out


def contamination_flags(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    hash_ngrams: bool = True,
) -> DataFrame:
    """Per-document contamination report against an eval set:
    (id, n_ngrams, n_matched, overlap, contaminated). ``contaminated``
    is the standard any-collision flag; ``overlap`` (matched fraction,
    4 dp) supports threshold policies."""
    bench_ng = benchmark_ngrams(bench, bench_text_col, n, hash_ngrams).withColumn(
        "_hit", F.lit(1)
    )
    doc_ng = docs.select(
        F.col(id_col), tokens_of(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.explode_outer(ngrams_of_tokens(F.col("_toks"), n)).alias("ng"),
    )
    if hash_ngrams:
        # xxhash64(NULL) returns the seed, not NULL — preserve the null
        # marker of a <n-token doc or count("ng") would see a phantom gram
        doc_ng = doc_ng.select(
            id_col,
            F.when(F.col("ng").isNotNull(), F.xxhash64("ng")).alias("ng"),
        )
    per_doc = (
        doc_ng.join(F.broadcast(bench_ng), "ng", "left")
        .groupBy(id_col)
        .agg(
            F.count("ng").cast("long").alias("n_ngrams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_matched"),
        )
    )
    return per_doc.select(
        id_col,
        "n_ngrams",
        "n_matched",
        F.round(
            F.when(F.col("n_ngrams") > 0, F.col("n_matched") / F.col("n_ngrams")).otherwise(
                F.lit(0.0)
            ),
            4,
        ).alias("overlap"),
        (F.col("n_matched") > 0).alias("contaminated"),
    )


def substring_contamination_flags(
    corpus: DataFrame,
    bench_strings: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_col: str = "bench_text",
    bench_id_col: str = "bench_id",
    min_len: int = 8,
) -> DataFrame:
    """EXACT-SUBSTRING decontamination: flag corpus docs that contain a
    benchmark string VERBATIM (whitespace-normalized, case-folded) —
    the classic eval-answer leak check. This is a different net from
    the n-gram tier: a short answer string ("42", "Paris") never spans
    an 8-gram, and the n-gram tier can fire on paraphrase-adjacent
    overlap this tier will not — production decontamination runs both.

    ``bench_strings`` is (bench_id, bench_text) — eval ANSWERS/prompts,
    small by definition; strings shorter than ``min_len`` after
    normalization raise (a 2-char needle flags half the corpus — a
    threshold the caller must own consciously).

    Plan shape at 100 TB: the bench side broadcasts into a
    BroadcastNestedLoopJoin with a `contains` predicate — the corpus is
    scanned ONCE, never shuffled, and the per-row cost is |bench| string
    scans (vectorized JVM). Output: one row per corpus doc —
    (id, n_bench_hits, contaminated 0/1); per-hit detail is the join
    itself, which callers can take unaggregated via the same relation.
    """
    from eligibility_etl_airflow_spark.operators.neardup import (
        _with_normalized_text,
    )

    guard = F.when(
        F.length(F.col("_bnorm")) < min_len,
        F.raise_error(
            F.concat(
                F.lit(
                    f"substring_contamination_flags: bench string shorter than "
                    f"{min_len} chars after normalization at {bench_id_col}="
                ),
                F.col(bench_id_col).cast("string"),
            )
        ),
    ).otherwise(F.col("_bnorm"))
    bench = (
        _with_normalized_text(bench_strings, bench_id_col, bench_col)
        .withColumnRenamed("_norm", "_bnorm")
        .select(F.col("id").alias(bench_id_col), guard.alias("_bnorm"))
    )
    c = _with_normalized_text(corpus, id_col, text_col)
    hits = (
        c.join(F.broadcast(bench), F.col("_norm").contains(F.col("_bnorm")), "left")
        .groupBy("id")
        .agg(
            F.count(F.col(bench_id_col)).cast("long").alias("n_bench_hits"),
        )
    )
    return hits.select(
        F.col("id").alias(id_col),
        "n_bench_hits",
        (F.col("n_bench_hits") > 0).cast("long").alias("contaminated"),
    )
