"""Byte-pair-encoding tokenizer: corpus-trained merges + distributed
segmentation.

Token counting with a FIXED regex (operators/text.py::token_count_bpe)
approximates what a trained tokenizer does; real pipeline accounting
(sequence packing budgets, cost estimates, context-length filtering)
wants counts under a LEARNED vocabulary. The classic split:

- **training** happens driver-side on a bounded sample — the same
  discipline as ``train_pq_codebooks`` / ``train_ivf_centroids``:
  nothing data-proportional reaches the driver (``sample_size`` rows
  via ``limit``), and BPE merge learning is inherently sequential
  (merge i+1 depends on merge i), so distributing it buys nothing.
  Deterministic: ties on pair frequency break lexicographically, so
  the same sample yields the same vocabulary everywhere.
- **application** is embarrassingly parallel: merges broadcast in the
  task closure (a few KB), each Arrow batch segments its words with a
  per-batch memo (natural-language word frequency is Zipfian — the memo
  hit rate makes the amortized cost per word ~O(1)).

Pure cores (``train_merges_core``, ``apply_merges_word``) are module
functions so property tests run them without a SparkSession.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators.tokenize import TOKEN_SPLIT, tokens_of


def train_merges_core(
    word_freqs: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` BPE merges from word frequencies.
    Standard algorithm: words start as character sequences; each round
    merges the most frequent adjacent symbol pair (ties broken
    lexicographically for determinism); stops early when no pair
    repeats."""
    seqs: dict[tuple[str, ...], int] = {
        tuple(w): f for w, f in word_freqs.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for seq, f in seqs.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += f
        if not pairs:
            break
        best_count = max(pairs.values())
        if best_count < 2:
            break
        best = min(p for p, c in pairs.items() if c == best_count)
        merges.append(best)
        merged = best[0] + best[1]
        new_seqs: dict[tuple[str, ...], int] = {}
        for seq, f in seqs.items():
            out: list[str] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == best[0] and seq[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            key = tuple(out)
            new_seqs[key] = new_seqs.get(key, 0) + f
        seqs = new_seqs
    return merges


def apply_merges_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word under merge ranks: repeatedly apply the
    lowest-rank (earliest-learned) applicable merge — the standard BPE
    inference order, NOT greedy left-to-right."""
    seq: list[str] = list(word)
    while len(seq) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def train_bpe_merges(
    df: DataFrame,
    text_col: str,
    num_merges: int = 200,
    sample_size: int = 2048,
) -> list[tuple[str, str]]:
    """Learn BPE merges from a bounded corpus sample. The driver sees at
    most ``sample_size`` rows (bounded transfer) and the word-freq
    Counter derived from them — never the corpus.

    The sample is a function of the DATA, not the file layout: rows are
    ranked by ``md5(seed || text)`` and the lowest ``sample_size`` taken
    (a plain ``limit()`` on an unordered relation is partition-layout-
    dependent — compacting or repartitioning the same corpus would
    silently change the learned vocabulary). Spark plans the
    orderBy+limit as TakeOrderedAndProject: per-partition top-k plus a
    driver merge of k-row heads, no global sort shuffle — the same cost
    shape as the old limit at any scale. Same reproducibility discipline
    as ``assign_split`` (operators/sampling.py)."""
    rows = (
        df.select(F.lower(F.col(text_col)).alias("t"))
        .where(F.col("t").isNotNull())
        .orderBy(F.md5(F.concat(F.lit("bpe-sample-v1|"), F.col("t"))), "t")
        .limit(sample_size)
        .collect()
    )
    import re

    freqs: Counter[str] = Counter()
    splitter = re.compile(TOKEN_SPLIT)
    for r in rows:
        for w in splitter.split(r.t):
            if w:
                freqs[w] += 1
    return train_merges_core(dict(freqs), num_merges)


def bpe_segment(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """(id, n_words, n_tokens) token accounting under a trained merge
    list — Arrow-batched mapInPandas, merges in the closure, per-batch
    word memo. The id column keeps its input type (id-generic contract)."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    id_type = dict(df.dtypes)[id_col]

    # tokens_of coalesces null text to an empty token list (0 words,
    # 0 tokens), not a null the Python stage would trip over.
    # ensure_parallelism: the per-word merge loop is the CPU-heavy part
    # and a small single-file scan would otherwise run it as ONE Python
    # task (see operators/parallel.py; no-op on production-scale scans)
    from eligibility_etl_airflow_spark.operators.parallel import ensure_parallelism

    src = ensure_parallelism(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("id"), tokens_of(F.col(text_col)).alias("words")
    )

    def seg(batches):
        memo: dict[str, int] = {}
        for pdf in batches:
            n_words = []
            n_tokens = []
            for words in pdf["words"]:
                total = 0
                for w in words:
                    n = memo.get(w)
                    if n is None:
                        n = len(apply_merges_word(w, ranks))
                        memo[w] = n
                    total += n
                n_words.append(len(words))
                n_tokens.append(total)
            yield pd.DataFrame(
                {"id": pdf["id"], "n_words": n_words, "n_tokens": n_tokens}
            )

    return src.mapInPandas(
        seg, schema=f"id {id_type}, n_words long, n_tokens long"
    )
