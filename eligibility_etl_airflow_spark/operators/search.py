"""Ranked keyword retrieval: inverted index + BM25 scoring.

A corpus-curation engine needs lexical search twice: (a) ad-hoc "find the
documents about X" over a 100 TB corpus, and (b) the retrieval half of
decontamination / attribution tooling (which benchmark doc does this
training doc most resemble lexically?). Both reduce to the same plan:

- **inverted index** = explode(tokens) → groupBy(term, doc) count — one
  hash aggregate, partial-agg map-side, shuffle keyed on (term, doc).
  At 100 TB this is the classic "build the postings" job; the index
  relation can be written out bucketed by term for reuse.
- **BM25 scoring** touches only the postings of the query's terms: the
  term filter is pushed into the scan side of the aggregate (predicate
  on the exploded term), so cost scales with the query terms' document
  frequency, never the corpus. Scoring is pure JVM column arithmetic;
  the final top-k is one window over the matched docs only.

Everything is built-in expressions — no Python in the pipeline.
Reference parity: the reference has no search operator; this extends the
text-analysis family (SURVEY.md §2.13) with the standard IR primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eligibility_etl_airflow_spark.operators.tokenize import TOKEN_SPLIT, tokens_of


def term_postings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str] | None = None,
    terms_df: DataFrame | None = None,
) -> DataFrame:
    """(id, term, tf) postings — the inverted index as a relation.

    ``terms`` (a literal list) or ``terms_df`` (a one-column ``term``
    relation, broadcast semi join) restricts the index to the given
    vocabulary *before* the aggregate — the filter sits on the exploded
    term, so the shuffle only carries matching postings and query-time
    cost is proportional to the query terms' postings, not the corpus.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias("term"),
    ).filter(F.col("term") != "")
    if terms is not None:
        toks = toks.filter(F.col("term").isin(list(terms)))
    if terms_df is not None:
        toks = toks.join(F.broadcast(terms_df.select("term")), "term", "left_semi")
    return toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))


def doc_lengths(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, dl) document token lengths for BM25 normalization — a pure
    map-side expression (no explode needed), one scan projection.
    Null text counts as dl=0 (``tokens_of`` coalesces — Spark's
    ``size(NULL)`` is -1, which would poison an average)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.size(tokens_of(F.col(text_col))).cast("long").alias("dl"),
    )


def _corpus_stats(dl: DataFrame) -> DataFrame:
    """One-row (n_docs, avgdl) from the lengths relation — a single
    aggregate over the scan BM25 already performs. n_docs counts EVERY
    document (token-less ones are part of the collection for idf);
    avgdl averages only docs with at least one token, matching the
    postings-derived definition the DuckDB oracle uses."""
    return dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.when(F.col("dl") > 0, F.col("dl"))).alias("avgdl"),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25.

    Plan shape (all JVM, two shuffles):

    1. postings restricted to ``query_terms`` (filter-before-aggregate —
       cost ∝ Σ df(term), not corpus size);
    2. per-term document frequency as a count window over those postings
       (one shuffle of the restricted postings; the lineage — a corpus
       explode — is consumed exactly once);
    3. score per (doc, term), sum per doc, global top-k via window over a
       single partition *of matched docs only* (bounded by the postings,
       and k rows survive).

    idf uses the standard Robertson/Sparck-Jones form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` so scores stay positive.
    Output emits the integer evidence (n_matched, total tf) plus the
    rank; the float score stays internal so downstream hash comparisons
    are exact.
    """
    if not query_terms:
        raise ValueError("bm25_topk requires at least one query term")
    post = term_postings(df, id_col, text_col, terms=query_terms)
    # dfreq as a window over the postings, not a second aggregate joined
    # back: the postings lineage (a full corpus explode) is consumed
    # exactly once — the aggregate+broadcast-join form re-executed the
    # explode scan (no exchange reuse across the differing subtrees),
    # i.e. one extra corpus text pass per query at 100 TB. The window
    # only shuffles the already-term-restricted postings (cost ∝ matched
    # postings, never the corpus).
    post = post.withColumn(
        "dfreq", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    dl = doc_lengths(df, id_col, text_col)
    scored = (
        post.join(dl, "id")
        .crossJoin(F.broadcast(_corpus_stats(dl)))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
                / (F.col("dfreq") + F.lit(0.5))
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (F.lit(k1) + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.sum("term_score").alias("score"),
        F.count(F.lit(1)).alias("n_matched"),
        F.sum("tf").alias("total_tf"),
    )
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return (
        per_doc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "id",
            F.col("n_matched").cast("long").alias("n_matched"),
            F.col("total_tf").cast("long").alias("total_tf"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def bm25_topk_batch(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents per query for a WHOLE RELATION of queries —
    the scale path when retrieval is a workload, not an ad-hoc call
    (attribution sweeps, eval-set retrieval, dataset search APIs).

    ``queries`` is (query_id, terms array<string>). Plan shape:

    1. the distinct term vocabulary of all queries is a small relation —
       it broadcasts into a semi join that prunes the postings build
       (same filter-before-aggregate discipline as the single-query
       form, generalized: cost ∝ Σ df over the union of query terms);
    2. postings ⋈ exploded query terms (broadcast — the query relation
       is the small side by definition) fans each posting out to the
       queries containing its term;
    3. per-(query, doc) score sum, then one row_number window
       partitioned BY QUERY — top-k state never concentrates on a
       single partition, unlike the single-query global window.

    Scores follow the same Robertson/Sparck-Jones BM25 as
    :func:`bm25_topk`; output is (query_id, id, n_matched, total_tf,
    rnk)."""
    qterms = queries.select(
        F.col("query_id"), F.explode("terms").alias("term")
    ).distinct()
    vocab = qterms.select("term").distinct()
    # vocabulary semi join applies BEFORE the postings aggregate — the
    # shuffle never carries non-query terms
    post = term_postings(df, id_col, text_col, terms_df=vocab)
    # dfreq via window — same single-consumption rationale as bm25_topk:
    # the vocabulary-restricted postings shuffle once on term instead of
    # the aggregate+join form re-running the corpus explode
    post = post.withColumn(
        "dfreq", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    dl = doc_lengths(df, id_col, text_col)
    scored = (
        post.join(F.broadcast(qterms), "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(_corpus_stats(dl)))
        .withColumn(
            "term_score",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
                / (F.col("dfreq") + F.lit(0.5))
            )
            * (F.col("tf") * (F.lit(k1) + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    per = scored.groupBy("query_id", "id").agg(
        F.sum("term_score").alias("score"),
        F.count(F.lit(1)).alias("n_matched"),
        F.sum("tf").alias("total_tf"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    return (
        per.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "id",
            F.col("n_matched").cast("long").alias("n_matched"),
            F.col("total_tf").cast("long").alias("total_tf"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def rrf_fuse(
    rankings: list[tuple[str, DataFrame]],
    k: int = 10,
    k_rrf: int = 60,
    by: str | None = "query_id",
    id_col: str = "id",
    rank_col: str = "rnk",
) -> DataFrame:
    """Reciprocal-rank fusion of N per-system rankings — the standard
    hybrid-retrieval combiner (lexical BM25 + embedding ANN is the
    canonical pair): fused score = Σ_systems 1 / (k_rrf + rank), which
    rewards documents that rank well ANYWHERE without ever comparing the
    systems' incommensurable raw scores (Cormack et al.'s RRF).

    ``rankings`` is ``[(system_name, df), ...]`` where each df carries
    ``id_col`` and a 1-based ``rank_col`` (and ``by``, the query key,
    unless ``by=None`` — the single-query case). Output: the ``by`` key
    (if any), ``id_col``, ``n_systems`` (how many rankings contained the
    doc — the agreement evidence), and ``rrf_rank`` (1-based, ties on
    the 6-dp-rounded fused score break on the lower id so the fusion is
    deterministic and hash-comparable).

    Scale shape: the inputs are top-k relations — k·|queries| rows by
    construction, NEVER corpus-sized — so the fusion costs one union +
    one grouped partial-agg + one per-query window over at most
    N_systems·k rows per query. At 100 TB the expense lives in the
    upstream retrieval operators; fusing is free.
    """
    if not rankings:
        raise ValueError("rrf_fuse requires at least one (name, ranking) pair")
    if k_rrf <= 0:
        raise ValueError(f"k_rrf must be positive, got {k_rrf}")
    keys = ([by] if by else []) + [id_col]
    labeled = None
    for name, df in rankings:
        missing = [c for c in keys + [rank_col] if c not in df.columns]
        if missing:
            raise ValueError(f"ranking {name!r} lacks column(s) {missing}")
        part = df.select(*keys, F.col(rank_col).alias("_r"))
        labeled = part if labeled is None else labeled.unionByName(part)
    fused = labeled.groupBy(*keys).agg(
        F.round(F.sum(F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("_r"))), 6).alias(
            "_s"
        ),
        F.count(F.lit(1)).cast("long").alias("n_systems"),
    )
    w = (Window.partitionBy(by) if by else Window.partitionBy()).orderBy(
        F.desc("_s"), F.asc(id_col)
    )
    return (
        fused.withColumn("rrf_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rrf_rank") <= k)
        .drop("_s")
    )
