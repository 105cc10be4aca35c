"""Document chunking — split long documents into fixed-size overlapping
token windows, the step between corpus curation and tokenization.

Every downstream consumer (embedding models, context-window-bounded
training, RAG indexing) wants bounded chunks with provenance; the
engine's other corpus operators (packing, ANN, dedup) then run on the
chunk table. Shape: pure JVM higher-order functions build the chunk
array per row (no Python, no shuffle), ``posexplode`` expands inside
the scan stage. At 100 TB this is a narrow map whose output is at most
``1/(1 − overlap/chunk_tokens)`` × the input text volume — the overlap
factor is the only amplification, and it is chosen, not emergent.

Tokens here are whitespace-split words of the ORIGINAL text (chunking
must preserve content byte-for-byte up to whitespace folding — the
lowercased ``[^a-z]+`` convention of the analysis operators would
destroy the text it is supposed to carry).

Window math, for T tokens, chunk size C, stride S = C − overlap:
``n_chunks = 1 + ceil(max(0, T − C) / S)`` — one window, plus one per
stride needed to bring the window's end past T. The final window may be
shorter than C but is always longer than the overlap (else it would be
wholly contained in its predecessor). Empty/null docs produce zero
chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_token_windows(
    tokens: list[str], chunk_tokens: int, overlap: int
) -> list[list[str]]:
    """Pure-Python reference model of the operator's window math — the
    hypothesis-tested core (tests/test_properties.py) that the Spark
    expression in :func:`chunk_documents` must agree with
    (tests/test_chunking.py bridges the two on sampled docs)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got overlap={overlap}, "
            f"chunk_tokens={chunk_tokens}"
        )
    if not tokens:
        return []
    stride = chunk_tokens - overlap
    extra = max(0, len(tokens) - chunk_tokens)
    n_extra = (extra + stride - 1) // stride
    return [
        tokens[i * stride : i * stride + chunk_tokens] for i in range(n_extra + 1)
    ]


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_chunk_tokens) — overlapping token
    windows over ``text_col``. ``chunk_idx`` is 0-based and dense per
    document."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got overlap={overlap}, "
            f"chunk_tokens={chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n_extra = F.ceil(
        F.greatest(F.size("_toks") - chunk_tokens, F.lit(0)) / F.lit(stride)
    ).cast("int")
    # Spark's sequence(0, -1) counts DOWN — guard the empty-doc case
    # explicitly rather than relying on an empty range
    chunks = F.when(F.size("_toks") > 0, F.transform(
        F.sequence(F.lit(0), n_extra),
        lambda i: F.array_join(
            F.slice("_toks", i * stride + 1, chunk_tokens), " "
        ),
    )).otherwise(F.array())
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .select(id_col, F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            "chunk_text",
            (F.size(F.split("chunk_text", " ")))
            .cast("long")
            .alias("n_chunk_tokens"),
        )
    )
