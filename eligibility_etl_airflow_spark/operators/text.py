"""Text-analysis operators for LLM training-data pipelines.

Beyond-reference surface (BASELINE.json north star): language ID, quality
scoring, token counting, document fingerprinting — all as built-in column
expressions (JVM-side, whole-stage codegen). Nothing here touches Python
per row; at 100 TB these run at parquet-scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
# the standard GPT-2-style segmentation shape, minus unicode categories.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")

# Marker function-words per language for the n-gram/marker heuristic.
# Deterministic and domain-agnostic; real deployments would swap in a
# char-trigram profile table built the same columnar way.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "was"),
    "de": ("der", "die", "und", "ist", "das"),
    "es": ("el", "la", "que", "los", "es"),
    "fr": ("le", "la", "les", "est", "une"),
    "zh": ("de", "shi", "le", "zai", "he"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization, empty-safe."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col)).cast("long")


def token_count_bpe(col: Column) -> Column:
    """BPE-ish token count via the pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), F.lit(0))).cast("long")


def word_occurrences(col: Column, word: str) -> Column:
    """Whole-word occurrence count (used by marker scoring)."""
    return F.size(F.regexp_extract_all(col, F.lit(rf"\b{word}\b"), F.lit(0))).cast("long")


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(r"[^\w\s]"), F.lit(0))).cast("long")


def stopword_count(col: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    pattern = r"\b(" + "|".join(stopwords) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern), F.lit(0))).cast("long")


def quality_score(col: Column) -> Column:
    """Composite document-quality score in [0,1]: length band, low
    punctuation density, healthy stopword ratio, sane mean word length —
    the length/punct/stopword-ratio family of heuristic filters used for
    pretraining corpus cleaning (C4/Gopher-style rules)."""
    n_tok = token_count_ws(col).cast("double")
    n_chars = F.length(col).cast("double")
    punct_ratio = punct_count(col).cast("double") / F.greatest(n_chars, F.lit(1.0))
    stop_ratio = stopword_count(col).cast("double") / F.greatest(n_tok, F.lit(1.0))
    mean_word_len = n_chars / F.greatest(n_tok, F.lit(1.0))
    length_ok = F.when((n_tok >= 5) & (n_tok <= 100000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    stop_ok = F.when(stop_ratio >= 0.01, 1.0).otherwise(0.0)
    word_len_ok = F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0).otherwise(0.0)
    return F.round((length_ok + punct_ok + stop_ok + word_len_ok) / 4.0, 4)


def lang_scores(col: Column) -> dict[str, Column]:
    """Marker-word hit count per candidate language."""
    lowered = F.lower(col)
    out: dict[str, Column] = {}
    for lang, markers in LANG_MARKERS.items():
        pattern = r"\b(" + "|".join(markers) + r")\b"
        out[lang] = F.size(F.regexp_extract_all(lowered, F.lit(pattern), F.lit(0))).cast("long")
    return out


def lang_id(col: Column) -> Column:
    """Argmax language with deterministic tie-break (alphabetical wins on
    equal score; 'und' when nothing matches)."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # build reversed so earlier (alphabetical) langs win ties
    for lang in sorted(scores, reverse=True):
        result = F.when(scores[lang] == best, lang).otherwise(result)
    return F.when(best == 0, "und").otherwise(result)


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprint/dedup: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint_md5(col: Column) -> Column:
    """Content fingerprint = md5 of the normalized text."""
    return F.md5(normalize_text(col))


def fingerprint_prefix64(col: Column) -> Column:
    """First 16 hex chars of the md5 — a 64-bit fingerprint as text
    (kept as hex so engines with different int64 signedness agree)."""
    return F.substring(fingerprint_md5(col), 1, 16)


def unicode_nfc(col: Column) -> Column:
    """Unicode NFC normalization — the corpus-hygiene step that folds
    decomposed sequences (e + U+0301) into their composed form (U+00E9)
    so that visually-identical text hashes identically downstream
    (exact dedup, fingerprints, shingles all assume one byte form per
    string).

    The one deliberate exception to this module's no-Python rule: Spark
    has no built-in NFC/NFKC expression, so this is an Arrow-batched
    pandas UDF over ``pandas.Series.str.normalize`` (vectorized ICU-free
    stdlib path, never per-row Python). Map-only — composes into any
    scan stage with no shuffle; nulls propagate."""
    # pandas imported here (not module-top) to keep the module importable
    # without a Python-worker dependency; the type hints must therefore be
    # plain strings resolvable without the local import — pandas_udf under
    # ``from __future__ import annotations`` resolves hints against module
    # globals, so the hint is attached post-hoc as a real object.
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _nfc_fn(s):
        return s.str.normalize("NFC")

    _nfc_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _nfc = pandas_udf(_nfc_fn, "string")
    return _nfc(col)
