"""The ONE word-tokenization definition shared by every text operator.

decontamination, LM fluency scoring, BM25 retrieval, and BPE accounting
compose inside the same curation pipeline — they MUST tokenize
identically or the stages silently desynchronize (a doc the
decontaminator sees as n-grams the LM scorer must see as the same token
stream). Central definition; the consumers import from here.

``tokens_of`` must be staged as its OWN projection alias before any
higher-order function references it element-wise — see the
re-evaluation note in SCALING.md ("Generator (explode) pitfalls").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z]+"


def tokens_of(col: Column) -> Column:
    """Lowercased word tokens of a text column as array<string>;
    empty array (never null) for null text."""
    return F.coalesce(
        F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda t: t != ""),
        F.array().cast("array<string>"),
    )
