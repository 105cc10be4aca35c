"""Contrastive training-pair mining — (anchor, positive, hard-negative)
triplets for embedding-model training, mined from the corpus itself.

The standard recipe (public E5/GTE/SimCSE-style data pipelines): a
POSITIVE is a near-duplicate that is not an exact duplicate (a
paraphrase/revision — same meaning, different surface), and a HARD
NEGATIVE is a document that collides lexically with the anchor yet is
NOT similar (shares vocabulary, differs in meaning) — far more
informative than a random negative, which a model separates trivially.

Both come out of ONE near-dup candidate pass: MinHash-LSH band
collisions with exact-Jaccard verification (operators/neardup.py).
Band-colliding pairs whose verified Jaccard lands in [pos_min, pos_max]
are positives; collisions at or below neg_max are exactly the
"lexically colliding, semantically distant" hard negatives. Per anchor,
the best positive (highest Jaccard) and the hardest negative (highest
Jaccard still ≤ neg_max — the closest non-match) are kept, with min-id
tie-breaks so the mined set is deterministic.

Scale shape: inherits the LSH tier's budget — shuffle-free Arrow
signatures, band-key shuffle with capped buckets, verify join on the
shared shingle relation; the triplet assembly on top is ONE
partial-aggregatable conditional max(struct) groupBy keyed by anchor
id, so the candidate pass is consumed exactly once. Nothing reaches
the driver. No reference counterpart — training-data extension of the
near-dup tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators import neardup


def contrastive_triplets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pos_min: float = 0.5,
    pos_max: float = 0.98,
    neg_max: float = 0.2,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Mine (anchor_id, positive_id, negative_id, pos_jaccard,
    neg_jaccard) triplets. Anchors lacking either a positive in
    [pos_min, pos_max] or a band-colliding hard negative ≤ neg_max
    among the LSH candidates emit nothing — contrastive mining is
    opportunistic by design (callers top up with random negatives,
    which need no mining). Pairs above pos_max are treated as exact-dup
    noise and used for neither side."""
    if not (0.0 <= neg_max < pos_min <= pos_max <= 1.0):
        raise ValueError(
            f"need 0 <= neg_max < pos_min <= pos_max <= 1, got "
            f"neg_max={neg_max}, pos_min={pos_min}, pos_max={pos_max}"
        )
    pairs = neardup.minhash_lsh_pairs(
        df,
        id_col,
        text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        # keep EVERY verified band collision: the low-Jaccard ones are
        # the hard negatives, not noise
        jaccard_threshold=0.0,
        max_bucket_size=max_bucket_size,
    )
    # symmetrize: every pair serves both ends as anchor. ONE pass via
    # explode, NOT a two-branch union (r10): the union form embedded the
    # whole LSH + verify lineage once per branch, and the Arrow-batched
    # bucket-expansion stage defeats exchange reuse (Python eval nodes
    # do not canonicalize equal), so candidate generation executed
    # twice — the stage profile showed the ~6 MB signature/bucket
    # shuffles written 4× per run. Same rows out, half the lineage.
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("anchor_id"),
                    F.col("id_b").alias("partner_id"),
                    F.col("jaccard"),
                ),
                F.struct(
                    F.col("id_b").alias("anchor_id"),
                    F.col("id_a").alias("partner_id"),
                    F.col("jaccard"),
                ),
            )
        ).alias("e")
    ).select("e.*")
    # Both sides come out of ONE conditional aggregation over the pair
    # stream (max(when(...)) is null-skipping), so the expensive LSH +
    # verify lineage is consumed exactly once — two groupBys + a join
    # here would execute the candidate pass twice (uncached lineage) and
    # pay a third shuffle for the join. Ties break to the greatest
    # partner id (struct ordering) — any fixed rule works, and this one
    # stays valid for string ids too. Anchors missing either side drop
    # at the final filter (the old inner join's semantics).
    pos_w = F.when(
        (F.col("jaccard") >= pos_min) & (F.col("jaccard") <= pos_max),
        F.struct("jaccard", "partner_id"),
    )
    neg_w = F.when(
        F.col("jaccard") <= neg_max, F.struct("jaccard", "partner_id")
    )
    return (
        sym.groupBy("anchor_id")
        .agg(F.max(pos_w).alias("p"), F.max(neg_w).alias("n"))
        .filter(F.col("p").isNotNull() & F.col("n").isNotNull())
        .select(
            "anchor_id",
            F.col("p.partner_id").alias("positive_id"),
            F.col("n.partner_id").alias("negative_id"),
            F.col("p.jaccard").alias("pos_jaccard"),
            F.col("n.jaccard").alias("neg_jaccard"),
        )
    )
