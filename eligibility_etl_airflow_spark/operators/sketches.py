"""Count-Min-sketch heavy hitters — approximate frequent-item detection
when the key cardinality is too large to group exactly.

The sketch is built by Spark's ``count_min_sketch`` AGGREGATE: each
partition folds its rows into a local (depth × width) counter grid and
the grids merge associatively — one scan, no shuffle of items, and the
driver receives only the merged grid, whose size is set by the error
parameters (≈ 2/eps counters × ln(1/(1−confidence)) rows), never by
data. Candidate items come from a seeded Bernoulli sample sized so any
item above the share threshold appears with overwhelming probability
(an item with share s is missing from m sampled rows with probability
(1−s)^m ≤ e^(−s·m); m = 50/s makes that e^−50). Candidates are then
scored against the sketch, which never under-counts and over-counts by
at most eps·N with the configured confidence.

This is the 100 TB shape for "top domains / hottest keys" questions:
exact ``topk_frequency`` pays a full groupBy shuffle over every
distinct key; the sketch pays one map-side pass plus a bounded sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_min(
    df: DataFrame,
    col: str,
    eps: float = 1e-4,
    confidence: float = 0.99,
    seed: int = 42,
):
    """Build a merged Count-Min sketch of ``col`` (hashed as STRING —
    a fixed representation so build and estimate can never disagree on
    numeric widths). Returns the JVM ``CountMinSketch``; driver memory
    is parameter-bounded."""
    row = df.select(F.col(col).cast("string").alias("__v")).agg(
        F.count_min_sketch(
            F.col("__v"), F.lit(float(eps)), F.lit(float(confidence)), F.lit(seed)
        ).alias("s")
    ).head()
    payload = bytes(row["s"])
    # classic-mode only: deserialization uses the in-process JVM bridge
    # (the aggregate itself is Connect-compatible, the py4j decode is not)
    jvm = getattr(df.sparkSession, "_jvm", None)
    if jvm is None:
        raise NotImplementedError(
            "count_min sketch decode needs a classic (non-Connect) session: "
            "no in-process JVM bridge available"
        )
    stream = jvm.java.io.ByteArrayInputStream(payload)
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(stream)


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_share: float = 0.01,
    eps: float = 1e-4,
    confidence: float = 0.99,
    seed: int = 42,
    candidate_cap: int = 100_000,
) -> DataFrame:
    """Items of ``col`` whose frequency is ≥ ``min_share`` of rows, with
    Count-Min estimated counts: ``(value, est_count, est_share)``,
    highest first. Never misses a true heavy hitter (the sketch never
    under-counts; the sample misses a ≥min_share item with probability
    ≤ e^−50); may include items within eps·N below the threshold.

    ``candidate_cap`` bounds the driver's candidate set with a clear
    error rather than silent truncation (truncation could drop a real
    heavy hitter)."""
    if not 0 < min_share < 1:
        raise ValueError(f"min_share must be in (0,1), got {min_share}")
    spark = df.sparkSession
    vals = df.select(F.col(col).cast("string").alias("__v"))
    # two scans total: the sketch pass (whose totalCount doubles as the
    # non-null row count — no separate count() scan) and the candidate
    # sample. Shares are relative to NON-NULL values, matching the
    # candidate set, which also skips nulls.
    cms = count_min(vals, "__v", eps=eps, confidence=confidence, seed=seed)
    n = int(cms.totalCount())
    if n == 0:
        return spark.createDataFrame([], "value string, est_count long, est_share double")

    m = int(50 / min_share)
    frac = min(1.0, 1.5 * m / n)
    cand_rows = (
        vals.sample(withReplacement=False, fraction=frac, seed=seed)
        .distinct()
        .limit(candidate_cap + 1)
        .collect()
    )
    if len(cand_rows) > candidate_cap:
        raise ValueError(
            f"more than candidate_cap={candidate_cap} distinct sampled values; "
            "raise the cap or min_share (a truncated candidate set could "
            "silently drop a heavy hitter)"
        )
    thresh = min_share * n
    hits = []
    for r in cand_rows:
        v = r["__v"]
        if v is None:
            continue
        est = cms.estimateCount(v)
        if est >= thresh:
            hits.append((v, int(est), round(est / n, 6)))
    hits.sort(key=lambda t: (-t[1], t[0]))
    return spark.createDataFrame(
        hits, "value string, est_count long, est_share double"
    )
