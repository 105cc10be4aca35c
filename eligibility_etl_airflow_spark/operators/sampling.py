"""Domain-mix resampling — draw a corpus whose stratum proportions match
a target mix (the "data mixture" step of training-data curation: e.g.
30% code, 50% web, 20% books, whatever the recipe says).

Scale shape: one count aggregate (rows per stratum — driver receives one
scalar per stratum, bounded by the mix's cardinality, never by data),
then a seeded per-stratum Bernoulli ``sampleBy`` — a map-only filter
over the scan, no shuffle. The expensive part of resampling at 100 TB is
the scan itself; this adds nothing to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resample_to_mix(
    df: DataFrame,
    stratum_col: str,
    target_mix: dict[str, float],
    total_rows: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Sample ``df`` so the expected stratum proportions equal
    ``target_mix`` (shares; must sum to ~1). Strata absent from the mix
    are dropped — a mix is a whitelist.

    The achievable corpus size is limited by the scarcest stratum:
    ``feasible = min(count_s / share_s)``. ``total_rows`` caps the draw
    below that; asking for more than feasible silently clamps (the
    alternative — upsampling scarce strata — means duplicating rows,
    which is a different operator with different training implications).

    Sampling is Bernoulli per stratum (``sampleBy``): proportions hold
    in expectation with O(1/√n) noise, the price of a single-pass,
    shuffle-free draw. Deterministic for a fixed seed + partitioning of
    the source (columnar scans of the same files are stable).
    """
    shares = {k: v for k, v in target_mix.items() if v > 0}
    ssum = sum(shares.values())
    if not shares or abs(ssum - 1.0) > 1e-6:
        raise ValueError(f"target_mix shares must sum to 1, got {ssum}")

    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    missing = [s for s in shares if counts.get(s, 0) == 0]
    if missing:
        raise ValueError(f"target_mix strata absent from data: {missing}")

    feasible = min(counts[s] / share for s, share in shares.items())
    total = min(total_rows, feasible) if total_rows is not None else feasible
    fractions = {
        s: min(1.0, (total * share) / counts[s]) for s, share in shares.items()
    }
    return df.sampleBy(stratum_col, fractions, seed)
