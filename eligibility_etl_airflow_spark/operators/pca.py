"""PCA whitening for embedding columns — decorrelate and variance-scale
an ``array<float>`` embedding relation ahead of ANN indexing, semantic
dedup, or drift monitoring (whitened space makes cosine/Euclidean
thresholds comparable across corpora; PQ codebooks in particular train
markedly better on decorrelated inputs — the public OPQ observation).

Distributed shape (the tree-aggregate pattern): fitting needs only the
d-dim mean and the d×d covariance, both sums — ONE ``mapInPandas`` pass
emits per-batch partial moments (count, Σx, Σxxᵀ flattened), Spark's
partial aggregation combines them, and the driver receives exactly
d² + d + 1 numbers regardless of corpus size (d=64 → 4 KB from 100 TB).
The eigendecomposition is a driver-side O(d³) numpy ``eigh`` on that
bounded matrix — never distributed work. Projection back over the corpus
is one Arrow-batched matmul per batch (map-only, composes into the scan
stage).

Determinism: moments are exact sums of float64; ``eigh`` on the same
matrix is deterministic; eigenvector sign is pinned (largest-|component|
coordinate made positive) so the learned basis is unique. Partition
layout only permutes the order of float64 additions — a ~1e-12 relative
wobble the roundings below absorb.

No reference counterpart (the reference has no embedding tier); this
implements the textbook PCA-whitening transform (e.g. Jégou et al.'s
ANN preprocessing) Spark-first.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PcaModel:
    """Fitted whitening transform: y = (x - mean) @ components.T, where
    ``components[i] = eigvec_i / sqrt(eigval_i + eps)`` for the top-k
    eigenpairs (descending eigenvalue)."""

    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) — rows are scaled eigenvectors
    eigvals: np.ndarray  # (k,) descending
    n: int
    total_var: float  # trace of the FULL covariance (all d eigenvalues)

    @property
    def explained_share(self) -> float:
        """Fraction of total variance the retained basis carries,
        in [0, 1] — the 'keep k while share < X' knob."""
        return float(self.eigvals.sum() / self.total_var) if self.total_var else 1.0

    @property
    def dim(self) -> int:
        return int(self.mean.shape[0])

    @property
    def k(self) -> int:
        return int(self.components.shape[0])


def fit_pca(
    df: DataFrame,
    vec_col: str,
    k: int,
    eps: float = 1e-6,
) -> PcaModel:
    """Fit PCA whitening on an embedding relation. One distributed pass
    (mapInPandas partial moments → d²+d+1 scalars to the driver), one
    driver-side ``eigh``. Null vectors are skipped; a dimension mismatch
    inside a batch raises (embeddings must be fixed-width)."""
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def moments(batches):
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None and len(v) > 0]
            if not vecs:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            # one flat moment vector: [n] ++ Σx ++ Σxxᵀ — a single
            # posexplode+sum aggregates it element-wise downstream (4k+1
            # ROWS per batch, not 4k aggregate EXPRESSIONS, which would
            # blow up codegen/compile time at d=64)
            m = np.concatenate(
                ([float(x.shape[0])], x.sum(axis=0), (x.T @ x).ravel())
            )
            yield pd.DataFrame({"d": [int(x.shape[1])], "m": [m.tolist()]})

    # spread a narrow scan before the O(n·d²) Python moment pass — a
    # single small parquet file otherwise runs it as ONE task (see
    # operators/parallel.py; no-op on production-scale scans)
    from eligibility_etl_airflow_spark.operators.parallel import ensure_parallelism

    parts = ensure_parallelism(df.select(vec_col)).mapInPandas(
        moments, "d int, m array<double>"
    )
    rows = (
        parts.select("d", F.posexplode("m").alias("i", "v"))
        .groupBy("d", "i")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    if not rows:
        raise ValueError("fit_pca: no non-null vectors in input")
    dims = sorted({r["d"] for r in rows})
    if len(dims) > 1:
        raise ValueError(f"fit_pca: mixed embedding widths {dims}")
    d = dims[0]
    if k > d:
        raise ValueError(f"k={k} exceeds embedding dim {d}")
    flat = np.zeros(1 + d + d * d)
    for r in rows:
        flat[r["i"]] = r["v"]
    n = int(round(flat[0]))
    s = flat[1 : 1 + d]
    ss = flat[1 + d :].reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    evals_k = np.maximum(evals[order], 0.0)
    v = evecs[:, order].T  # (k, d)
    # pin sign: make each eigenvector's largest-|coordinate| positive
    signs = np.sign(v[np.arange(k), np.argmax(np.abs(v), axis=1)])
    signs[signs == 0] = 1.0
    v = v * signs[:, None]
    comps = v / np.sqrt(evals_k + eps)[:, None]
    return PcaModel(
        mean=mean,
        components=comps,
        eigvals=evals_k,
        n=n,
        total_var=float(np.trace(cov)),
    )



def pca_transform(model: PcaModel, vec: Column) -> Column:
    """Whitened projection y = (x - mean) @ components.T as an
    ``array<double>`` column — one Arrow-batched numpy matmul per batch
    (the model is a few KB, shipped in the UDF closure; map-only, no
    shuffle). Null or wrong-width vectors project to NULL."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    mean = model.mean
    comps_t = model.components.T  # (d, k)
    d = model.dim

    def _proj_fn(s):
        vals = s.tolist()
        ok = [i for i, v in enumerate(vals) if v is not None and len(v) == d]
        out = [None] * len(vals)
        if ok:
            x = np.asarray([vals[i] for i in ok], dtype=np.float64)
            y = (x - mean) @ comps_t  # ONE matmul per Arrow batch
            for j, i in enumerate(ok):
                out[i] = y[j].tolist()
        return pd.Series(out)

    _proj_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_proj_fn, "array<double>")(vec)
