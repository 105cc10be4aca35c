"""PCA whitening: moment math, whitening invariants, layout stability."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators import pca


def _vecs_df(spark, x, parts=4):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(parts)


@pytest.fixture(scope="module")
def anisotropic(spark):
    # correlated 6-dim gaussian with wildly different scales — the case
    # whitening exists for
    rng = np.random.default_rng(7)
    base = rng.normal(size=(400, 6))
    mix = np.diag([10.0, 5.0, 2.0, 1.0, 0.5, 0.1])
    rot, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    x = base @ mix @ rot + np.array([3, -2, 0, 1, 5, -4])
    return x, _vecs_df(spark, x)


def test_fit_matches_numpy_moments(anisotropic):
    x, df = anisotropic
    m = pca.fit_pca(df, "embedding", k=6)
    assert m.n == 400 and m.dim == 6 and m.k == 6
    np.testing.assert_allclose(m.mean, x.mean(axis=0), rtol=1e-9)
    evals = np.linalg.eigh(np.cov(x.T, bias=True))[0][::-1]
    np.testing.assert_allclose(m.eigvals, evals, rtol=1e-7, atol=1e-9)
    # full basis retains everything; a truncated one retains a SHARE
    assert abs(m.explained_share - 1.0) < 1e-9
    m2 = pca.fit_pca(df, "embedding", k=2)
    want = evals[:2].sum() / evals.sum()
    assert abs(m2.explained_share - want) < 1e-9
    assert 0 < m2.explained_share < 1


def test_whitened_covariance_is_identity(anisotropic, spark):
    x, df = anisotropic
    m = pca.fit_pca(df, "embedding", k=4)
    proj = df.select(pca.pca_transform(m, F.col("embedding")).alias("y")).collect()
    y = np.asarray([r["y"] for r in proj])
    cov = np.cov(y.T, bias=True)
    # whitening: projected covariance ~ identity (eps-regularized)
    np.testing.assert_allclose(cov, np.eye(4), atol=1e-3)


def test_layout_invariance_and_sign_pinning(anisotropic, spark):
    x, _ = anisotropic
    a = pca.fit_pca(_vecs_df(spark, x, parts=2), "embedding", k=3)
    b = pca.fit_pca(_vecs_df(spark, x, parts=13), "embedding", k=3)
    np.testing.assert_allclose(a.components, b.components, rtol=1e-8, atol=1e-10)
    # sign pin: each component's largest-|coordinate| is positive
    for row in a.components:
        assert row[np.argmax(np.abs(row))] > 0


def test_null_and_width_guards(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    m = pca.fit_pca(df, "embedding", k=1)
    assert m.n == 2
    out = {
        r["vec_id"]: r["y"]
        for r in df.select(
            "vec_id", pca.pca_transform(m, F.col("embedding")).alias("y")
        ).collect()
    }
    assert out[2] is None and out[1] is not None
    with pytest.raises(ValueError, match="k=5 exceeds"):
        pca.fit_pca(df, "embedding", k=5)
    with pytest.raises(ValueError, match="k must be"):
        pca.fit_pca(df, "embedding", k=0)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no non-null"):
        pca.fit_pca(empty, "embedding", k=1)


def test_mixed_width_raises(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    # ragged widths fail loudly either way they land: same Arrow batch ->
    # numpy inhomogeneous-shape error; different batches -> the explicit
    # mixed-widths ValueError
    with pytest.raises(Exception, match="mixed|inhomogeneous|sequence"):
        pca.fit_pca(df, "embedding", k=1)
