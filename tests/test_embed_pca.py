"""Distributed embedding moments / PCA (llm.embed) vs numpy."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from arctic_spark.llm import embed


def _df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    # anisotropic: two dominant directions
    base = rng.normal(size=(400, 6)) * np.array([5, 3, 1, 0.5, 0.2, 0.1])
    R = np.linalg.qr(rng.normal(size=(6, 6)))[0]
    return base @ R + rng.normal(size=6)


def test_moments_match_numpy(spark, data):
    n, mean, cov = embed.embedding_moments(_df(spark, data))
    assert n == 400
    np.testing.assert_allclose(mean, data.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(cov, np.cov(data, rowvar=False), atol=1e-9)


def test_moments_skip_bad_rows(spark, data):
    df = _df(spark, data)
    bad = spark.createDataFrame(
        [(9000, None), (9001, [1.0, 2.0])],
        "vec_id long, embedding array<double>")
    n, mean, _ = embed.embedding_moments(df.unionByName(bad), dim=6)
    assert n == 400
    np.testing.assert_allclose(mean, data.mean(axis=0), atol=1e-9)


def test_pca_matches_numpy(spark, data):
    mean, comps, vals, ratio = embed.pca(_df(spark, data), k=3)
    cov = np.cov(data, rowvar=False)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:3]
    np.testing.assert_allclose(vals, w[order], rtol=1e-9)
    for i, col in enumerate(order):
        ref = v[:, col]
        j = int(np.argmax(np.abs(ref)))
        if ref[j] < 0:
            ref = -ref
        np.testing.assert_allclose(comps[i], ref, atol=1e-9)
    assert ratio[0] > ratio[1] > ratio[2] > 0
    assert np.all(np.isclose([np.linalg.norm(c) for c in comps], 1.0))


def test_project_native_and_correct(spark, data):
    df = _df(spark, data)
    mean, comps, vals, _ = embed.pca(df, k=2)
    out = embed.project(df, mean, comps, method="native")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # literals + HOFs only
    rows = out.select("vec_id", "pc").collect()
    want = (data - mean) @ np.asarray(comps).T
    for r in rows:
        np.testing.assert_allclose(r["pc"], want[r["vec_id"]], atol=1e-9)
    # score variance along pc1 equals the top eigenvalue
    scores = np.array([r["pc"][0] for r in rows])
    assert np.var(scores, ddof=1) == pytest.approx(vals[0], rel=1e-9)


def test_project_arrow_matches_native(spark, data):
    # default (arrow gemm) path: one vectorized pandas UDF, values
    # equal to the native literal-expression path to float noise
    df = _df(spark, data)
    mean, comps, _, _ = embed.pca(df, k=3)
    got = {r["vec_id"]: r["pc"]
           for r in embed.project(df, mean, comps).collect()}
    ref = {r["vec_id"]: r["pc"]
           for r in embed.project(df, mean, comps,
                                  method="native").collect()}
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=1e-9)


def test_full_rank_projection_preserves_norms(spark, data):
    df = _df(spark, data)
    mean, comps, _, ratio = embed.pca(df, k=6)
    rows = embed.project(df, mean, comps).collect()
    for r in rows[:50]:
        got = np.linalg.norm(r["pc"])
        want = np.linalg.norm(data[r["vec_id"]] - mean)
        assert got == pytest.approx(want, abs=1e-9)
    assert sum(ratio) == pytest.approx(1.0, abs=1e-9)


def test_dimension_stats_exact(spark, data):
    df = _df(spark, data)
    rows = embed.dimension_stats(df).collect()
    assert len(rows) == 6
    Xr = np.round(data, 6)
    for r in rows:
        j = r["dim"] - 1
        assert r["n"] == 400
        assert r["mean"] == pytest.approx(Xr[:, j].mean(), abs=1e-9)
        assert r["var"] == pytest.approx(Xr[:, j].var(ddof=1), abs=1e-9)


def test_dimension_stats_partition_invariant(spark, data):
    df = _df(spark, data)
    a = sorted(map(tuple, embed.dimension_stats(df).collect()))
    b = sorted(map(tuple,
                   embed.dimension_stats(df.repartition(7)).collect()))
    assert a == b  # exact decimal sums: bit-identical
