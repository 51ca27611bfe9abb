"""Power-iteration top component + all-but-the-top debias, pinned
against numpy's exact eigendecomposition."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.linalg import (
    power_iteration_top_component,
    remove_top_component,
)


def _emb(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )


def _np_top(mat):
    x = np.asarray(mat, dtype=float)
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc
    vals, vecs = np.linalg.eigh(cov)
    v = vecs[:, -1]
    amax = np.argmax(np.abs(v))
    if v[amax] < 0:
        v = -v
    return v, np.sqrt(vals[-1])


@pytest.fixture(scope="module")
def mat():
    rng = np.random.RandomState(7)
    # strong first component + noise so 8 iterations converge
    direction = rng.randn(6)
    coeffs = rng.randn(40, 1) * 5.0
    return coeffs @ direction[None, :] + rng.randn(40, 6) * 0.1


class TestPowerIteration:
    def test_matches_numpy_eigenvector(self, spark, mat):
        got = power_iteration_top_component(
            _emb(spark, mat), dims=6, iterations=8
        ).collect()
        v_np, _ = _np_top(mat)
        v_got = np.array(
            [r.loading for r in sorted(got, key=lambda r: r.dim)]
        )
        assert np.allclose(v_got, v_np, atol=1e-5)

    def test_eigenvalue_estimate(self, spark, mat):
        got = power_iteration_top_component(
            _emb(spark, mat), dims=6, iterations=8
        ).collect()
        _, lam_np = _np_top(mat)
        # the estimate is ||X^T X v|| -> lambda_1 * ||v|| = lambda_1^2
        # of the singular value sense; compare against cov's top
        # eigenvalue directly
        assert got[0].eigenvalue == pytest.approx(lam_np**2, rel=1e-3)

    def test_sign_canonical(self, spark, mat):
        got = power_iteration_top_component(
            _emb(spark, mat), dims=6, iterations=8
        ).collect()
        v = [r.loading for r in sorted(got, key=lambda r: r.dim)]
        amax = int(np.argmax(np.abs(v)))
        assert v[amax] > 0

    def test_remove_top_component_kills_projection(self, spark, mat):
        df = _emb(spark, mat)
        comp = power_iteration_top_component(df, dims=6, iterations=8)
        debiased = remove_top_component(df, comp)
        v = np.array(
            [
                r.loading
                for r in sorted(comp.collect(), key=lambda r: r.dim)
            ]
        )
        rows = debiased.collect()
        for r in rows:
            assert abs(np.dot(np.array(r.embedding), v)) < 1e-6
        # and the other directions are untouched: norms shrink, not zero
        assert any(np.linalg.norm(r.embedding) > 1e-3 for r in rows)


class TestGramPCA:
    def test_components_match_numpy_eigh(self, spark, mat):
        from fred_economic_data_pipeline_local_spark.operators.linalg import (
            gram_pca_components,
        )

        comps = gram_pca_components(_emb(spark, mat), dims=6, k=2)
        rows = sorted(comps.collect(), key=lambda r: r["dim"])
        got1 = np.array([r["c1"] for r in rows])
        got2 = np.array([r["c2"] for r in rows])
        x = np.asarray(mat, dtype=float)
        # center with the SAME 8-dp rounded mean the operator uses
        xc = x - np.round(x.mean(axis=0), 8)
        vals, vecs = np.linalg.eigh(xc.T @ xc)
        for got, j in ((got1, -1), (got2, -2)):
            v = vecs[:, j]
            amax = np.lexsort((np.arange(6), -np.abs(v)))[0]
            if v[amax] < 0:
                v = -v
            assert np.allclose(got, v, atol=1e-6)
        eig1 = rows[0]["eig1"]
        assert abs(eig1 - vals[-1]) < 1e-2

    def test_components_orthonormal(self, spark, mat):
        from fred_economic_data_pipeline_local_spark.operators.linalg import (
            gram_pca_components,
        )

        rows = sorted(
            gram_pca_components(_emb(spark, mat), dims=6, k=2).collect(),
            key=lambda r: r["dim"],
        )
        c1 = np.array([r["c1"] for r in rows])
        c2 = np.array([r["c2"] for r in rows])
        assert abs(c1 @ c1 - 1.0) < 1e-6
        assert abs(c2 @ c2 - 1.0) < 1e-6
        assert abs(c1 @ c2) < 1e-6

    def test_top_component_agrees_with_power_iteration(self, spark, mat):
        from fred_economic_data_pipeline_local_spark.operators.linalg import (
            gram_pca_components,
        )

        pi = {
            r["dim"]: r["loading"]
            for r in power_iteration_top_component(
                _emb(spark, mat), dims=6, iterations=30
            ).collect()
        }
        rows = gram_pca_components(_emb(spark, mat), dims=6, k=1).collect()
        for r in rows:
            assert abs(abs(r["c1"]) - abs(pi[r["dim"]])) < 1e-4

    def test_projection_matches_numpy(self, spark, mat):
        from fred_economic_data_pipeline_local_spark.operators.linalg import (
            gram_pca_components,
            project_onto_components,
        )

        emb = _emb(spark, mat)
        comps = gram_pca_components(emb, dims=6, k=2)
        out = {
            r["vec_id"]: (r["p1"], r["p2"])
            for r in project_onto_components(emb, comps, k=2).collect()
        }
        rows = sorted(comps.collect(), key=lambda r: r["dim"])
        m = np.array([r["m"] for r in rows])
        c1 = np.array([r["c1"] for r in rows])
        c2 = np.array([r["c2"] for r in rows])
        x = np.asarray(mat, dtype=float)
        exp = (x - m) @ np.vstack([c1, c2]).T
        for i in range(len(mat)):
            assert abs(out[i][0] - round(exp[i, 0], 6)) < 1e-9
            assert abs(out[i][1] - round(exp[i, 1], 6)) < 1e-9
