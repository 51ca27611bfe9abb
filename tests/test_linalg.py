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
