"""LOBPCG / sparse-graph / RBF-SoR / criticism / checkpoint tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flgp_tpu.models import criticism, rbf
from flgp_tpu.ops.distance import sqdist
from flgp_tpu.ops.knn import knn
from flgp_tpu.ops.lobpcg import lobpcg_standard
from flgp_tpu.ops.sparse_graph import glgp_operator, symmetrize_knn


class TestLobpcg:
    def test_matches_eigh(self, rng):
        n, k = 120, 6
        A = rng.normal(size=(n, n))
        M = jnp.asarray(A @ A.T / n + np.diag(np.linspace(1, 3, n)))
        res = lobpcg_standard(lambda x: M @ x, jnp.asarray(rng.normal(size=(n, k))), iters=80)
        w_np = np.sort(np.linalg.eigvalsh(np.asarray(M)))[::-1][:k]
        np.testing.assert_allclose(np.asarray(res.eigenvalues), w_np, rtol=1e-6)
        # eigenvector residuals small
        assert float(jnp.max(res.residual_norms)) < 1e-3


class TestSparseGraph:
    def test_symmetrize_matches_dense(self, rng):
        n, r = 50, 4
        X = jnp.asarray(rng.normal(size=(n, 3)))
        res = knn(X, X, r)
        vals = jnp.exp(-res.sqdists)
        sym = symmetrize_knn(res.indices, vals, n)
        D = np.zeros((n, n))
        idx = np.asarray(res.indices)
        v = np.asarray(vals)
        for i in range(n):
            for j in range(r):
                D[i, idx[i, j]] += v[i, j]
        D = (D + D.T) / 2
        x = rng.normal(size=(n,))
        np.testing.assert_allclose(np.asarray(sym.matvec(jnp.asarray(x))), D @ x, atol=1e-10)

    def test_glgp_operator_spectrum(self, rng):
        """W = D_A^{-1/2} A D_A^{-1/2} must match the dense construction of
        src/Fit.cpp:417-423 and have top eigenvalue ≈ 1."""
        n, r = 60, 5
        X = jnp.asarray(rng.normal(size=(n, 2)))
        res = knn(X, X, r)
        vals = jnp.exp(-res.sqdists / 2.0)
        sym = symmetrize_knn(res.indices, vals, n)
        W, sqrt_da_inv = glgp_operator(sym)

        D = np.zeros((n, n))
        idx = np.asarray(res.indices)
        v = np.asarray(vals)
        for i in range(n):
            for j in range(r):
                D[i, idx[i, j]] += v[i, j]
        D = (D + D.T) / 2
        rs = D.sum(1) + 1e-9
        A = D / rs[:, None] / rs[None, :]
        da = A.sum(1) + 1e-9
        Wd = A / np.sqrt(da)[:, None] / np.sqrt(da)[None, :]
        x = rng.normal(size=(n,))
        np.testing.assert_allclose(np.asarray(W.matvec(jnp.asarray(x))), Wd @ x, atol=1e-8)

        ev = lobpcg_standard(lambda z: W.matvec(z), jnp.asarray(rng.normal(size=(n, 4))), iters=60)
        w_np = np.sort(np.linalg.eigvalsh(Wd))[::-1][:4]
        np.testing.assert_allclose(np.asarray(ev.eigenvalues), w_np, atol=1e-5)


class TestGlLobpcgPath:
    def test_spectrum_matches_dense(self, rng, key):
        """gl_spectrum_lobpcg must reproduce gl_spectrum_at's eigensystem on
        the same sparse kNN basis (heat kernels compared, sign-free)."""
        from flgp_tpu.fit import spectral
        from flgp_tpu.ops.heat_kernel import heat_kernel

        n, K = 150, 6
        X = jnp.asarray(rng.normal(size=(n, 3)))
        basis = spectral.gl_setup(X, sparse=True, threshold=0.05)
        a2 = jnp.asarray(1.0)
        dense = spectral.gl_spectrum_at(basis, a2, K)
        iterative = spectral.gl_spectrum_lobpcg(key, basis, a2, K, iters=120)
        np.testing.assert_allclose(
            np.asarray(iterative.values), np.asarray(dense.values), atol=1e-6
        )
        idx = jnp.arange(40)
        H_d = np.asarray(heat_kernel(dense, 2.0, K, idx, idx))
        H_i = np.asarray(heat_kernel(iterative, 2.0, K, idx, idx))
        np.testing.assert_allclose(H_i, H_d, atol=5e-5)

    def test_clustered_spectrum_n2000(self, key):
        """The hard case SURVEY §7 flags: clustered top eigenvalues.  Six
        well-separated blobs give a near-degenerate 6-fold top cluster at
        λ≈1; LOBPCG must still recover the eigensystem at n=2000.  Values
        compared directly; vectors through the rotation-insensitive heat
        kernel (degenerate blocks are only defined up to rotation)."""
        from flgp_tpu.fit import spectral
        from flgp_tpu.ops.heat_kernel import heat_kernel

        rng = np.random.default_rng(42)
        n, K = 2000, 16
        centers = rng.normal(0, 12, size=(6, 3))
        X = jnp.asarray(
            np.concatenate(
                [rng.normal(c, 1.0, size=(n // 6 + 1, 3)) for c in centers]
            )[:n]
        )
        basis = spectral.gl_setup(X, sparse=True, threshold=0.004)  # r=8 kNN
        a2 = jnp.asarray(1.0)
        dense = spectral.gl_spectrum_at(basis, a2, K)
        iterative, resid = spectral.gl_spectrum_lobpcg_status(key, basis, a2, K, iters=200)
        # top cluster really is clustered
        dv = np.asarray(dense.values)
        assert dv[0] - dv[5] < 1e-3, dv[:8]
        np.testing.assert_allclose(
            np.asarray(iterative.values), dv, atol=1e-7
        )
        # structured convergence status: residuals must certify the solve
        # (interior pairs reach ~1e-10; the trailing pair at the truncation
        # edge converges slowest)
        assert float(jnp.max(resid)) < 1e-5, np.asarray(resid)
        idx = jnp.arange(0, n, 37)
        H_d = np.asarray(heat_kernel(dense, 2.0, K, idx, idx))
        H_i = np.asarray(heat_kernel(iterative, 2.0, K, idx, idx))
        # within-cluster rotations are only approximately heat-kernel
        # invariant (the six eigenvalues differ at ~1e-4), so compare at the
        # corresponding relative scale
        np.testing.assert_allclose(H_i, H_d, rtol=1e-4, atol=1e-3)

    def test_fit_gl_regression_reports_residual(self, rng, key):
        """fit_gl_* surfaces the eigensolver residual as structured status."""
        import flgp_tpu
        from flgp_tpu import FitConfig, GraphConfig

        m, n_new = 100, 40
        X = rng.uniform(-2, 2, size=(m, 1))
        Y = np.sin(2 * X[:, 0]) + 0.05 * rng.normal(size=m)
        X_new = rng.uniform(-2, 2, size=(n_new, 1))
        cfg = FitConfig(
            graph=GraphConfig(s=32, K=12), sigma=1e-5,
            gl_sparse=True, gl_threshold=0.08, gl_solver="lobpcg",
            gl_lobpcg_iters=120,
        )
        res = flgp_tpu.fit_gl_regression_gp(key, X, Y, X_new, cfg)
        assert res.metrics is not None
        assert res.metrics["gl_eigensolve_max_residual"] < 1e-4

    def test_fit_gl_regression_lobpcg(self, rng, key):
        """End-to-end GLGP regression through the implicit-operator solver."""
        import flgp_tpu
        from flgp_tpu import FitConfig, GraphConfig

        m, n_new = 120, 60
        X = rng.uniform(-2, 2, size=(m, 1))
        Y = np.sin(2 * X[:, 0]) + 0.05 * rng.normal(size=m)
        X_new = rng.uniform(-2, 2, size=(n_new, 1))
        cfg = FitConfig(
            graph=GraphConfig(s=32, K=16),
            sigma=1e-5,
            gl_sparse=True,
            gl_threshold=0.08,
            gl_solver="lobpcg",
            gl_lobpcg_iters=60,
            a2s=(0.5, 1.0, 2.0),
            dtype=jnp.float64,
        )
        res = flgp_tpu.fit_gl_regression_gp(key, X, Y, X_new, cfg)
        rmse = float(np.sqrt(np.mean((res.y_test - np.sin(2 * X_new[:, 0])) ** 2)))
        assert rmse < 0.25, rmse


class TestRbfSor:
    def test_fits_smooth_function(self, rng, key):
        m, s, d = 80, 20, 1
        X = np.sort(rng.uniform(-3, 3, size=(m, d)), axis=0)
        U = np.linspace(-3, 3, s)[:, None]
        Y = np.sin(X[:, 0]) + 0.05 * rng.normal(size=m)
        X_new = rng.uniform(-3, 3, size=(40, d))
        dUU = sqdist(jnp.asarray(U), jnp.asarray(U))
        dXU = sqdist(jnp.asarray(X), jnp.asarray(U))
        dNU = sqdist(jnp.asarray(X_new), jnp.asarray(U))
        res = rbf.train_rbf_sor(dUU, dXU, jnp.asarray(Y), dtype=jnp.float64)
        pred = rbf.predict_rbf_sor(dUU, dXU, dNU, jnp.asarray(Y), res.t, res.noise, 1e-5)
        rmse = float(np.sqrt(np.mean((np.asarray(pred) - np.sin(X_new[:, 0])) ** 2)))
        assert rmse < 0.2, rmse

    def test_nmll_finite_and_decreasing_in_fit(self, rng):
        m, s = 30, 10
        X = rng.normal(size=(m, 2))
        U = rng.normal(size=(s, 2))
        Y = rng.normal(size=m)
        dUU = sqdist(jnp.asarray(U), jnp.asarray(U))
        dXU = sqdist(jnp.asarray(X), jnp.asarray(U))
        v = rbf.rbf_sor_nmll(dUU, dXU, jnp.asarray(Y), 1.0, 0.5, 1e-5)
        assert np.isfinite(float(v))


class TestCriticism:
    def test_regression_nll_analytic(self, key):
        mean = jnp.zeros(100)
        cov = jnp.ones(100)
        target = jnp.zeros(100)
        nll = criticism.nll_regression(mean, cov, target)
        # -log N(0;0,1) = 0.5 log(2π)
        np.testing.assert_allclose(float(nll), 0.5 * np.log(2 * np.pi), atol=1e-6)

    def test_classification_nll_confident(self, key):
        mean = jnp.full((50,), 6.0)
        cov = jnp.full((50,), 0.01)
        target = jnp.ones(50)
        nll = criticism.nll_classification(key, mean, cov, target)
        assert float(nll) < 0.05

    def test_multinomial_dispatch(self, key, rng):
        mean = jnp.asarray(rng.normal(size=(20, 3)))
        cov = jnp.abs(jnp.asarray(rng.normal(size=(20, 3))))
        target = jnp.asarray(rng.integers(0, 3, size=20).astype(float))
        nll = criticism.negative_log_likelihood(key, mean, cov, target, kind="multinomial")
        assert np.isfinite(float(nll))


class TestCheckpoint:
    def test_spectrum_roundtrip(self, tmp_path, rng):
        from flgp_tpu.types import EigenPair
        from flgp_tpu.utils import checkpoint as ckpt

        eig = EigenPair(jnp.asarray(rng.normal(size=(5,))), jnp.asarray(rng.normal(size=(20, 5))))
        anchors = jnp.asarray(rng.normal(size=(4, 3)))
        counts = jnp.asarray(rng.integers(1, 5, size=4).astype(float))
        path = os.path.join(tmp_path, "spec")
        ckpt.save_spectrum(path, eig, anchors, counts)
        eig2, a2, c2 = ckpt.load_spectrum(path)
        np.testing.assert_allclose(np.asarray(eig.vectors), np.asarray(eig2.vectors))
        np.testing.assert_allclose(np.asarray(anchors), np.asarray(a2))
