"""Unit tests of the spectral-pipeline kernels against NumPy/SciPy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from flgp_tpu.config import LaplacianType
from flgp_tpu.ops.distance import sqdist, sqdist_blocked
from flgp_tpu.ops.kmeans import kmeans, minibatch_kmeans, random_subsample
from flgp_tpu.ops.knn import knn
from flgp_tpu.ops.lae import lae_weights, project_simplex
from flgp_tpu.ops.laplacian import normalize_graph_laplacian
from flgp_tpu.ops.spectrum import cross_similarity_lae, spectrum_from_Z
from flgp_tpu.types import EllMatrix


def _rand_ell(rng, n=40, s=12, r=3):
    vals = jnp.asarray(rng.uniform(0.1, 1.0, size=(n, r)))
    idx = jnp.asarray(
        np.stack([rng.choice(s, size=r, replace=False) for _ in range(n)]), dtype=jnp.int32
    )
    return EllMatrix(vals, idx, s)


class TestDistance:
    def test_matches_numpy(self, rng):
        X = rng.normal(size=(50, 4))
        U = rng.normal(size=(20, 4))
        expect = ((X[:, None] - U[None, :]) ** 2).sum(-1)
        got = np.asarray(sqdist(jnp.asarray(X), jnp.asarray(U)))
        np.testing.assert_allclose(got, expect, atol=1e-10)

    def test_blocked_matches(self, rng):
        X = rng.normal(size=(100, 3))
        U = rng.normal(size=(7, 3))
        a = np.asarray(sqdist(jnp.asarray(X), jnp.asarray(U)))
        b = np.asarray(sqdist_blocked(jnp.asarray(X), jnp.asarray(U), block=32))
        np.testing.assert_allclose(a, b, atol=1e-10)


class TestKnn:
    def test_matches_argsort(self, rng):
        X = rng.normal(size=(60, 3))
        U = rng.normal(size=(15, 3))
        res = knn(jnp.asarray(X), jnp.asarray(U), 4)
        d = ((X[:, None] - U[None, :]) ** 2).sum(-1)
        expect = np.argsort(d, axis=1)[:, :4]
        got = np.asarray(res.indices)
        # same set of neighbors, sorted by distance
        np.testing.assert_array_equal(np.sort(got, 1), np.sort(expect, 1))
        np.testing.assert_allclose(
            np.asarray(res.sqdists), np.take_along_axis(d, got, 1), atol=1e-9
        )
        assert np.all(np.diff(np.asarray(res.sqdists), axis=1) >= -1e-12)

    def test_blocked(self, rng):
        X = rng.normal(size=(100, 3))
        U = rng.normal(size=(10, 3))
        a = knn(jnp.asarray(X), jnp.asarray(U), 3)
        b = knn(jnp.asarray(X), jnp.asarray(U), 3, block=32)
        np.testing.assert_array_equal(np.asarray(a.indices), np.asarray(b.indices))


class TestEll:
    def test_dense_roundtrip_ops(self, rng):
        Z = _rand_ell(rng)
        D = np.asarray(Z.to_dense())
        np.testing.assert_allclose(np.asarray(Z.rowsum()), D.sum(1), atol=1e-12)
        np.testing.assert_allclose(np.asarray(Z.colsum()), D.sum(0), atol=1e-12)
        v = rng.normal(size=(Z.num_cols,))
        np.testing.assert_allclose(np.asarray(Z.matvec(jnp.asarray(v))), D @ v, atol=1e-12)
        u = rng.normal(size=(Z.shape[0],))
        np.testing.assert_allclose(np.asarray(Z.rmatvec(jnp.asarray(u))), D.T @ u, atol=1e-12)

    def test_gram_and_matmat(self, rng):
        Z = _rand_ell(rng, n=70, s=16, r=4)
        D = np.asarray(Z.to_dense())
        np.testing.assert_allclose(np.asarray(Z.gram(block=16)), D.T @ D, atol=1e-10)
        W = rng.normal(size=(16, 5))
        np.testing.assert_allclose(
            np.asarray(Z.matmat(jnp.asarray(W), block=16)), D @ W, atol=1e-10
        )


class TestSimplexProjection:
    def test_matches_reference_algorithm(self, rng):
        """Oracle: solve the projection QP with scipy for random vectors."""
        V = rng.normal(size=(20, 5))
        got = np.asarray(project_simplex(jnp.asarray(V)))
        for i in range(20):
            res = scipy.optimize.minimize(
                lambda z: 0.5 * ((z - V[i]) ** 2).sum(),
                np.ones(5) / 5,
                jac=lambda z: z - V[i],
                constraints=[{"type": "eq", "fun": lambda z: z.sum() - 1}],
                bounds=[(0, None)] * 5,
                method="SLSQP",
            )
            np.testing.assert_allclose(got[i], res.x, atol=1e-6)
        np.testing.assert_allclose(got.sum(1), 1.0, atol=1e-10)
        assert np.all(got >= 0)


class TestLae:
    def test_solves_simplex_lsq(self, rng):
        """LAE weights must minimize ||x - z U|| over the simplex (oracle QP)."""
        n, s, r, d = 15, 8, 3, 2
        X = rng.normal(size=(n, d))
        U = rng.normal(size=(s, d))
        idx = knn(jnp.asarray(X), jnp.asarray(U), r).indices
        Z = np.asarray(lae_weights(jnp.asarray(X), jnp.asarray(U), idx, iters=300))
        np.testing.assert_allclose(Z.sum(1), 1.0, atol=1e-6)
        assert Z.min() >= -1e-9
        idx_np = np.asarray(idx)
        for i in range(n):
            Ui = U[idx_np[i]]
            obj = lambda z: 0.5 * ((X[i] - z @ Ui) ** 2).sum()
            res = scipy.optimize.minimize(
                obj,
                np.ones(r) / r,
                constraints=[{"type": "eq", "fun": lambda z: z.sum() - 1}],
                bounds=[(0, None)] * r,
                method="SLSQP",
            )
            assert obj(Z[i]) <= obj(res.x) + 1e-6


class TestLaplacian:
    @pytest.mark.parametrize("gl", [LaplacianType.RW, LaplacianType.NORMALIZED,
                                    LaplacianType.CLUSTER_NORMALIZED])
    def test_matches_dense_reference(self, rng, gl):
        Z = _rand_ell(rng, n=30, s=10, r=3)
        sizes = jnp.asarray(rng.integers(1, 10, size=10).astype(float))
        got = np.asarray(normalize_graph_laplacian(Z, gl, sizes).to_dense())

        D = np.asarray(Z.to_dense())
        if gl != LaplacianType.RW:
            D = D / (D.sum(0)[None, :] + 1e-9)
            if gl == LaplacianType.CLUSTER_NORMALIZED:
                D = D * np.asarray(sizes)[None, :]
        D = D / (D.sum(1)[:, None] + 1e-9)
        np.testing.assert_allclose(got, D, atol=1e-12)

    def test_row_stochastic(self, rng):
        Z = _rand_ell(rng)
        out = normalize_graph_laplacian(Z, LaplacianType.NORMALIZED)
        np.testing.assert_allclose(np.asarray(out.rowsum()), 1.0, atol=1e-6)


class TestSpectrum:
    def test_matches_dense_svd(self, rng):
        """values/vectors must match a dense SVD of A = Z D^-1/2 (oracle)."""
        Z = _rand_ell(rng, n=50, s=12, r=4)
        K = 8
        eig = spectrum_from_Z(Z, K, root=False)
        D = np.asarray(Z.to_dense())
        colsum = D.sum(0)
        A = D / np.sqrt(np.abs(colsum) + 1e-9)[None, :]
        u_np, s_np, _ = np.linalg.svd(A, full_matrices=False)
        np.testing.assert_allclose(np.asarray(eig.values), s_np[:K] ** 2, atol=1e-8)
        # eigenvectors up to sign
        got = np.asarray(eig.vectors) / np.sqrt(D.shape[0])
        for k in range(K):
            dot = np.abs(got[:, k] @ u_np[:, k])
            np.testing.assert_allclose(dot, 1.0, atol=1e-6)

    def test_root_takes_sqrt(self, rng):
        Z = _rand_ell(rng)
        e1 = spectrum_from_Z(Z, 5, root=False)
        e2 = spectrum_from_Z(Z, 5, root=True)
        np.testing.assert_allclose(
            np.asarray(e2.values) ** 2, np.asarray(e1.values), atol=1e-9
        )

    def test_w_eigen_identity(self, rng):
        """eig(W) for W = Z D^{-1} Zᵀ must equal σ²(A)."""
        Z = _rand_ell(rng, n=30, s=10, r=3)
        eig = spectrum_from_Z(Z, 10, root=False)
        D = np.asarray(Z.to_dense())
        W = D @ np.diag(1.0 / (D.sum(0) + 1e-9)) @ D.T
        w_np = np.sort(np.linalg.eigvalsh(W))[::-1][:10]
        np.testing.assert_allclose(np.asarray(eig.values), w_np, atol=1e-6)


class TestSubsample:
    def test_kmeans_counts_sum_to_n(self, key, rng):
        X = jnp.asarray(rng.normal(size=(200, 3)))
        res = kmeans(key, X, 10, nstart=2, iters=50)
        assert res.centers.shape == (10, 3)
        assert float(jnp.sum(res.counts)) == 200.0

    def test_kmeans_reduces_wss(self, key, rng):
        X = jnp.asarray(rng.normal(size=(300, 2)))
        res = kmeans(key, X, 20)
        d = np.asarray(sqdist(X, res.centers))
        wss_kmeans = d.min(1).sum()
        rnd = random_subsample(key, X, 20)
        d2 = np.asarray(sqdist(X, rnd.centers))
        assert wss_kmeans < d2.min(1).sum()

    def test_minibatch_runs(self, key, rng):
        X = jnp.asarray(rng.normal(size=(500, 2)))
        res = minibatch_kmeans(key, X, 8, iters=30)
        assert res.centers.shape == (8, 2)
        assert float(jnp.sum(res.counts)) == 500.0

    def test_cross_similarity_rows_stochastic(self, key, rng):
        X = jnp.asarray(rng.normal(size=(100, 3)))
        res = kmeans(key, X, 12)
        Z = cross_similarity_lae(X, res.centers, 3, LaplacianType.CLUSTER_NORMALIZED, res.counts)
        np.testing.assert_allclose(np.asarray(Z.rowsum()), 1.0, atol=1e-6)
