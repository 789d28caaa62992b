"""Out-of-core streamed fits (fit/streaming.py) against the in-memory path.

The streamed pipeline must be bit-equivalent given the same anchors: the ELL
graph is the same values/indices whether X arrived in one array or as disk
chunks (SURVEY §7 step 6)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flgp_tpu.config import GraphConfig, KernelType
from flgp_tpu.fit.spectral import build_spectrum
from flgp_tpu.ops.kmeans import kmeans

native = pytest.importorskip("flgp_tpu.native")
if not native.available():  # pragma: no cover
    pytest.skip("native toolchain unavailable", allow_module_level=True)

from flgp_tpu.fit import streaming  # noqa: E402


@pytest.fixture(scope="module")
def disk_matrix(tmp_path_factory):
    rng = np.random.default_rng(0)
    n, d = 1500, 3
    X = rng.normal(size=(n, d)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("stream") / "x.flgp")
    native.write_matrix(path, X)
    return path, X


class TestStreamedGraph:
    def test_matches_in_memory_spectrum(self, disk_matrix):
        path, X = disk_matrix
        g = GraphConfig(s=32, r=3, K=12, kernel=KernelType.LAE)
        key = jax.random.PRNGKey(0)
        sub = kmeans(key, jnp.asarray(X), g.s)

        eig_ref, _ = build_spectrum(key, jnp.asarray(X), g)
        # same anchors => same graph; use explicit anchors for the streamed run
        with native.MatrixFile(path) as mat:
            eig_st, _ = streaming.streamed_build_spectrum(
                key, mat, g, chunk_rows=400, anchors=sub
            )
        # build_spectrum redraws anchors internally from the same key — align
        # by rebuilding the reference from the explicit anchors too
        from flgp_tpu.ops.laplacian import normalize_graph_laplacian
        from flgp_tpu.ops.spectrum import cross_similarity_lae, spectrum_from_Z

        Z = cross_similarity_lae(jnp.asarray(X), sub.centers, g.r, g.gl, sub.counts)
        eig_ref = spectrum_from_Z(Z, g.resolved_K(), g.root)

        np.testing.assert_allclose(
            np.asarray(eig_st.values), np.asarray(eig_ref.values), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(eig_st.vectors), np.asarray(eig_ref.vectors), rtol=5e-4, atol=5e-5
        )

    def test_tail_chunk_window(self, disk_matrix):
        # chunk size that does NOT divide n exercises the shifted tail window
        path, X = disk_matrix
        g = GraphConfig(s=16, r=3, K=8)
        sub = kmeans(jax.random.PRNGKey(1), jnp.asarray(X), g.s)
        with native.MatrixFile(path) as mat:
            Z = streaming.streamed_ell_graph(mat, sub.centers, g, chunk_rows=701)
        from flgp_tpu.ops.knn import knn

        ref_idx = knn(jnp.asarray(X), sub.centers, g.r).indices
        np.testing.assert_array_equal(np.asarray(Z.indices), np.asarray(ref_idx))

    def test_reservoir_sample(self, disk_matrix):
        path, X = disk_matrix
        with native.MatrixFile(path) as mat:
            s = streaming.reservoir_sample(mat, 128, chunk_rows=500, seed=1)
        assert s.shape == (128, X.shape[1])
        # every sampled row must be an actual row of X
        d = np.abs(s[:, None, :] - X[None, :, :]).sum(-1).min(1)
        assert d.max() == 0.0


class TestStreamedFit:
    def test_streamed_gpr_runs(self, disk_matrix, tmp_path):
        rng = np.random.default_rng(2)
        n, d = 1500, 3
        X = rng.normal(size=(n, d)).astype(np.float32)
        f = np.sin(X[:, 0]) + 0.5 * X[:, 1]
        path = str(tmp_path / "xr.flgp")
        native.write_matrix(path, X)
        train_idx = rng.permutation(n)[:200]
        Y = f[train_idx] + 0.05 * rng.normal(size=200)
        from flgp_tpu.config import FitConfig

        cfg = FitConfig(graph=GraphConfig(s=48, r=3, K=24), sigma=1e-5)
        with native.MatrixFile(path) as mat:
            pred, pars = streaming.fit_lae_regression_gp_streamed(
                jax.random.PRNGKey(0), mat, Y, train_idx, cfg, chunk_rows=640
            )
        pred = np.asarray(pred)
        assert pred.shape == (n,)
        test_mask = np.ones(n, bool)
        test_mask[train_idx] = False
        rmse = float(np.sqrt(np.mean((pred[test_mask] - f[test_mask]) ** 2)))
        assert np.isfinite(rmse) and rmse < 0.6
