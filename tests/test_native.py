"""Native (C++) host-runtime tests: kernels vs their JAX twins, loader
round-trips, and Pólya-Gamma moment checks.

The native layer is a runtime component, not a compute-path dependency —
skip everything cleanly if no toolchain is present.
"""

import os

import numpy as np
import pytest

from flgp_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


class TestHostKnn:
    def test_matches_numpy(self, rng):
        X = rng.normal(size=(200, 5)).astype(np.float32)
        U = rng.normal(size=(40, 5)).astype(np.float32)
        idx, dist = native.knn(X, U, 4, n_threads=2)
        d = ((X[:, None] - U[None, :]) ** 2).sum(-1)
        expect = np.argsort(d, axis=1)[:, :4]
        np.testing.assert_array_equal(idx, expect)
        np.testing.assert_allclose(dist, np.take_along_axis(d, idx, 1), rtol=1e-4, atol=1e-4)

    def test_threaded_equals_serial(self, rng):
        X = rng.normal(size=(1000, 3)).astype(np.float32)
        U = rng.normal(size=(64, 3)).astype(np.float32)
        i1, d1 = native.knn(X, U, 3, n_threads=1)
        i2, d2 = native.knn(X, U, 3, n_threads=4)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(d1, d2)


class TestHostLae:
    def test_matches_jax_kernel(self, rng):
        import jax.numpy as jnp

        from flgp_tpu.ops.lae import lae_weights as lae_jax

        X = rng.normal(size=(80, 4)).astype(np.float32)
        U = rng.normal(size=(25, 4)).astype(np.float32)
        idx, _ = native.knn(X, U, 3)
        w_native = native.lae_weights(X, U, idx, iters=150)
        w_jax = np.asarray(
            lae_jax(jnp.asarray(X, jnp.float64), jnp.asarray(U, jnp.float64),
                    jnp.asarray(idx), iters=150)
        )
        # both solve the same strongly-structured QP; minimizers agree
        np.testing.assert_allclose(w_native, w_jax, atol=5e-3)
        # simplex constraints hold exactly
        np.testing.assert_allclose(w_native.sum(1), 1.0, atol=1e-5)
        assert (w_native >= -1e-7).all()


class TestPolyaGamma:
    def test_moments(self):
        # E[PG(b, c)] = b/(2c) tanh(c/2); analytic moment check at scale
        n = 20000
        b = np.full(n, 2, np.int32)
        c = np.full(n, 1.5)
        draws = native.polya_gamma(123, b, c, n_threads=2)
        expect_mean = 2.0 / (2.0 * 1.5) * np.tanh(1.5 / 2.0)
        assert abs(draws.mean() - expect_mean) < 0.01
        assert (draws > 0).all()

    def test_zero_c_matches_quarter_series(self):
        # PG(1, 0) has mean 1/4
        n = 20000
        draws = native.polya_gamma(7, np.ones(n, np.int32), np.zeros(n))
        assert abs(draws.mean() - 0.25) < 0.01


class TestMatrixLoader:
    def test_roundtrip(self, rng, tmp_path):
        M = rng.normal(size=(257, 6)).astype(np.float32)
        path = str(tmp_path / "m.flgp")
        native.write_matrix(path, M)
        with native.MatrixFile(path) as f:
            assert f.shape == (257, 6)
            assert f.dtype == np.float32
            np.testing.assert_array_equal(f.read(0, 257), M)
            np.testing.assert_array_equal(f.read(100, 50), M[100:150])
            # clamped tail read
            np.testing.assert_array_equal(f.read(250, 100), M[250:])

    def test_dtypes(self, rng, tmp_path):
        for dt in (np.float32, np.float64, np.int32):
            M = (rng.normal(size=(10, 3)) * 10).astype(dt)
            path = str(tmp_path / f"m_{np.dtype(dt).name}.flgp")
            native.write_matrix(path, M)
            with native.MatrixFile(path) as f:
                assert f.dtype == np.dtype(dt)
                np.testing.assert_array_equal(f.read(0, 10), M)

    def test_stream_loader_covers_all_rows(self, rng, tmp_path):
        M = rng.normal(size=(1000, 4)).astype(np.float32)
        path = str(tmp_path / "s.flgp")
        native.write_matrix(path, M)
        with native.MatrixFile(path) as f:
            seen = []
            for lo, chunk in native.StreamLoader(f, chunk_rows=128):
                seen.append((lo, chunk))
            total = np.concatenate([c for _, c in seen])
            np.testing.assert_array_equal(total, M)
            assert [lo for lo, _ in seen] == list(range(0, 1000, 128))

    def test_out_of_core_knn(self, rng, tmp_path):
        X = rng.normal(size=(3000, 3)).astype(np.float32)
        U = rng.normal(size=(32, 3)).astype(np.float32)
        path = str(tmp_path / "x.flgp")
        native.write_matrix(path, X)
        with native.MatrixFile(path) as f:
            idx_s, dist_s = f.knn_stream(U, 3, chunk_rows=512)
        idx, dist = native.knn(X, U, 3)
        np.testing.assert_array_equal(idx_s, idx)
        np.testing.assert_array_equal(dist_s, dist)
