"""Pallas TPU kernel correctness via the interpreter (runs on CPU).

The same kernels execute compiled on real TPU hardware inside bench.py; these
tests pin their semantics against the jnp reference paths on every platform.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from flgp_tpu.ops import pallas_kernels as pk
from flgp_tpu.ops.knn import knn


@pytest.mark.skipif(not pk._HAVE_PALLAS, reason="pallas unavailable")
class TestFusedKnn:
    def test_matches_topk_path(self, rng):
        n, d, s, r = 96, 5, 40, 3
        X = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        U = jnp.asarray(rng.normal(size=(s, d)), jnp.float32)
        got = pk.fused_knn(X, U, r, block=32, interpret=True)
        ref = knn(X, U, r)
        np.testing.assert_array_equal(np.asarray(got.indices), np.asarray(ref.indices))
        np.testing.assert_allclose(
            np.asarray(got.sqdists), np.asarray(ref.sqdists), rtol=1e-4, atol=1e-4
        )

    def test_padding_rows(self, rng):
        # n not a multiple of block exercises the pad/slice path
        n, d, s, r = 50, 3, 16, 2
        X = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        U = jnp.asarray(rng.normal(size=(s, d)), jnp.float32)
        got = pk.fused_knn(X, U, r, block=32, interpret=True)
        ref = knn(X, U, r)
        np.testing.assert_array_equal(np.asarray(got.indices), np.asarray(ref.indices))


@pytest.mark.skipif(not pk._HAVE_PALLAS, reason="pallas unavailable")
class TestFusedLae:
    """The flagship kernel: measured 1.73 s → 67 ms (25.8×) at n=1e6 on v5e
    (the LAE loop dominates the whole spectral stage under XLA)."""

    def test_matches_xla_fista(self, rng):
        from flgp_tpu.ops.lae import lae_weights_xla

        n, d, s, r = 700, 3, 64, 3
        X = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        U = jnp.asarray(rng.normal(size=(s, d)), jnp.float32)
        idx = knn(X, U, r).indices
        got = pk.fused_lae(X, U, idx, iters=150, block=256, interpret=True)
        ref = lae_weights_xla(X, U, idx, iters=150)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
        # simplex feasibility
        np.testing.assert_allclose(np.asarray(got).sum(1), 1.0, atol=1e-5)
        assert np.asarray(got).min() >= 0.0

    def test_r4_and_padding(self, rng):
        from flgp_tpu.ops.lae import lae_weights_xla

        n, d, s, r = 300, 4, 32, 4
        X = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        U = jnp.asarray(rng.normal(size=(s, d)), jnp.float32)
        idx = knn(X, U, r).indices
        got = pk.fused_lae(X, U, idx, iters=100, block=256, interpret=True)
        ref = lae_weights_xla(X, U, idx, iters=100)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


@pytest.mark.skipif(not pk._HAVE_PALLAS, reason="pallas unavailable")
class TestEllMatmat:
    def test_matches_gather_einsum(self, rng):
        n, s, r, K = 70, 24, 4, 8
        vals = jnp.asarray(rng.uniform(0.1, 1.0, size=(n, r)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, s, size=(n, r)), jnp.int32)
        W = jnp.asarray(rng.normal(size=(s, K)), jnp.float32)
        got = pk.ell_matmat(vals, idx, W, block=32, interpret=True)
        ref = jnp.einsum("nr,nrk->nk", vals, W[idx])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not pk._HAVE_PALLAS, reason="pallas unavailable")
class TestFusedNormalizeSpectrumTail:
    """Round-5 kernels: the graph tail (colsum / normalize+Gram / extension)
    as streaming one-hot contractions vs the exact EllMatrix composition."""

    def _graph(self, rng, n=450, d=3, s=48, r=3):
        X = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        U = jnp.asarray(rng.normal(size=(s, d)), jnp.float32)
        res = knn(X, U, r)
        w = jnp.asarray(rng.uniform(0.1, 1.0, size=(n, r)), jnp.float32)
        return w, res.indices, s

    def test_ell_colsum(self, rng):
        w, idx, s = self._graph(rng)
        got = pk.ell_colsum(w, idx, s, block=128, interpret=True)
        ref = jnp.zeros((s,), w.dtype).at[idx.reshape(-1)].add(w.reshape(-1))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5)

    def test_ell_norm_gram_matches_composition(self, rng):
        from flgp_tpu.types import EllMatrix

        w, idx, s = self._graph(rng)
        cs = jnp.asarray(rng.uniform(0.5, 2.0, size=(s,)), jnp.float32)
        G, D = pk.ell_norm_gram(w, idx, cs, block=128, interpret=True)
        Z = EllMatrix(w, idx, s).scale_cols(cs)
        Zn = Z.scale_rows(1.0 / (Z.rowsum() + 1e-9))
        np.testing.assert_allclose(np.asarray(G), np.asarray(Zn.gram()), atol=2e-5)
        np.testing.assert_allclose(np.asarray(D), np.asarray(Zn.colsum()), atol=2e-5)

    def test_ell_norm_matmat_matches_composition(self, rng):
        from flgp_tpu.types import EllMatrix

        w, idx, s = self._graph(rng)
        cs = jnp.asarray(rng.uniform(0.5, 2.0, size=(s,)), jnp.float32)
        W = jnp.asarray(rng.normal(size=(s, 8)), jnp.float32)
        got = pk.ell_norm_matmat(w, idx, cs, W, block=128, interpret=True)
        Z = EllMatrix(w, idx, s).scale_cols(cs)
        Zn = Z.scale_rows(1.0 / (Z.rowsum() + 1e-9))
        np.testing.assert_allclose(np.asarray(got), np.asarray(Zn.matmat(W)), atol=2e-5)

    @pytest.mark.parametrize("gl", ["rw", "normalized", "cluster-normalized"])
    def test_spectrum_fused_fallback_equals_composition(self, rng, gl):
        """The non-TPU branch of spectrum_fused must BE the composition —
        bit-for-bit (this is the path the f64 golden gates run through)."""
        from flgp_tpu.config import LaplacianType
        from flgp_tpu.ops.laplacian import normalize_graph_laplacian
        from flgp_tpu.ops.spectrum import spectrum_from_Z, spectrum_fused
        from flgp_tpu.types import EllMatrix

        n, d, s, r, K = 300, 3, 32, 3, 8
        X = jnp.asarray(rng.normal(size=(n, d)))
        U = jnp.asarray(rng.normal(size=(s, d)))
        res = knn(X, U, r)
        w = jnp.asarray(rng.uniform(0.1, 1.0, size=(n, r)))
        counts = jnp.asarray(rng.integers(1, 20, size=(s,)).astype(np.float64))
        glt = LaplacianType(gl)
        got = spectrum_fused(w, res.indices, s, K, glt, True, counts)
        Z = normalize_graph_laplacian(EllMatrix(w, res.indices, s), glt, counts)
        ref = spectrum_from_Z(Z, K, True)
        np.testing.assert_array_equal(np.asarray(got.values), np.asarray(ref.values))
        np.testing.assert_array_equal(np.asarray(got.vectors), np.asarray(ref.vectors))

    def test_fused_tpu_branch_matches_composition_interpret(self, rng):
        """The TPU branch's reassociated algebra (AᵀA = dinv·Ĝ·dinv, folded
        extension) vs the composition, kernels in interpret mode."""
        from flgp_tpu.config import EPS, LaplacianType
        from flgp_tpu.ops.laplacian import normalize_graph_laplacian
        from flgp_tpu.ops.spectrum import spectrum_from_Z
        from flgp_tpu.types import EllMatrix

        n, d, s, r, K = 400, 3, 40, 3, 8
        X = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        U = jnp.asarray(rng.normal(size=(s, d)), jnp.float32)
        res = knn(X, U, r)
        w = jnp.asarray(rng.uniform(0.1, 1.0, size=(n, r)), jnp.float32)

        C = pk.ell_colsum(w, res.indices, s, block=128, interpret=True)
        cscale = 1.0 / (C + EPS)
        Ghat, D = pk.ell_norm_gram(w, res.indices, cscale, block=128, interpret=True)
        dinv = 1.0 / jnp.sqrt(jnp.abs(D) + EPS)
        G = Ghat * dinv[:, None] * dinv[None, :]
        wv, V = jnp.linalg.eigh(G)
        wv = wv[::-1][:K]
        V = V[:, ::-1][:, :K]
        sigma = jnp.sqrt(jnp.maximum(wv, 0.0))
        W_eff = dinv[:, None] * V * (jnp.sqrt(jnp.float32(n)) / (sigma + EPS))[None, :]
        vecs = pk.ell_norm_matmat(w, res.indices, cscale, W_eff, block=128, interpret=True)

        Z = normalize_graph_laplacian(
            EllMatrix(w, res.indices, s), LaplacianType.NORMALIZED, None
        )
        ref = spectrum_from_Z(Z, K, True)
        np.testing.assert_allclose(np.asarray(sigma), np.asarray(ref.values), atol=1e-5)
        Vr, Vg = np.asarray(ref.vectors), np.asarray(vecs)
        signs = np.sign(np.sum(Vr * Vg, axis=0))
        np.testing.assert_allclose(Vg * signs, Vr, atol=5e-3)


@pytest.mark.skipif(not pk._HAVE_PALLAS, reason="pallas unavailable")
class TestFeatureMajorTailKernels:
    """Chunked (nch, r, c) variants of the fused tail kernels — the n=1e7
    colmajor pipeline's normalize/Gram/extension (round 5)."""

    def _graph_t(self, rng, nch=3, r=3, c=128, s=40):
        w = jnp.asarray(rng.uniform(0.1, 1.0, size=(nch, r, c)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, s, size=(nch, r, c)), jnp.int32)
        # zero-weight pad tail (the colmajor builder's contract)
        w = w.at[-1, :, c // 2 :].set(0.0)
        return w, idx, s

    def test_colsum_t(self, rng):
        w, idx, s = self._graph_t(rng)
        got = pk.ell_colsum_t(w, idx, s, block=64, interpret=True)
        ref = jnp.zeros((s,), w.dtype).at[idx.reshape(-1)].add(w.reshape(-1))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5)

    def test_norm_gram_t_matches_composition(self, rng):
        from flgp_tpu.ops.colmajor import normalize_colmajor, spectrum_colmajor

        w, idx, s = self._graph_t(rng)
        cs = jnp.asarray(rng.uniform(0.5, 2.0, size=(s,)), jnp.float32)
        G, D = pk.ell_norm_gram_t(w, idx, cs, block=64, interpret=True)
        # oracle: normalize by hand on the chunked layout
        w1 = w * cs[idx]
        rs = jnp.sum(w1, axis=1, keepdims=True)
        wn = w1 / (rs + 1e-9)
        ref_D = jnp.zeros((s,), w.dtype).at[idx.reshape(-1)].add(wn.reshape(-1))
        vv = (wn[:, :, None, :] * wn[:, None, :, :]).reshape(-1)
        fi = (idx[:, :, None, :] * s + idx[:, None, :, :]).reshape(-1)
        ref_G = jnp.zeros((s * s,), w.dtype).at[fi].add(vv).reshape(s, s)
        np.testing.assert_allclose(np.asarray(D), np.asarray(ref_D), atol=3e-5)
        np.testing.assert_allclose(np.asarray(G), np.asarray(ref_G), atol=3e-5)

    def test_norm_matmat_t_matches_composition(self, rng):
        w, idx, s = self._graph_t(rng)
        cs = jnp.asarray(rng.uniform(0.5, 2.0, size=(s,)), jnp.float32)
        W = jnp.asarray(rng.normal(size=(s, 8)), jnp.float32)
        got = pk.ell_norm_matmat_t(w, idx, cs, W, block=64, interpret=True)
        w1 = w * cs[idx]
        rs = jnp.sum(w1, axis=1, keepdims=True)
        wn = w1 / (rs + 1e-9)
        ref = jnp.einsum("nrc,nrck->nck", wn, W[idx]).reshape(-1, 8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)

    def test_fused_colmajor_tail_interpret_matches_spectrum(self, rng):
        """End-to-end reassociated tail (interpret kernels) vs the exact
        chunked composition (normalize_colmajor + spectrum_colmajor)."""
        from flgp_tpu.config import EPS, LaplacianType
        from flgp_tpu.ops.colmajor import normalize_colmajor, spectrum_colmajor

        n = 3 * 128
        w, idx, s = self._graph_t(rng)
        w = w.at[-1, :, 64:].set(0.2)  # no pads: n == nch*c here
        K = 8
        C = pk.ell_colsum_t(w, idx, s, block=64, interpret=True)
        cscale = 1.0 / (C + EPS)
        Ghat, D = pk.ell_norm_gram_t(w, idx, cscale, block=64, interpret=True, eps=EPS)
        dinv = 1.0 / jnp.sqrt(jnp.abs(D) + EPS)
        G = Ghat * dinv[:, None] * dinv[None, :]
        wv, V = jnp.linalg.eigh(G)
        wv = wv[::-1][:K]
        V = V[:, ::-1][:, :K]
        sigma = jnp.sqrt(jnp.maximum(wv, 0.0))
        W_eff = dinv[:, None] * V * (jnp.sqrt(jnp.float32(n)) / (sigma + EPS))[None, :]
        vecs = pk.ell_norm_matmat_t(w, idx, cscale, W_eff, block=64, interpret=True, eps=EPS)[:n]

        wn = normalize_colmajor(idx, w, s, LaplacianType.NORMALIZED, None)
        ref = spectrum_colmajor(idx, wn, s, K, True, n)
        np.testing.assert_allclose(np.asarray(sigma), np.asarray(ref.values), atol=1e-5)
        Vr, Vg = np.asarray(ref.vectors), np.asarray(vecs)
        signs = np.sign(np.sum(Vr * Vg, axis=0))
        np.testing.assert_allclose(Vg * signs, Vr, atol=5e-3)
