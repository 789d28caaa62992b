"""utils.r_kmeans: AS 136 Hartigan–Wong on the R stream.

The end-to-end validation is tests/test_golden.py::TestSpiralExactAnchors
(the SE golden reproduces to 4 significant figures on the replayed anchors);
here: the algorithm's own guarantees on small problems.
"""

import numpy as np
import pytest

from flgp_tpu.utils.r_kmeans import hartigan_wong, r_kmeans
from flgp_tpu.utils.r_rng import RRng


def _blobs(m=60, k=4, d=2, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 6, size=(k, d))
    return np.concatenate(
        [rng.normal(centers[j], 1.0, size=(m // k, d)) for j in range(k)]
    )


class TestHartiganWong:
    def test_partition_and_convergence(self):
        A = _blobs()
        C0 = A[:4].copy()
        C, ic1, wss, ifault = hartigan_wong(A, C0, iter_max=50)
        assert ifault == 0
        assert ic1.shape == (60,)
        assert set(np.unique(ic1)) <= set(range(4))
        # centers are exact means of their members
        for L in range(4):
            np.testing.assert_allclose(C[L], A[ic1 == L].mean(0), atol=1e-12)
        # WSS consistent
        total = sum(((A[ic1 == L] - C[L]) ** 2).sum() for L in range(4))
        np.testing.assert_allclose(wss.sum(), total, atol=1e-10)

    def test_hw_local_optimum(self):
        """At convergence no single-point transfer lowers total WSS — the
        defining property of the AS 136 fixed point (R1 ≤ R2 for all moves)."""
        A = _blobs(m=48, k=3, seed=1)
        C, ic1, _, ifault = hartigan_wong(A, A[:3].copy(), iter_max=100)
        assert ifault == 0
        nc = np.bincount(ic1, minlength=3).astype(float)
        for i in range(len(A)):
            l1 = ic1[i]
            if nc[l1] == 1:
                continue
            d1 = ((A[i] - C[l1]) ** 2).sum()
            gain = nc[l1] * d1 / (nc[l1] - 1.0)
            for L in range(3):
                if L == l1:
                    continue
                dL = ((A[i] - C[L]) ** 2).sum()
                cost = nc[L] * dL / (nc[L] + 1.0)
                assert cost >= gain - 1e-9, (i, l1, L)

    def test_beats_or_matches_lloyd_objective(self):
        """HW's extra transfer stages never end above plain Lloyd from the
        same init on this well-separated data."""
        A = _blobs(seed=2)
        C0 = A[[0, 15, 30, 45]].copy()
        _, ic1, wss, _ = hartigan_wong(A, C0, iter_max=100)

        C = C0.copy()
        for _ in range(100):
            d = ((A[:, None] - C[None]) ** 2).sum(-1)
            lab = d.argmin(1)
            C = np.stack([A[lab == L].mean(0) for L in range(4)])
        lloyd = sum(((A[lab == L] - C[L]) ** 2).sum() for L in range(4))
        assert wss.sum() <= lloyd + 1e-8


class TestRKmeans:
    def test_deterministic_on_stream(self):
        A = _blobs(m=80, k=5, seed=3)
        C1, s1 = r_kmeans(RRng(42), A, 5)
        C2, s2 = r_kmeans(RRng(42), A, 5)
        np.testing.assert_array_equal(C1, C2)
        np.testing.assert_array_equal(s1, s2)
        assert s1.sum() == 80

    def test_stream_position_advances(self):
        A = _blobs(m=80, k=5, seed=3)
        rng = RRng(42)
        C1, _ = r_kmeans(rng, A, 5)
        C2, _ = r_kmeans(rng, A, 5)  # second draw: different init rows
        assert not np.array_equal(C1, C2)
