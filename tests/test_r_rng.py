"""The R RNG stream re-implementation (utils/r_rng.py) against well-known
published R outputs — the foundation of the exact-split parity datasets
(PARITY.md; reference goldens at /root/reference/README.md:88-94, 163-170)."""

import numpy as np

from flgp_tpu.datasets import spiral_r, torus_rings_r
from flgp_tpu.utils.r_rng import RRng


class TestRRng:
    def test_runif_seed42(self):
        # R: set.seed(42); runif(5)
        got = RRng(42).runif(5)
        want = [0.9148060, 0.9370754, 0.2861395, 0.8304476, 0.6417455]
        np.testing.assert_allclose(got, want, atol=5e-8)

    def test_runif_seed123(self):
        # R: set.seed(123); runif(3)
        got = RRng(123).runif(3)
        np.testing.assert_allclose(got, [0.2875775, 0.7883051, 0.4089769], atol=5e-8)

    def test_rnorm_inversion_seed42(self):
        # R: set.seed(42); rnorm(5)  (Inversion, AS 241 qnorm)
        got = RRng(42).rnorm(5)
        want = [1.3709584, -0.5646982, 0.3631284, 0.6328626, 0.4042683]
        np.testing.assert_allclose(got, want, atol=5e-8)

    def test_sample_rejection_seed42(self):
        # R >= 3.6 (Rejection sampling): set.seed(42); sample(10)
        got = RRng(42).sample_int(10, 10)
        np.testing.assert_array_equal(got, [1, 5, 10, 8, 2, 4, 6, 9, 7, 3])

    def test_qnorm_symmetry_and_tails(self):
        from flgp_tpu.utils.r_rng import _qnorm

        assert abs(_qnorm(0.5)) < 1e-15
        np.testing.assert_allclose(_qnorm(0.975), 1.959963984540054, atol=1e-12)
        np.testing.assert_allclose(_qnorm(1e-10), -6.361340902404056, rtol=1e-9)
        np.testing.assert_allclose(_qnorm(0.3), -_qnorm(0.7), atol=1e-15)


class TestExactSplits:
    def test_torus_shapes_and_balance(self):
        ds = torus_rings_r()
        assert ds.x_train.shape == (100, 2)
        assert ds.x_test.shape == (4700, 2)
        # scale(): columns centered, sd(ddof=1)=1 before the 1/sqrt(2) factor
        X = np.concatenate([ds.x_train, ds.x_test]) * np.sqrt(2.0)
        assert abs(X.std(0, ddof=1) - 1.0).max() < 0.02

    def test_spiral_shapes_and_noise(self):
        ds = spiral_r()
        assert ds.x_train.shape == (200, 2)
        assert ds.x_test.shape == (3800, 2)
        # train targets are noisy versions of the smooth function; test exact
        assert np.abs(ds.y_test).max() < 10.1

    def test_splits_deterministic(self):
        a, b = torus_rings_r(), torus_rings_r()
        np.testing.assert_array_equal(a.x_train, b.x_train)
        np.testing.assert_array_equal(a.y_test, b.y_test)
