"""Kill-and-resume semantics: segmented HMC and the resumable bandwidth grid
must reproduce uninterrupted runs exactly (SURVEY §5 checkpoint/resume)."""

import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flgp_tpu.config import FitConfig, GraphConfig
from flgp_tpu.inference.resume import run_hmc_checkpointed


def _logprob():
    rng = np.random.default_rng(0)
    dim = 6
    A = rng.normal(size=(dim, dim))
    prec = jnp.asarray(A @ A.T / dim + np.eye(dim))

    def lp(x):
        return -0.5 * x @ prec @ x

    return lp, dim


class TestResumableHmc:
    def test_deterministic_across_directories(self, tmp_path):
        # the draw stream is a pure function of (key, segmentation) — two
        # fresh runs agree exactly
        lp, dim = _logprob()
        key = jax.random.PRNGKey(0)
        x0 = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (4, dim))

        run_a = run_hmc_checkpointed(
            key, lp, x0, str(tmp_path / "a"), n_warmup=16, n_samples=48,
            segment=16, n_leapfrog=8,
        )
        run_b = run_hmc_checkpointed(
            key, lp, x0, str(tmp_path / "b"), n_warmup=16, n_samples=48,
            segment=16, n_leapfrog=8,
        )
        np.testing.assert_array_equal(
            np.asarray(run_a.samples), np.asarray(run_b.samples)
        )
        # sanity: chains moved and acceptance is reasonable
        assert float(np.mean(run_a.accept_prob)) > 0.5

    def test_kill_and_resume_bit_exact(self, tmp_path):
        lp, dim = _logprob()
        key = jax.random.PRNGKey(0)
        x0 = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (4, dim))

        full = run_hmc_checkpointed(
            key, lp, x0, str(tmp_path / "full"), n_warmup=16, n_samples=48,
            segment=16, n_leapfrog=8,
        )
        # simulate a kill after 2 of 3 segments: copy their checkpoints only
        resumed_dir = tmp_path / "resumed"
        os.makedirs(resumed_dir)
        for i in range(2):
            shutil.copytree(tmp_path / "full" / f"seg_{i}", resumed_dir / f"seg_{i}")
            shutil.copytree(tmp_path / "full" / f"phase_{i}", resumed_dir / f"phase_{i}")
        resumed = run_hmc_checkpointed(
            key, lp, x0, str(resumed_dir), n_warmup=16, n_samples=48,
            segment=16, n_leapfrog=8,
        )
        np.testing.assert_array_equal(
            np.asarray(full.samples), np.asarray(resumed.samples)
        )


class TestResumableGrid:
    def _data(self):
        rng = np.random.default_rng(3)
        n, m = 400, 80
        theta = rng.uniform(0, 4 * np.pi, n)
        X = np.stack([np.cos(theta) * (1 + theta / 5), np.sin(theta) * (1 + theta / 5)], 1)
        Y = np.sin(theta)
        idx = rng.permutation(n)
        return X[idx[:m]], Y[idx[:m]] + 0.1 * rng.normal(size=m), X[idx[m:]]

    def test_interrupt_and_resume_identical(self, tmp_path):
        from flgp_tpu.fit.resumable import fit_se_regression_gp_resumable

        Xtr, Ytr, Xte = self._data()
        cfg = FitConfig(
            graph=GraphConfig(s=32, r=3, K=16), sigma=1e-5,
            a2s=[0.3, 1.0, 3.0, 10.0],
        )
        key = jax.random.PRNGKey(0)
        full = fit_se_regression_gp_resumable(key, Xtr, Ytr, Xte, str(tmp_path / "f"), cfg)

        # "interrupted" run: pre-seed only the first two grid checkpoints
        partial_dir = tmp_path / "p"
        os.makedirs(partial_dir)
        for i in range(2):
            shutil.copytree(tmp_path / "f" / f"a2_{i}", partial_dir / f"a2_{i}")
        resumed = fit_se_regression_gp_resumable(key, Xtr, Ytr, Xte, str(partial_dir), cfg)

        assert resumed.pars["a2"] == full.pars["a2"]
        np.testing.assert_allclose(resumed.y_test, full.y_test, rtol=1e-6)
        np.testing.assert_allclose(resumed.obj, full.obj, rtol=1e-6)
