"""Multinomial (one-vs-rest) GPC drivers.

The reference trains J independent binary logit GPs over a shared spectral
basis in a serial loop (src/MultiClassification.cpp:29-53) and predicts J
PG-Gibbs probability columns then argmaxes (src/MultiClassification.cpp:57-88).
Here both loops are vmapped over the class axis — J hyperparameter
optimizations and J Gibbs chains run batched on device.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FitConfig, KernelType
from ..inference.pg_gibbs import test_pgbinary
from ..models import gpc as gpc_mod
from ..ops import linalg
from ..ops.heat_kernel import heat_kernel, heat_kernel_diag
from ..types import EigenPair
from . import spectral
from .drivers import FitResult, _a2_grid, _concat_all, _select, _solve_cast, _train_gpc


def one_hot_labels(Y: jnp.ndarray, J: int) -> jnp.ndarray:
    """One-hot encode continuous integer labels 0..J−1
    (multi_train_split, src/MultiClassification.cpp:14-26)."""
    return jax.nn.one_hot(Y.astype(jnp.int32), J, dtype=Y.dtype)


def _train_mult(eigenpair: EigenPair, aug_y, idx, K: int, cfg: FitConfig):
    """J binary t-optimizations over the shared spectrum, vmapped over classes
    (replaces the serial loop at src/MultiClassification.cpp:40-50)."""
    m = idx.shape[0]
    N = jnp.ones((m,), aug_y.dtype)

    def per_class(yj):
        return _train_gpc(eigenpair, yj, N, idx, K, cfg)

    return jax.vmap(per_class)(aug_y.T)


def _predict_mult(key, eigenpair: EigenPair, aug_y, ts, idx, idx_pred, K: int, cfg: FitConfig):
    """J PG-Gibbs chains → per-class probabilities → argmax
    (src/MultiClassification.cpp:57-88)."""
    m = idx.shape[0]
    J = aug_y.shape[1]
    keys = jax.random.split(key, J)

    def per_class(k, yj, t):
        Cvv = heat_kernel(eigenpair, t, K, idx, idx)
        Cvv = linalg.add_diag(Cvv, jnp.full((m,), cfg.sigma, Cvv.dtype))
        Cnv = heat_kernel(eigenpair, t, K, idx_pred, idx)
        _, pi = test_pgbinary(k, Cvv, yj, Cnv, cfg.n_gibbs, avg_sweeps=cfg.gibbs_avg_sweeps)
        return pi

    probs = jax.vmap(per_class)(keys, aug_y.T, ts)  # (J, n_pred)
    return jnp.argmax(probs, axis=0).astype(aug_y.dtype), probs


def _posterior_mult(eigenpair: EigenPair, aug_y, ts, idx, idx_new, K: int, sigma: float):
    """Per-class Laplace moments at the test points
    (src/Utils.cpp:339-369), vmapped over classes."""

    def per_class(yj, t):
        return gpc_mod.gpc_posterior_from_spectrum(eigenpair, yj, idx, idx_new, K, t, sigma)

    mean, cov = jax.vmap(per_class)(aug_y.T, ts)
    return mean.T, cov.T  # (m_new, J)


@functools.partial(jax.jit, static_argnames=("cfg", "m", "n", "J"))
def _lae_mult_impl(key, X_all, Y, cfg: FitConfig, m: int, n: int, J: int):
    g = dataclasses.replace(cfg.graph, kernel=KernelType.LAE)
    K = min(g.resolved_K(), g.s, n)
    k_spec, k_pg = jax.random.split(key)
    eig, _ = spectral.build_spectrum(k_spec, X_all, g)
    idx = jnp.arange(m)
    aug_y = one_hot_labels(Y, J)
    scfg, seig, (aug_s,) = _solve_cast(cfg, eig, aug_y)
    res = _train_mult(seig, aug_s, idx, K, scfg)
    label_pred, probs = _predict_mult(k_pg, seig, aug_s, res.x, idx, jnp.arange(n), K, scfg)
    mean, cov = _posterior_mult(seig, aug_s, res.x, idx, jnp.arange(m, n), K, scfg.sigma)
    return label_pred, probs, mean, cov, res, eig


def fit_lae_logit_mult_gp(key, X, Y, X_new, cfg: FitConfig = FitConfig()) -> FitResult:
    """Multinomial GPC with the LAE kernel (src/Fit.cpp:609-662)."""
    X_all, m, n = _concat_all(X, X_new, cfg.dtype)
    Y = jnp.asarray(Y, cfg.dtype)
    J = int(np.max(np.asarray(Y))) + 1
    label_pred, probs, mean, cov, res, eig = _lae_mult_impl(key, X_all, Y, cfg, m, n, J)
    return FitResult(
        y_train=np.asarray(label_pred[:m]),
        y_test=np.asarray(label_pred[m:]),
        posterior_mean=np.asarray(mean),
        posterior_cov=np.asarray(cov),
        pars={"t": np.asarray(res.x)},
        obj=float(jnp.sum(-res.obj)),
        eigenpair=eig,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "m", "n", "J"))
def _se_mult_impl(key, X_all, Y, a2s, cfg: FitConfig, m: int, n: int, J: int):
    g = cfg.graph
    K = min(g.resolved_K(), g.s, n)
    k_spec, k_pg = jax.random.split(key)
    basis = spectral.se_grid_setup(k_spec, X_all, g)
    idx = jnp.arange(m)
    aug_y = one_hot_labels(Y, J)

    def per_a2(a2):
        eig = spectral.se_spectrum_at(basis, a2, g)
        scfg, seig, (aug_s,) = _solve_cast(cfg, eig, aug_y)
        res = _train_mult(seig, aug_s, idx, K, scfg)
        return eig, res

    eigs, results = jax.vmap(per_a2)(a2s)
    # grid objective = Σ_j per-class objective (src/Fit.cpp:855-866)
    best = jnp.argmax(jnp.sum(-results.obj, axis=1))
    eig = _select(eigs, best)
    res = _select(results, best)
    scfg, seig, (aug_s,) = _solve_cast(cfg, eig, aug_y)
    label_pred, probs = _predict_mult(k_pg, seig, aug_s, res.x, idx, jnp.arange(n), K, scfg)
    mean, cov = _posterior_mult(seig, aug_s, res.x, idx, jnp.arange(m, n), K, scfg.sigma)
    return label_pred, probs, mean, cov, res, a2s[best], eig


def fit_se_logit_mult_gp(key, X, Y, X_new, cfg: FitConfig = FitConfig()) -> FitResult:
    """Multinomial GPC with the SE kernel and bandwidth grid
    (src/Fit.cpp:797-892)."""
    X_all, m, n = _concat_all(X, X_new, cfg.dtype)
    Y = jnp.asarray(Y, cfg.dtype)
    J = int(np.max(np.asarray(Y))) + 1
    label_pred, probs, mean, cov, res, best_a2, eig = _se_mult_impl(
        key, X_all, Y, _a2_grid(cfg), cfg, m, n, J
    )
    return FitResult(
        y_train=np.asarray(label_pred[:m]),
        y_test=np.asarray(label_pred[m:]),
        posterior_mean=np.asarray(mean),
        posterior_cov=np.asarray(cov),
        pars={"t": np.asarray(res.x), "a2": np.asarray(best_a2)},
        obj=float(jnp.sum(-res.obj)),
        eigenpair=eig,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "m", "n", "J"))
def _nystrom_mult_impl(key, X_all, Y, a2s, cfg: FitConfig, m: int, n: int, J: int):
    g = cfg.graph
    K = min(g.resolved_K(), g.s)
    k_spec, k_pg = jax.random.split(key)
    basis = spectral.nystrom_setup(k_spec, X_all, g)
    idx = jnp.arange(m)
    aug_y = one_hot_labels(Y, J)

    def per_a2(a2):
        anchor, Z_UU = spectral.nystrom_anchor_eigs(basis, a2, K)
        eig_train = spectral.nystrom_extend(
            anchor, Z_UU, basis.dist_allU[:m], a2, basis.dist_mean, False,
            rcond=g.nystrom_rcond,
        )
        scfg, seig, (aug_s,) = _solve_cast(cfg, eig_train, aug_y)
        res = _train_mult(seig, aug_s, idx, K, scfg)
        return anchor, Z_UU, res

    anchors, Z_UUs, results = jax.vmap(per_a2)(a2s)
    best = jnp.argmax(jnp.sum(-results.obj, axis=1))
    anchor = _select(anchors, best)
    Z_UU = _select(Z_UUs, best)
    res = _select(results, best)
    eig = spectral.nystrom_extend(
        anchor, Z_UU, basis.dist_allU, a2s[best], basis.dist_mean, True,
        rcond=g.nystrom_rcond,
    )
    scfg, seig, (aug_s,) = _solve_cast(cfg, eig, aug_y)
    label_pred, probs = _predict_mult(k_pg, seig, aug_s, res.x, idx, jnp.arange(n), K, scfg)
    mean, cov = _posterior_mult(seig, aug_s, res.x, idx, jnp.arange(m, n), K, scfg.sigma)
    return label_pred, probs, mean, cov, res, a2s[best], eig


def fit_nystrom_logit_mult_gp(key, X, Y, X_new, cfg: FitConfig = FitConfig()) -> FitResult:
    """Multinomial GPC via Nyström extension (src/Fit.cpp:1045-1162)."""
    X_all, m, n = _concat_all(X, X_new, cfg.dtype)
    Y = jnp.asarray(Y, cfg.dtype)
    J = int(np.max(np.asarray(Y))) + 1
    label_pred, probs, mean, cov, res, best_a2, eig = _nystrom_mult_impl(
        key, X_all, Y, _a2_grid(cfg), cfg, m, n, J
    )
    return FitResult(
        y_train=np.asarray(label_pred[:m]),
        y_test=np.asarray(label_pred[m:]),
        posterior_mean=np.asarray(mean),
        posterior_cov=np.asarray(cov),
        pars={"t": np.asarray(res.x), "a2": np.asarray(best_a2)},
        obj=float(jnp.sum(-res.obj)),
        eigenpair=eig,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "m", "n", "J"))
def _gl_mult_impl(key, X_all, Y, a2s, cfg: FitConfig, m: int, n: int, J: int):
    K = min(cfg.graph.K, n) if cfg.graph.K > 0 else min(cfg.graph.s, n)
    basis = spectral.gl_setup(X_all, cfg.gl_sparse, cfg.gl_threshold)
    idx = jnp.arange(m)
    aug_y = one_hot_labels(Y, J)

    from .drivers import _gl_spectrum

    k_spec = jax.random.fold_in(key, 1)

    def per_a2(a2):
        eig, _resid = _gl_spectrum(k_spec, basis, a2, K, cfg)
        scfg, seig, (aug_s,) = _solve_cast(cfg, eig, aug_y)
        res = _train_mult(seig, aug_s, idx, K, scfg)
        return eig, res

    eigs, results = jax.lax.map(per_a2, a2s)
    best = jnp.argmax(jnp.sum(-results.obj, axis=1))
    eig = _select(eigs, best)
    res = _select(results, best)
    scfg, seig, (aug_s,) = _solve_cast(cfg, eig, aug_y)
    label_pred, probs = _predict_mult(key, seig, aug_s, res.x, idx, jnp.arange(n), K, scfg)
    mean, cov = _posterior_mult(seig, aug_s, res.x, idx, jnp.arange(m, n), K, scfg.sigma)
    return label_pred, probs, mean, cov, res, a2s[best], eig


def fit_gl_logit_mult_gp(key, X, Y, X_new, cfg: FitConfig = FitConfig()) -> FitResult:
    """Multinomial GPC on the exact graph Laplacian (src/Fit.cpp:1333-1461)."""
    X_all, m, n = _concat_all(X, X_new, cfg.dtype)
    Y = jnp.asarray(Y, cfg.dtype)
    J = int(np.max(np.asarray(Y))) + 1
    label_pred, probs, mean, cov, res, best_a2, eig = _gl_mult_impl(
        key, X_all, Y, _a2_grid(cfg), cfg, m, n, J
    )
    return FitResult(
        y_train=np.asarray(label_pred[:m]),
        y_test=np.asarray(label_pred[m:]),
        posterior_mean=np.asarray(mean),
        posterior_cov=np.asarray(cov),
        pars={"t": np.asarray(res.x), "a2": np.asarray(best_a2)},
        obj=float(jnp.sum(-res.obj)),
        eigenpair=eig,
    )
