"""Gaussian-process regression on the spectral heat-kernel representation.

Closed-form Gaussian marginal likelihood with the reference's m≤K direct /
m>K Woodbury dual (src/train.cpp:333-555), exact conditioning for prediction
(src/Predict.cpp:40-117) and diagonal posterior covariance
(src/Utils.cpp:215-249).  Gradients for hyperparameter learning come from
autodiff rather than the reference's hand-derived GPML Eq. 5.9 expressions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import EPS
from ..ops import linalg
from ..ops.heat_kernel import heat_kernel, heat_kernel_diag, heat_kernel_weights
from ..types import EigenPair


def _as_2d(Y: jnp.ndarray) -> jnp.ndarray:
    return Y[:, None] if Y.ndim == 1 else Y


def gpr_nmll(
    eigenpair: EigenPair,
    Y: jnp.ndarray,
    idx: jnp.ndarray,
    K: int,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """Negative marginal log likelihood (src/train.cpp:351-436).

    ``noise`` may be a scalar (homoscedastic, src/train.cpp:351) or an (m,)
    vector (per-point, src/train.cpp:459).  Branch selection m≤K is static.
    """
    Y = _as_2d(Y)
    m, q = Y.shape
    noise = jnp.broadcast_to(jnp.asarray(noise, Y.dtype), (m,))
    z = noise + sigma

    if m <= K:
        C = heat_kernel(eigenpair, t, K, idx, idx)
        C = linalg.add_diag(C, z)
        L = linalg.cholesky(C)
        alpha = linalg.chol_solve(L, Y)
        nmll = 0.5 * jnp.sum(Y * alpha) / q
        nmll = nmll + linalg.chol_logdet_half(L)
        return nmll

    lam = eigenpair.laplacian_eigenvalues(K)
    lam_sqrt = jnp.exp(-0.5 * t * lam)
    V = eigenpair.vectors[idx, :K]
    alpha, L_Q = linalg.woodbury_solve_terms(V, lam_sqrt, 1.0 / z, Y)
    nmll = 0.5 * jnp.sum(Y * alpha) / q
    nmll = nmll + linalg.chol_logdet_half(L_Q)
    nmll = nmll + 0.5 * jnp.sum(jnp.log(z + EPS))
    return nmll


def t_log_prior(t: jnp.ndarray, p: float, q: float, tau: float) -> jnp.ndarray:
    """Negative log prior penalty on diffusion time:
    p·log(t+1e-9) + (t/τ)^(−q)  (src/train.cpp:341, src/train.h:136-156)."""
    return p * jnp.log(t + EPS) + (t / tau) ** (-q)


def noise_log_prior(noise: jnp.ndarray, sigma: float, alpha: float, beta: float) -> jnp.ndarray:
    """Inverse-gamma penalty on (noise+σ), averaged over points when noise is
    a vector (src/train.cpp:342, 449-453)."""
    z = noise + sigma
    pr = (alpha + 1.0) * jnp.log(z) + beta / z
    return jnp.mean(pr) if jnp.ndim(noise) > 0 else pr


def gpr_nmll_posterior(
    eigenpair: EigenPair,
    Y: jnp.ndarray,
    idx: jnp.ndarray,
    K: int,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    sigma: float,
    p: float = 1.0,
    q: float = 10.0,
    tau: float = 2.0,
    alpha: float = 1e-1,
    beta: float = 1e-3,
) -> jnp.ndarray:
    """NMLL plus priors — the "posterior" empirical-Bayes objective
    (src/train.cpp:333-348)."""
    nmll = gpr_nmll(eigenpair, Y, idx, K, t, noise, sigma)
    return nmll + t_log_prior(t, p, q, tau) + noise_log_prior(noise, sigma, alpha, beta)


def gpr_mll(
    eigenpair: EigenPair,
    Y: jnp.ndarray,
    idx: jnp.ndarray,
    K: int,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """Marginal log likelihood (exported standalone by the reference,
    src/train.cpp:674-713).  Equals −gpr_nmll for q = 1."""
    return -gpr_nmll(eigenpair, _as_2d(Y), idx, K, t, noise, sigma)


def gpr_predict(
    eigenpair: EigenPair,
    Y: jnp.ndarray,
    idx0: jnp.ndarray,
    idx1: jnp.ndarray,
    K: int,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """Posterior-mean prediction at idx1 given observations at idx0
    (src/Predict.cpp:40-117; both noise variants through broadcasting)."""
    Y2 = _as_2d(Y)
    m = Y2.shape[0]
    noise = jnp.broadcast_to(jnp.asarray(noise, Y2.dtype), (m,))
    z = noise + sigma

    if m <= K:
        C = heat_kernel(eigenpair, t, K, idx0, idx0)
        C = linalg.add_diag(C, z)
        L = linalg.cholesky(C)
        alpha = linalg.chol_solve(L, Y2)
        Cnv = heat_kernel(eigenpair, t, K, idx1, idx0)
        pred = linalg.pdot(Cnv, alpha)
    else:
        lam = eigenpair.laplacian_eigenvalues(K)
        lam_sqrt = jnp.exp(-0.5 * t * lam)
        V = eigenpair.vectors[idx0, :K]
        alpha, _ = linalg.woodbury_solve_terms(V, lam_sqrt, 1.0 / z, Y2)
        Vnv = eigenpair.vectors[idx1, :K]
        w = heat_kernel_weights(eigenpair, t, K)
        pred = linalg.pdot(Vnv, w[:, None] * linalg.pdot(V.T, alpha))

    return pred[:, 0] if Y.ndim == 1 else pred


def gpr_posterior_cov(
    eigenpair: EigenPair,
    idx0: jnp.ndarray,
    idx1: jnp.ndarray,
    K: int,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """Diagonal predictive covariance at idx1 (src/Utils.cpp:215-249).

    Follows the reference in adding (noise+σ) to the predictive variance and
    using the homoscedastic noise scalar."""
    m = idx0.shape[0]
    var = jnp.asarray(noise)
    z = var + sigma
    w = heat_kernel_weights(eigenpair, t, K)
    V2 = eigenpair.vectors[idx1, :K]

    if m <= K:
        C11 = heat_kernel(eigenpair, t, K, idx0, idx0)
        K11 = linalg.add_diag(C11, jnp.broadcast_to(z, (m,)))
        C21 = heat_kernel(eigenpair, t, K, idx1, idx0)
        L = linalg.cholesky(K11)
        alpha = linalg.chol_solve(L, C21.T).T
        beta = jnp.sum(C21 * alpha, axis=1)
    else:
        V1 = eigenpair.vectors[idx0, :K]
        lam_sqrt = jnp.exp(-0.5 * t * eigenpair.laplacian_eigenvalues(K))
        VtV = linalg.pdot(V1.T, V1)
        Q = lam_sqrt[:, None] * VtV * lam_sqrt[None, :]
        Q = linalg.add_diag(Q, z)
        L_Q = linalg.cholesky(Q)
        inner = VtV - linalg.pdot(VtV, lam_sqrt[:, None] * linalg.chol_solve(L_Q, lam_sqrt[:, None] * VtV))
        A = (1.0 / z) * (w[:, None] * inner * w[None, :])
        beta = jnp.sum(V2 * linalg.pdot(V2, A), axis=1)

    prior = jnp.sum((V2 * w[None, :]) * V2, axis=1)
    return prior + z - beta


class GprFitResult(NamedTuple):
    t: jnp.ndarray
    noise: jnp.ndarray
    obj: jnp.ndarray
