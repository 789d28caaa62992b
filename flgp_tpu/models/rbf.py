"""Ambient-space RBF Subset-of-Regressors GP baseline.

The reference ships a complete SoR sparse-GP implementation (GPML Eq 8.17)
that no fit driver ever calls — a dormant ~300-LoC baseline
(src/train.cpp:80-329, src/Predict.cpp:120-164, SURVEY §2.4).  It is part of
the capability surface, so it exists here too: NMLL (both noise models) via
autodiff instead of the hand-derived gradients, trainer, and predictor.

Kernel convention matches the reference: C = exp(−d²/(2t)) with t the
squared-bandwidth hyperparameter.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import EPS
from ..ops import linalg
from ..inference.optimize import GprOptResult, minimize_t_noise, minimize_t_noisevec


def _as_2d(Y):
    return Y[:, None] if Y.ndim == 1 else Y


def rbf_sor_nmll(
    dist_UU: jnp.ndarray,
    dist_XU: jnp.ndarray,
    Y: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """SoR negative marginal log likelihood (src/train.cpp:95-137 same-noise,
    156-210 per-point; unified through the diagonal z)."""
    Y = _as_2d(Y)
    m, q = Y.shape
    s = dist_UU.shape[0]
    noise = jnp.broadcast_to(jnp.asarray(noise, Y.dtype), (m,))
    z = noise + sigma
    z_inv = 1.0 / z

    C_ss = jnp.exp(-dist_UU / (2.0 * t))
    C_ms = jnp.exp(-dist_XU / (2.0 * t))
    L_ss = linalg.cholesky(C_ss + jnp.eye(s, dtype=C_ss.dtype) * 1e-10)

    Q = C_ss + linalg.pdot(C_ms.T, z_inv[:, None] * C_ms)
    L_Q = linalg.cholesky(Q)
    ZiY = z_inv[:, None] * Y
    alpha = ZiY - z_inv[:, None] * linalg.pdot(
        C_ms, linalg.chol_solve(L_Q, linalg.pdot(C_ms.T, ZiY))
    )

    nmll = 0.5 * jnp.sum(Y * alpha) / q
    nmll = nmll + linalg.chol_logdet_half(L_Q) - linalg.chol_logdet_half(L_ss)
    nmll = nmll + 0.5 * jnp.sum(jnp.log(z + EPS))
    return nmll


def rbf_sor_nmll_posterior(
    dist_UU, dist_XU, Y, t, noise, sigma,
    alpha: float = 1e-1, beta: float = 1e-3,
) -> jnp.ndarray:
    """NMLL plus the inverse-gamma noise penalty (src/train.cpp:80-92)."""
    z = noise + sigma
    pr = (alpha + 1.0) * jnp.log(z) + beta / z
    pr = jnp.mean(pr) if jnp.ndim(noise) > 0 else pr
    return rbf_sor_nmll(dist_UU, dist_XU, Y, t, noise, sigma) + pr


def train_rbf_sor(
    dist_UU, dist_XU, Y, sigma: float = 1e-5,
    posterior: bool = True, per_point_noise: bool = False,
    dtype=jnp.float32,
) -> GprOptResult:
    """Hyperparameter learning for (t, noise) (src/train.cpp:212-329)."""
    if not per_point_noise:
        def fn(t, noise):
            if posterior:
                return rbf_sor_nmll_posterior(dist_UU, dist_XU, Y, t, noise, sigma)
            return rbf_sor_nmll(dist_UU, dist_XU, Y, t, noise, sigma)

        return minimize_t_noise(fn, t_lb=1e-4, noise_lb=1e-4, dtype=dtype)

    m = _as_2d(Y).shape[0]

    def fnv(t, noise_vec):
        if posterior:
            return rbf_sor_nmll_posterior(dist_UU, dist_XU, Y, t, noise_vec, sigma)
        return rbf_sor_nmll(dist_UU, dist_XU, Y, t, noise_vec, sigma)

    return minimize_t_noisevec(fnv, m, t_lb=1e-4, noise_lb=1e-4, t0=1.0, dtype=dtype)


def predict_rbf_sor(
    dist_UU, dist_XU, dist_newU, Y, t, noise, sigma: float,
) -> jnp.ndarray:
    """SoR predictive mean (src/Predict.cpp:120-164, both noise variants)."""
    Y2 = _as_2d(Y)
    m = Y2.shape[0]
    noise_b = jnp.broadcast_to(jnp.asarray(noise, Y2.dtype), (m,))
    z_inv = 1.0 / (noise_b + sigma)

    C_ss = jnp.exp(-dist_UU / (2.0 * t))
    C_ms = jnp.exp(-dist_XU / (2.0 * t))
    Q = C_ss + linalg.pdot(C_ms.T, z_inv[:, None] * C_ms)
    L_Q = linalg.cholesky(Q)
    alpha = linalg.chol_solve(L_Q, linalg.pdot(C_ms.T, z_inv[:, None] * Y2))
    C_ns = jnp.exp(-dist_newU / (2.0 * t))
    pred = linalg.pdot(C_ns, alpha)
    return pred[:, 0] if Y.ndim == 1 else pred
