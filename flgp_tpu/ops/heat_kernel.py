"""Heat-kernel covariance from a spectral pair.

H = V·diag(exp(−t·(1−λ)))·Vᵀ restricted to row subsets — the single
most-evaluated primitive (every empirical-Bayes objective evaluation;
src/Spectrum.cpp:83-94).  One einsum; autodiff through t replaces the
reference's hand-derived gradients (src/train.cpp:370-426).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import PRECISION
from ..types import EigenPair


def heat_kernel_weights(eigenpair: EigenPair, t: jnp.ndarray, K: int) -> jnp.ndarray:
    """exp(−t·(1−λ_k)) for the top-K spectrum (src/Spectrum.cpp:86-90)."""
    lam = eigenpair.laplacian_eigenvalues(K)
    return jnp.exp(-t * lam)


def heat_kernel(
    eigenpair: EigenPair,
    t: jnp.ndarray,
    K: int,
    idx0: jnp.ndarray,
    idx1: jnp.ndarray,
) -> jnp.ndarray:
    """H[idx0, idx1] of shape (len(idx0), len(idx1))."""
    w = heat_kernel_weights(eigenpair, t, K)
    V0 = eigenpair.vectors[idx0, :K]
    V1 = eigenpair.vectors[idx1, :K]
    return jnp.einsum("ik,k,jk->ij", V0, w, V1, precision=PRECISION)


def heat_kernel_diag(
    eigenpair: EigenPair, t: jnp.ndarray, K: int, idx: jnp.ndarray
) -> jnp.ndarray:
    """diag(H[idx, idx]) without materializing the full block
    (used for C22/Cnn, src/Fit.cpp:579-584)."""
    w = heat_kernel_weights(eigenpair, t, K)
    V = eigenpair.vectors[idx, :K]
    return jnp.einsum("ik,k,ik->i", V, w, V, precision=PRECISION)
