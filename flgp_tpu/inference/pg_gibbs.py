"""Pólya-Gamma Gibbs sampling for GP logistic classification.

The reference's ``PGLogitModel`` alternates f | ω (a Gaussian draw through a
Cholesky of the conditional covariance, GPML Eq 3.27) and ω | f ~ PG(N, f)
via host ``pgdraw`` (src/PGLogitModel.cpp:19-53), then predicts with the
collapsed mean under the final ω state (src/PGLogitModel.cpp:61-73).

Here the whole chain is one ``lax.scan`` on device; multiple chains vmap (and
shard) over the leading axis.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import linalg
from ..ops.polya_gamma import polya_gamma, polya_gamma_counts


class PGChainState(NamedTuple):
    f: jnp.ndarray       # (m,) latent function values
    omega: jnp.ndarray   # (m,) PG auxiliaries


def _resample_f(key, C, L_C, kappa, omega):
    """f | ω draw via Matheron's rule — ONE m×m Cholesky per sweep.

    The conditional is N(μ, Σ) with Σ = C − C√ω B⁻¹√ω C, μ = Σκ,
    B = √ωC√ω + I (GPML Eq 3.27 / src/PGLogitModel.cpp:25-39, one LLT per
    sweep in the reference).  Factoring Σ directly costs a second Cholesky
    plus two m×m products; instead draw the zero-mean part as

        f₀ = g − C√ω B⁻¹(√ω g + u),   g = L_C ε₁ ~ N(0, C),  u = ε₂ ~ N(0, I)

    whose covariance telescopes to exactly Σ (checked ANALYTICALLY via the
    Jacobian in tests/test_inference.py), and μ = Cκ − C√ω B⁻¹ √ω(Cκ).
    L_C = chol(C) is computed once for the whole chain; per sweep this costs
    one chol(B) + solves — matching the reference's per-sweep LLT count with
    none of its Σ assembly.  No ω division anywhere, so tiny PG draws
    (ω → 0 at large |f|) stay f32-safe."""
    k1, k2 = jax.random.split(key)
    m = kappa.shape[0]
    eps1 = jax.random.normal(k1, (m,), C.dtype)
    eps2 = jax.random.normal(k2, (m,), C.dtype)
    return _conditional_draw(C, L_C, kappa, omega, eps1, eps2)


def _conditional_draw(C, L_C, kappa, omega, eps1, eps2):
    """The deterministic linear map behind the Matheron draw — exposed so the
    test can check Cov = Σ exactly through its Jacobian."""
    sqrt_om = jnp.sqrt(omega)
    B = linalg.add_diag(sqrt_om[:, None] * C * sqrt_om[None, :], jnp.ones((), C.dtype))
    L_B = linalg.cholesky(B)

    a = linalg.pdot(C, kappa[:, None])[:, 0]
    mu = a - linalg.pdot(C, (sqrt_om * linalg.chol_solve(L_B, (sqrt_om * a)[:, None])[:, 0])[:, None])[:, 0]

    g = linalg.pdot(L_C, eps1[:, None])[:, 0]
    c = linalg.chol_solve(L_B, (sqrt_om * g + eps2)[:, None])[:, 0]
    f0 = g - linalg.pdot(C, (sqrt_om * c)[:, None])[:, 0]
    return mu + f0


def pg_gibbs_chain(
    key: jax.Array,
    C: jnp.ndarray,
    Y: jnp.ndarray,
    n_sweeps: int = 100,
    N: jnp.ndarray | None = None,
    max_count: int = 1,
) -> Tuple[PGChainState, jnp.ndarray]:
    """Run the PG Gibbs chain; returns final state and the f trace (sweeps, m).

    Defaults mirror the reference: ω₀ = 1, f₀ = 0, N = 1, 100 sweeps, no
    burn-in/thinning (src/PGLogitModel.cpp:9-15, src/Predict.cpp:11-26).
    """
    m = Y.shape[0]
    if N is None:
        N = jnp.ones((m,), dtype=C.dtype)
    kappa = Y - N / 2.0
    L_C = linalg.cholesky(linalg.add_diag(C, jnp.full((m,), 1e-10, C.dtype)))

    def sweep(state: PGChainState, k):
        k_f, k_om = jax.random.split(k)
        f = _resample_f(k_f, C, L_C, kappa, state.omega)
        if max_count == 1:
            omega = polya_gamma(k_om, f)
        else:
            omega = polya_gamma_counts(k_om, N.astype(jnp.int32), f, max_count)
        return PGChainState(f, omega), f

    init = PGChainState(jnp.zeros((m,), C.dtype), jnp.ones((m,), C.dtype))
    final, trace = jax.lax.scan(sweep, init, jax.random.split(key, n_sweeps))
    return final, trace


def collapsed_predict(
    C: jnp.ndarray,
    Cnv: jnp.ndarray,
    Y: jnp.ndarray,
    omega: jnp.ndarray,
    N: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Collapsed posterior-mean probabilities under the final ω
    (src/PGLogitModel.cpp:61-73)."""
    m = Y.shape[0]
    if N is None:
        N = jnp.ones((m,), dtype=C.dtype)
    kappa = Y - N / 2.0
    sqrt_om = jnp.sqrt(omega)
    B = linalg.add_diag(sqrt_om[:, None] * C * sqrt_om[None, :], jnp.ones((), C.dtype))
    L_B = linalg.cholesky(B)
    adj = kappa - sqrt_om * linalg.chol_solve(L_B, (sqrt_om * linalg.pdot(C, kappa[:, None])[:, 0])[:, None])[:, 0]
    mu_new = linalg.pdot(Cnv, adj[:, None])[:, 0]
    return jax.nn.sigmoid(mu_new)


def test_pgbinary(
    key: jax.Array,
    C: jnp.ndarray,
    Y: jnp.ndarray,
    Cnv: jnp.ndarray,
    n_sweeps: int = 100,
    N: jnp.ndarray | None = None,
    max_count: int = 1,
    avg_sweeps: int = 50,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fit the PG chain and predict labels/probabilities at new points
    (src/Predict.cpp:11-26).  Returns (labels, probabilities).

    The reference predicts from the collapsed mean under the *final* ω state
    only — a one-sample estimator whose torus test error fluctuates by ±0.01
    across RNG streams (measured: 0.016–0.037 at n=4800).  With
    ``avg_sweeps > 0`` the collapsed probabilities are Rao-Blackwellized:
    averaged over the last ``avg_sweeps`` post-burn-in ω states (the chols
    batch under one vmap, so this costs one extra batched solve, not a
    longer chain).  ``avg_sweeps=0`` reproduces the reference's final-state
    semantics exactly.
    """
    if avg_sweeps <= 0:
        final, _ = pg_gibbs_chain(key, C, Y, n_sweeps, N, max_count)
        pi = collapsed_predict(C, Cnv, Y, final.omega, N)
        return (pi > 0.5).astype(Y.dtype), pi

    _, _, omega_trace = pg_gibbs_chain_trace(key, C, Y, n_sweeps, N, max_count)
    S = min(avg_sweeps, n_sweeps)
    omegas = omega_trace[-S:]
    pis = jax.vmap(lambda om: collapsed_predict(C, Cnv, Y, om, N))(omegas)
    pi = jnp.mean(pis, axis=0)
    return (pi > 0.5).astype(Y.dtype), pi


def pg_gibbs_chain_trace(
    key: jax.Array,
    C: jnp.ndarray,
    Y: jnp.ndarray,
    n_sweeps: int = 100,
    N: jnp.ndarray | None = None,
    max_count: int = 1,
):
    """As pg_gibbs_chain but also returns the ω trace (sweeps, m)."""
    m = Y.shape[0]
    if N is None:
        N = jnp.ones((m,), dtype=C.dtype)
    kappa = Y - N / 2.0
    L_C = linalg.cholesky(linalg.add_diag(C, jnp.full((m,), 1e-10, C.dtype)))

    def sweep(state: PGChainState, k):
        k_f, k_om = jax.random.split(k)
        f = _resample_f(k_f, C, L_C, kappa, state.omega)
        if max_count == 1:
            omega = polya_gamma(k_om, f)
        else:
            omega = polya_gamma_counts(k_om, N.astype(jnp.int32), f, max_count)
        return PGChainState(f, omega), (f, omega)

    init = PGChainState(jnp.zeros((m,), C.dtype), jnp.ones((m,), C.dtype))
    final, (f_trace, omega_trace) = jax.lax.scan(
        sweep, init, jax.random.split(key, n_sweeps)
    )
    return final, f_trace, omega_trace
