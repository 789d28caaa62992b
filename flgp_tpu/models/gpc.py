"""Gaussian-process classification: Laplace approximation on the heat kernel.

Newton mode-finding (GPML Alg 3.1 with the reference's binomial-count
generalization W = N·π·(1−π)) and the Laplace-approximate marginal likelihood
(src/train.cpp:716-760), plus Laplace posterior moments (GPML Alg 3.2,
src/Utils.cpp:252-299).  The Newton loop runs under ``lax.while_loop`` with
the reference's tol=1e-5 / max_iter=100 schedule.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import EPS
from ..ops import linalg
from ..ops.heat_kernel import heat_kernel, heat_kernel_diag
from ..types import EigenPair


def sigmoid(f: jnp.ndarray) -> jnp.ndarray:
    """Inverse-logit link (src/Utils.cpp:16-24)."""
    return jax.nn.sigmoid(f)


class NewtonState(NamedTuple):
    it: jnp.ndarray
    f: jnp.ndarray
    a: jnp.ndarray
    logdet_half: jnp.ndarray
    delta: jnp.ndarray


def _newton_mode(
    C: jnp.ndarray,
    Y: jnp.ndarray,
    N: jnp.ndarray,
    tol: float,
    max_iter: int,
) -> NewtonState:
    """Locate the posterior mode of the logit model (src/train.cpp:732-751).

    Returns the final Newton state; ``logdet_half`` is Σ log(diag(chol B)+1e-9)
    for B = I + √W·C·√W evaluated at the pre-update f, matching the
    reference's use of the last-iteration factorization.
    """
    m = Y.shape[0]
    f0 = jnp.zeros((m,), dtype=C.dtype)
    state0 = NewtonState(
        jnp.int32(0), f0, f0, jnp.zeros((), C.dtype), jnp.asarray(jnp.inf, C.dtype)
    )

    def cond(st: NewtonState):
        return jnp.logical_and(st.it < max_iter, st.delta >= tol)

    def body(st: NewtonState):
        pi = sigmoid(st.f)
        W = N * pi * (1.0 - pi)
        sqrt_W = jnp.sqrt(W)
        B = linalg.add_diag(sqrt_W[:, None] * C * sqrt_W[None, :], jnp.ones((), C.dtype))
        L_B = linalg.cholesky(B)
        b = W * st.f + (Y - N * pi)
        a = b - sqrt_W * linalg.chol_solve(L_B, (sqrt_W * linalg.pdot(C, b[:, None])[:, 0])[:, None])[:, 0]
        f_new = linalg.pdot(C, a[:, None])[:, 0]
        delta = jnp.sum(jnp.abs(st.f - f_new))
        return NewtonState(st.it + 1, f_new, a, linalg.chol_logdet_half(L_B), delta)

    return jax.lax.while_loop(cond, body, state0)


def gpc_marginal_log_likelihood(
    C: jnp.ndarray,
    Y: jnp.ndarray,
    N: jnp.ndarray,
    tol: float = 1e-5,
    max_iter: int = 100,
) -> jnp.ndarray:
    """Laplace-approximate marginal log likelihood of the binomial-logit GP
    (src/train.cpp:716-760).  C already includes the σ ridge."""
    return gpc_marginal_log_likelihood_status(C, Y, N, tol, max_iter)[0]


def gpc_marginal_log_likelihood_status(
    C: jnp.ndarray,
    Y: jnp.ndarray,
    N: jnp.ndarray,
    tol: float = 1e-5,
    max_iter: int = 100,
):
    """As :func:`gpc_marginal_log_likelihood`, additionally returning the
    Newton status (iteration count, final Σ|Δf|) — single source of the
    marginal formula for both the value and status paths."""
    st = _newton_mode(C, Y, N, tol, max_iter)
    amll = -0.5 * jnp.sum(st.a * st.f)
    # binomial log likelihood at the mode; log-sigmoid for stability
    amll = amll + jnp.sum(Y * jax.nn.log_sigmoid(st.f) + (N - Y) * jax.nn.log_sigmoid(-st.f))
    amll = amll - st.logdet_half
    return amll, st.it, st.delta


def gpc_marginal_log_likelihood_lowrank(
    Phi: jnp.ndarray,
    Y: jnp.ndarray,
    N: jnp.ndarray,
    sigma: float,
    tol: float = 1e-5,
    max_iter: int = 100,
) -> jnp.ndarray:
    return gpc_marginal_log_likelihood_lowrank_status(Phi, Y, N, sigma, tol, max_iter)[0]


def gpc_marginal_log_likelihood_lowrank_status(
    Phi: jnp.ndarray,
    Y: jnp.ndarray,
    N: jnp.ndarray,
    sigma: float,
    tol: float = 1e-5,
    max_iter: int = 100,
):
    """Laplace marginal for C = ΦΦᵀ + σI via the whitened K-dim Woodbury
    dual — exact (same value as :func:`gpc_marginal_log_likelihood` on the
    dense C, tested), but every Newton step costs O(mK² + K³) instead of
    O(m³):

        B = I + √W·C·√W = D + ΨΨᵀ,  D = diag(1+σW),  Ψ = √W·Φ
        B⁻¹ = D⁻¹ − D⁻¹Ψ·S⁻¹·ΨᵀD⁻¹,  S = I_K + ΨᵀD⁻¹Ψ
        log det B = Σ log d + log det S

    This is what makes hyperparameter posteriors (SMC/NUTS over t) cheap at
    large m: the reference's objective is the m×m primal
    (src/train.cpp:716-760).

    Returns (amll, newton_iters, final_delta) — the iteration count and last
    Σ|Δf| are the structured convergence status SURVEY §5 calls for (the
    reference's Newton loop exits silently, src/train.cpp:732-751)."""
    K = Phi.shape[1]
    eyeK = jnp.eye(K, dtype=Phi.dtype)

    def cov_vec(v):
        return linalg.pdot(Phi, linalg.pdot(Phi.T, v[:, None]))[:, 0] + sigma * v

    def newton_core(f):
        pi = sigmoid(f)
        W = N * pi * (1.0 - pi)
        sqrt_W = jnp.sqrt(W)
        d = 1.0 + sigma * W
        b = W * f + (Y - N * pi)
        h = sqrt_W * cov_vec(b)
        wd = (W / d)[:, None] * Phi
        S = eyeK + linalg.pdot(Phi.T, wd)
        L_S = linalg.cholesky(S)
        rhs = linalg.pdot(Phi.T, (sqrt_W * h / d)[:, None])[:, 0]
        sol = linalg.chol_solve(L_S, rhs[:, None])[:, 0]
        u = h / d - (sqrt_W / d) * linalg.pdot(Phi, sol[:, None])[:, 0]
        a = b - sqrt_W * u
        f_new = cov_vec(a)
        logdet_half = 0.5 * jnp.sum(jnp.log(d)) + linalg.chol_logdet_half(L_S)
        return f_new, a, logdet_half

    f0 = jnp.zeros_like(Y)

    def cond(st):
        it, _, _, delta = st
        return jnp.logical_and(it < max_iter, delta >= tol)

    def body(st):
        it, f, _, _ = st
        f_new, a, logdet_half = newton_core(f)
        delta = jnp.sum(jnp.abs(f - f_new))
        return it + 1, f_new, (a, logdet_half), delta

    zero = jnp.zeros((), Phi.dtype)
    it, f, (a, logdet_half), delta = jax.lax.while_loop(
        cond, body, (jnp.int32(0), f0, (f0, zero), jnp.asarray(jnp.inf, Phi.dtype))
    )
    amll = -0.5 * jnp.sum(a * f)
    amll = amll + jnp.sum(Y * jax.nn.log_sigmoid(f) + (N - Y) * jax.nn.log_sigmoid(-f))
    return amll - logdet_half, it, delta


def gpc_nmll_objective(
    eigenpair: EigenPair,
    Y: jnp.ndarray,
    N: jnp.ndarray,
    idx: jnp.ndarray,
    K: int,
    t: jnp.ndarray,
    sigma: float,
    tol: float = 1e-5,
    max_iter: int = 100,
) -> jnp.ndarray:
    """−marginal: the GPC empirical-Bayes objective as a function of t
    (src/train.cpp:28-34).

    Static m>K dispatch to the exact K-dim Woodbury dual (the GPC analogue of
    the reference's GPR m>K branch, src/train.cpp:393-433, which the
    reference never built for its GPC objective): every Newton step is
    O(mK² + K³) instead of O(m³), same value (dense equality tested)."""
    return gpc_nmll_objective_status(
        eigenpair, Y, N, idx, K, t, sigma, tol, max_iter
    )[0]


def gpc_nmll_objective_status(
    eigenpair: EigenPair,
    Y: jnp.ndarray,
    N: jnp.ndarray,
    idx: jnp.ndarray,
    K: int,
    t: jnp.ndarray,
    sigma: float,
    tol: float = 1e-5,
    max_iter: int = 100,
):
    """As :func:`gpc_nmll_objective`, additionally returning the Newton
    solver status (iteration count, final Σ|Δf|) from the mode-finding loop —
    the SURVEY §5 failure-detection signal.  ``newton_iters == max_iter``
    with ``delta >= tol`` means the mode search exhausted its budget."""
    m = idx.shape[0]
    if m > K:
        lam = eigenpair.laplacian_eigenvalues(K)
        Phi = eigenpair.vectors[idx, :K] * jnp.exp(-0.5 * t * lam)[None, :]
        amll, it, delta = gpc_marginal_log_likelihood_lowrank_status(
            Phi, Y, N, sigma, tol, max_iter
        )
        return -amll, it, delta
    C = heat_kernel(eigenpair, t, K, idx, idx)
    C = linalg.add_diag(C, jnp.full((m,), sigma, C.dtype))
    amll, it, delta = gpc_marginal_log_likelihood_status(C, Y, N, tol, max_iter)
    return -amll, it, delta


def gpc_nlp_objective(
    eigenpair: EigenPair,
    Y: jnp.ndarray,
    N: jnp.ndarray,
    idx: jnp.ndarray,
    K: int,
    t: jnp.ndarray,
    sigma: float,
    p: float = 1e-2,
    q: float = 10.0,
    tau: float = 2.0,
    tol: float = 1e-5,
    max_iter: int = 100,
) -> jnp.ndarray:
    """−marginal + t-prior: the "posterior" objective (src/train.cpp:14-25)."""
    nm = gpc_nmll_objective(eigenpair, Y, N, idx, K, t, sigma, tol, max_iter)
    return nm + p * jnp.log(t + EPS) + (t / tau) ** (-q)


def gpc_posterior_moments(
    C11: jnp.ndarray,
    C21: jnp.ndarray,
    C22_diag: jnp.ndarray,
    Y: jnp.ndarray,
    tol: float = 1e-5,
    max_iter: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Laplace predictive mean/variance at test points (GPML Alg 3.2,
    src/Utils.cpp:252-299).  Bernoulli counts (N = 1)."""
    m = Y.shape[0]
    N = jnp.ones((m,), dtype=C11.dtype)
    st = _newton_mode(C11, Y, N, tol, max_iter)
    pi = sigmoid(st.f)
    W = pi * (1.0 - pi)
    sqrt_W = jnp.sqrt(W)
    B = linalg.add_diag(sqrt_W[:, None] * C11 * sqrt_W[None, :], jnp.ones((), C11.dtype))
    L_B = linalg.cholesky(B)

    mean = linalg.pdot(C21, (Y - pi)[:, None])[:, 0]
    Binv = linalg.chol_solve(L_B, jnp.eye(m, dtype=C11.dtype))
    beta = sqrt_W[:, None] * Binv * sqrt_W[None, :]
    cov = C22_diag - jnp.sum(linalg.pdot(C21, beta) * C21, axis=1)
    return mean, cov


def gpc_posterior_from_spectrum(
    eigenpair: EigenPair,
    Y: jnp.ndarray,
    idx0: jnp.ndarray,
    idx1: jnp.ndarray,
    K: int,
    t: jnp.ndarray,
    sigma: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assemble (C11+σI, C21, diag C22+σ) and return Laplace moments
    (driver tail at src/Fit.cpp:568-585)."""
    m = idx0.shape[0]
    C11 = heat_kernel(eigenpair, t, K, idx0, idx0)
    C11 = linalg.add_diag(C11, jnp.full((m,), sigma, C11.dtype))
    C21 = heat_kernel(eigenpair, t, K, idx1, idx0)
    C22 = heat_kernel_diag(eigenpair, t, K, idx1) + sigma
    return gpc_posterior_moments(C11, C21, C22, Y)
