"""n-sharded GPC tail: Laplace Newton + posterior moments + prediction with
the row axis sharded over the device mesh.

The reference's flagship binary-GPC tail (src/Fit.cpp:521-605) works with
dense (m, m) kernels and O(m³) Cholesky per Newton step.  At scale the rows
(train and test alike) live sharded; everything routes through the whitened
K-dim feature map

    Φ = V · diag(exp(−t·λ/2)),   C = ΦΦᵀ + σI

so a Newton step is Woodbury in K dimensions:

    B = I + √W·C·√W = D + ΨΨᵀ,   D = diag(1 + σW),  Ψ = √W·Φ
    B⁻¹ = D⁻¹ − D⁻¹Ψ·S⁻¹·ΨᵀD⁻¹,  S = I_K + ΨᵀD⁻¹Ψ

Every m-row contraction (ΨᵀD⁻¹Ψ, Φᵀb, …) is a psum over row shards; the only
replicated work is one K×K Cholesky per iteration.  Predictive moments use
M_K = A₁ − A₁S⁻¹A₁ with A₁ = Φᵀ(W/d)Φ, so per-row variance is a local
quadratic form — no (n, m) cross-covariance ever materializes
(src/Utils.cpp:252-299 semantics, n-sharded).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import EPS
from ..ops.linalg import pdot


def _phi(values, vectors_local, K, t):
    lam = 1.0 - values[:K]
    scale = jnp.exp(-0.5 * t * lam)
    return vectors_local[:, :K] * scale[None, :]


def sharded_gpc_laplace_fn(
    mesh: Mesh,
    K: int,
    sigma: float,
    tol: float = 1e-5,
    max_iter: int = 100,
    axis: str = "data",
):
    """Returns fn(values, vectors_local, Y_local, N_local, mask_local, t) →
    (amll, mean_local, var_local, label_local).

    Rows (train + test, transductive) are sharded on ``axis``;
    ``mask_local`` ∈ {0,1} marks training rows, whose labels/counts sit in
    Y_local/N_local (zeros elsewhere).  ``amll`` is the replicated
    Laplace-approximate marginal log likelihood — the same number the dense
    tail optimizes (src/train.cpp:716-760) — so n-sharded empirical Bayes
    over t rides this function too.
    """

    def fn(values, vectors_local, Y_local, N_local, mask_local, t):
        dtype = vectors_local.dtype
        phi = _phi(values, vectors_local, K, t)          # (rows_local, K)
        phi_m = phi * mask_local[:, None]                # train rows only
        Y = Y_local * mask_local
        N = N_local * mask_local
        eyeK = jnp.eye(K, dtype=dtype)

        def cov_vec(a):
            """C·a on train rows: Φ_m(Φ_mᵀa) + σa (psum over shards)."""
            pa = jax.lax.psum(pdot(phi_m.T, a[:, None])[:, 0], axis)
            return pdot(phi_m, pa[:, None])[:, 0] + sigma * a

        def newton_core(f):
            pi = jax.nn.sigmoid(f) * mask_local
            W = N * pi * (1.0 - pi)
            sqrt_W = jnp.sqrt(W)
            d = 1.0 + sigma * W
            b = W * f + (Y - N * pi)
            h = sqrt_W * cov_vec(b)
            # Woodbury solve u = B⁻¹ h
            wd = (W / d)[:, None] * phi_m
            S = eyeK + jax.lax.psum(pdot(phi_m.T, wd), axis)
            L_S = jnp.linalg.cholesky(S)
            # ΨᵀD⁻¹h = Φᵀ(√W·h / d) — no division by √W (W may be 0 at masked rows)
            rhs = jax.lax.psum(pdot(phi_m.T, (sqrt_W * h / d)[:, None])[:, 0], axis)
            sol = jax.scipy.linalg.cho_solve((L_S, True), rhs)
            u = h / d - (sqrt_W / d) * pdot(phi_m, sol[:, None])[:, 0]
            a = b - sqrt_W * u
            f_new = cov_vec(a)
            logdet_half = 0.5 * (
                jax.lax.psum(jnp.sum(jnp.log(d)), axis)
                + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L_S) + EPS))
            )
            return f_new, a, logdet_half, W, pi

        f0 = jnp.zeros_like(Y)

        def cond(st):
            it, _, _, delta = st
            return jnp.logical_and(it < max_iter, delta >= tol)

        def body(st):
            it, f, _, _ = st
            f_new, a, logdet_half, _, _ = newton_core(f)
            delta = jax.lax.psum(jnp.sum(jnp.abs(f - f_new)), axis)
            return it + 1, f_new, (a, logdet_half), delta

        _, f, (a, logdet_half), _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), f0, (f0, jnp.zeros((), dtype)), jnp.asarray(jnp.inf, dtype))
        )

        # marginal at the mode (masked rows contribute 0 to the likelihood)
        loglik = jnp.sum(
            mask_local * (Y * jax.nn.log_sigmoid(f) + (N - Y) * jax.nn.log_sigmoid(-f))
        )
        amll = (
            -0.5 * jax.lax.psum(jnp.sum(a * f), axis)
            + jax.lax.psum(loglik, axis)
            - logdet_half
        )

        # predictive moments at EVERY local row (GPML Alg 3.2, sharded):
        # mean = Φ·(Φ_mᵀ(Y − Nπ));  var = C22 − φᵀ·M_K·φ
        pi = jax.nn.sigmoid(f) * mask_local
        W = N * pi * (1.0 - pi)
        d = 1.0 + sigma * W
        resid = jax.lax.psum(pdot(phi_m.T, (Y - N * pi)[:, None])[:, 0], axis)
        mean_local = pdot(phi, resid[:, None])[:, 0]
        wd = (W / d)[:, None] * phi_m
        A1 = jax.lax.psum(pdot(phi_m.T, wd), axis)
        S = eyeK + A1
        L_S = jnp.linalg.cholesky(S)
        M_K = A1 - pdot(A1, jax.scipy.linalg.cho_solve((L_S, True), A1))
        c22 = jnp.sum(phi * phi, axis=1) + sigma
        var_local = c22 - jnp.sum(pdot(phi, M_K) * phi, axis=1)
        label_local = (jax.nn.sigmoid(mean_local) > 0.5).astype(dtype)
        return amll, mean_local, var_local, label_local

    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(axis), P(axis), P(axis)),
        check_vma=False,
    )


def sharded_predict_weights_fn(mesh: Mesh, K: int, axis: str = "data"):
    """Sharded prediction with replicated m-dim dual weights: pred = C·w for
    any trained weight vector w living on the (masked) train rows — the
    shape of PG-Gibbs / whitened-HMC collapsed prediction
    (src/PGLogitModel.cpp:56-76).  w_local is the local shard of w (zeros at
    test rows); returns C[:, train]·w at every local row."""

    def fn(values, vectors_local, w_local, mask_local, t, sigma):
        phi = _phi(values, vectors_local, K, t)
        wm = w_local * mask_local
        pw = jax.lax.psum(pdot((phi * mask_local[:, None]).T, wm[:, None])[:, 0], axis)
        return pdot(phi, pw[:, None])[:, 0] + sigma * wm

    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
