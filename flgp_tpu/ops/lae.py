"""Local Anchor Embedding: batched simplex-constrained least squares.

Per data point the reference solves  min_z ‖x − zᵀU_i‖²  s.t. z ∈ Δ^{r-1}
over its r nearest anchors with Nesterov-accelerated projected gradient and
backtracking line search, one TBB task per point (src/lae.cpp:15-153).

TPU-native form: the objective is quadratic, so the backtracking condition
g(z) ≤ g̃(z) holds for any step 1/β with β ≥ λmax(U_iU_iᵀ).  We therefore run
fixed-iteration FISTA with a per-point Gershgorin bound on λmax — identical
unique minimizer, no data-dependent control flow, everything batched over all
n points at once (no vmap-of-scalar-loops; pure (n, r)-shaped tensor ops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import PRECISION


def project_simplex(v: jnp.ndarray) -> jnp.ndarray:
    """Euclidean projection of each row of v onto the probability simplex.

    Batched sort + cumulative-sum thresholding (src/lae.cpp:137-153).
    """
    r = v.shape[-1]
    u = jnp.sort(v, axis=-1)[..., ::-1]
    cssv = jnp.cumsum(u, axis=-1)
    k = jnp.arange(1, r + 1, dtype=v.dtype)
    cond = u - (cssv - 1.0) / k > 0
    # rho = largest k with cond true (cond is monotone in the sorted order)
    rho = jnp.sum(cond, axis=-1)
    rho = jnp.maximum(rho, 1)
    theta = (jnp.take_along_axis(cssv, (rho - 1)[..., None], axis=-1).squeeze(-1) - 1.0) / rho.astype(v.dtype)
    return jnp.maximum(v - theta[..., None], 0.0)


def lae_weights(
    X: jnp.ndarray,
    anchors: jnp.ndarray,
    knn_idx: jnp.ndarray,
    iters: int = 150,
) -> jnp.ndarray:
    """Anchor-embedding weights, shape (n, r): row i solves the simplex LSQ
    over anchors[knn_idx[i]].

    On TPU lowerings this dispatches to the fused Pallas FISTA kernel
    (ops.pallas_kernels.fused_lae): the iteration loop is the dominant cost
    of the whole spectral stage under XLA (150 sequential HBM passes;
    measured 1.73 s of 2.19 s at n=1e6 on v5e), and the fused kernel runs it
    in VMEM in a single pass.  Everywhere else: the XLA scan below.

    The choice is made per-lowering with ``lax.platform_dependent`` (not by
    inspecting the process-default device at trace time), so a CPU mesh in a
    TPU-default process — or a jit backend override — gets the right branch."""
    import functools as _ft

    from .pallas_kernels import _HAVE_PALLAS, fused_lae

    # x64 mode breaks Mosaic lowering (index maps and loop counters become
    # i64, which the TPU compiler rejects) — the f64 parity path takes the
    # XLA branch, where the fused kernel's speed is irrelevant anyway
    if not _HAVE_PALLAS or X.dtype != jnp.float32 or jax.config.jax_enable_x64:
        return lae_weights_xla(X, anchors, knn_idx, iters)
    return jax.lax.platform_dependent(
        X, anchors, knn_idx,
        tpu=_ft.partial(fused_lae, iters=iters, force=True),
        default=_ft.partial(lae_weights_xla, iters=iters),
    )


def lae_weights_xla(
    X: jnp.ndarray,
    anchors: jnp.ndarray,
    knn_idx: jnp.ndarray,
    iters: int = 150,
) -> jnp.ndarray:
    """Portable XLA implementation: FISTA with momentum schedule matching the
    reference's delta recursion (src/lae.cpp:97-130); step size 1/L with L a
    Gershgorin upper bound on λmax(U_iU_iᵀ).
    """
    Ui = anchors[knn_idx]                       # (n, r, d)
    G = jnp.einsum("nrd,nsd->nrs", Ui, Ui, precision=PRECISION)  # (n, r, r) Gram
    b = jnp.einsum("nd,nrd->nr", X, Ui, precision=PRECISION)     # (n, r)

    # Gershgorin bound: λmax ≤ max_i Σ_j |G_ij|;  jitter guards degenerate rows.
    L = jnp.max(jnp.sum(jnp.abs(G), axis=-1), axis=-1) + 1e-12  # (n,)
    inv_L = (1.0 / L)[:, None]

    r = knn_idx.shape[1]
    z0 = jnp.full_like(b, 1.0 / r)

    def body(carry, _):
        z_prev, z_curr, d_prev, d_curr = carry
        alpha = (d_prev - 1.0) / d_curr
        v = z_curr + alpha * (z_curr - z_prev)
        grad = jnp.einsum("nr,nrs->ns", v, G, precision=PRECISION) - b
        z_next = project_simplex(v - inv_L * grad)
        d_next = (1.0 + jnp.sqrt(1.0 + 4.0 * d_curr * d_curr)) / 2.0
        return (z_curr, z_next, d_curr, d_next), None

    (_, z, _, _), _ = jax.lax.scan(
        body, (z0, z0, jnp.asarray(0.0, X.dtype), jnp.asarray(1.0, X.dtype)), None, length=iters
    )
    return z
