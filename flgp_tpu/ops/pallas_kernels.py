"""Pallas TPU kernels for the spectral stage's bandwidth-bound ops.

Two custom kernels where XLA's default lowering leaves bandwidth on the
table; both have jnp fallbacks (used automatically off-TPU) and are validated
against them in tests/test_pallas.py on real hardware.

1. ``fused_knn``: block-rows of X stream through VMEM, distances to the full
   anchor set are computed on the MXU, and the r smallest are extracted
   in-register — the (block, s) distance tile never round-trips to HBM
   (XLA's top_k lowering materializes the full (n, s) matrix).

2. ``ell_matmat``: Z @ W for the ELL layout with the (n, r) index block
   scalar-prefetched so row gathers of W overlap the compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# fused kNN: distances + top-r extraction per row block
# ---------------------------------------------------------------------------


def _knn_kernel(x_ref, u_ref, u2_ref, idx_ref, d_ref, *, r: int):
    """One row-block: d = |x|² − 2xUᵀ + |u|², then r iterative min-extracts.

    r is small (3 in every reference config) so sequential extraction beats a
    full sort; each pass is a masked row-min on the VPU.
    """
    x = x_ref[:]                               # (B, d)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    d = x2 - 2.0 * jnp.dot(x, u_ref[:].T, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    d = d + u2_ref[:]                          # (B, s)
    s = d.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, d.shape, dimension=1)

    taken = jnp.zeros_like(d, dtype=jnp.bool_)
    for k in range(r):
        masked = jnp.where(taken, jnp.inf, d)
        dmin = jnp.min(masked, axis=1, keepdims=True)
        # first column achieving the min
        is_min = masked == dmin
        first = jnp.min(jnp.where(is_min, col_ids, s), axis=1, keepdims=True)
        idx_ref[:, k] = first[:, 0]
        d_ref[:, k] = dmin[:, 0]
        taken = jnp.logical_or(taken, col_ids == first)


def fused_knn(X: jnp.ndarray, U: jnp.ndarray, r: int, block: int = 512,
              interpret: bool = False):
    """TPU fused kNN; falls back to the matmul+top_k path off-TPU.

    ``interpret=True`` runs the kernel through the Pallas interpreter on any
    backend (correctness tests off-hardware)."""
    from .knn import knn as knn_fallback

    if not (_HAVE_PALLAS and (_on_tpu() or interpret)):
        return knn_fallback(X, U, r)

    n, d = X.shape
    s = U.shape[0]
    pad = (-n) % block
    Xp = jnp.pad(X, ((0, pad), (0, 0))) if pad else X
    u2 = jnp.sum(U * U, axis=1)[None, :]

    idx, dists = pl.pallas_call(
        functools.partial(_knn_kernel, r=r),
        grid=(Xp.shape[0] // block,),
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Xp.shape[0], r), jnp.int32),
            jax.ShapeDtypeStruct((Xp.shape[0], r), X.dtype),
        ],
        interpret=interpret,
    )(Xp, U, u2)

    from .knn import KnnResult

    return KnnResult(idx[:n], dists[:n])


# ---------------------------------------------------------------------------
# ELL matmat: Z @ W with streamed row blocks
# ---------------------------------------------------------------------------


def _ell_matmat_kernel(vals_ref, idx_ref, w_ref, out_ref, *, r: int):
    acc = jnp.zeros(out_ref.shape, dtype=jnp.float32)
    w = w_ref[:]
    for k in range(r):
        cols = idx_ref[:, k]
        acc = acc + vals_ref[:, k][:, None] * w[cols]
    out_ref[:] = acc.astype(out_ref.dtype)


def ell_matmat(values: jnp.ndarray, indices: jnp.ndarray, W: jnp.ndarray, block: int = 1024,
               interpret: bool = False):
    """(n, s)-ELL @ (s, K) on TPU; jnp gather fallback elsewhere."""
    n, r = values.shape
    s, K = W.shape
    if not (_HAVE_PALLAS and (_on_tpu() or interpret)):
        return jnp.einsum("nr,nrk->nk", values, W[indices])

    pad = (-n) % block
    vp = jnp.pad(values, ((0, pad), (0, 0))) if pad else values
    ip = jnp.pad(indices, ((0, pad), (0, 0))) if pad else indices

    out = pl.pallas_call(
        functools.partial(_ell_matmat_kernel, r=r),
        grid=(vp.shape[0] // block,),
        in_specs=[
            pl.BlockSpec((block, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vp.shape[0], K), W.dtype),
        interpret=interpret,
    )(vp, ip, W)
    return out[:n]
