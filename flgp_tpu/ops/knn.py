"""Brute-force batched k-nearest-neighbors against the anchor set.

The reference does per-row std::partial_sort over an (n, s) distance matrix
under TBB (src/Utils.cpp:72-192).  The TPU-native form is one MXU matmul for
the distances plus ``lax.top_k`` on the negated distances — fixed shapes, no
data-dependent control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .distance import sqdist


class KnnResult(NamedTuple):
    indices: jnp.ndarray    # (n, r) int32 — columns of the r nearest anchors
    sqdists: jnp.ndarray    # (n, r) — squared distances (reference keeps d², src/Utils.cpp:165)


def knn(X: jnp.ndarray, U: jnp.ndarray, r: int, block: int = 8192) -> KnnResult:
    """r nearest anchors (by squared Euclidean distance) for each row of X.

    On TPU lowerings with an anchor set that fits VMEM, dispatches to the
    fused Pallas kernel (distances + top-r extraction never round-trip the
    (block, s) tile to HBM); the XLA matmul+top_k path everywhere else.
    Decided per-lowering via ``lax.platform_dependent``.

    Ties are broken by anchor index (top_k is stable, and the fused kernel
    extracts the first column achieving each minimum), matching
    partial_sort's behavior on strict-weak ordering closely enough for
    downstream use.
    """
    import functools as _ft

    from .pallas_kernels import _HAVE_PALLAS, fused_knn

    s, d = U.shape
    if (
        _HAVE_PALLAS
        and X.dtype == jnp.float32
        and not jax.config.jax_enable_x64  # Mosaic rejects the i64 index
                                           # maps/counters x64 mode produces
        and s <= 4096              # (512, s) distance tile + (s, d) anchors in VMEM
        and d <= 256
        and r <= 16
    ):
        return jax.lax.platform_dependent(
            X, U,
            tpu=_ft.partial(fused_knn, r=r, force=True),
            default=_ft.partial(knn_xla, r=r, block=block),
        )
    return knn_xla(X, U, r, block)


def knn_xla(X: jnp.ndarray, U: jnp.ndarray, r: int, block: int = 8192) -> KnnResult:
    """Portable XLA kNN: blocked (n, s) distance matmul + ``lax.top_k``."""
    n = X.shape[0]

    def one_block(xb: jnp.ndarray) -> KnnResult:
        d = sqdist(xb, U)
        neg, idx = jax.lax.top_k(-d, r)
        return KnnResult(idx.astype(jnp.int32), -neg)

    if n <= block:
        return one_block(X)

    pad = (-n) % block
    Xp = jnp.pad(X, ((0, pad), (0, 0)))
    blocks = Xp.reshape(-1, block, X.shape[1])
    res = jax.lax.map(one_block, blocks)
    return KnnResult(
        res.indices.reshape(-1, r)[:n],
        res.sqdists.reshape(-1, r)[:n],
    )
