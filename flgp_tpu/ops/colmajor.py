"""Feature-major spectral stage for huge point clouds (single chip, n ≳ 1e6).

TPU arrays tile the last two axes as (sublane, lane) = (8, 128); any
point-major array with a tiny minor dim pads its lanes to 128, so at n=1e7
the (n, 3) point cloud costs 5.1 GB, the (n, r) kNN indices another 5.1 GB,
and the (n, r, d) LAE anchor gather 20.5 GB — the round-2 bench OOM on a
16 GB chip.  This module keeps the POINT axis minor everywhere: X is (d, n),
kNN indices (r, n), weights (r, n), LAE Grams (r², n).  The same graph +
spectrum pipeline as ops.spectrum/ops.laplacian (src/Spectrum.cpp:101-161
semantics, oracle-tested equal in tests/test_colmajor.py) then costs
O(n·r·4B) real HBM plus O(chunk) transients:

- pass 1 (lax.map over point chunks): distances on the MXU → top-r indices,
  SE weights or LAE Gram/linear terms, emitted pre-transposed.
- LAE weights: the fused Pallas FISTA kernel over the full (r², n) tiles
  (one HBM pass; XLA scan fallback off-TPU).
- normalization + colsum: flat segment-sums over (r·n,) — no padding.
- Gram AᵀA: chunked dense (chunk, s) scatter + MXU accumulation; one eigh.
- eigenvector extension: chunked gather-einsum into the honest (n, K) output
  (K ≥ 128 ⇒ no lane padding), exactly √n-scaled as spectrum_from_Z.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import EPS, PRECISION, KernelType, LaplacianType
from ..types import EigenPair


def _fista_t_xla(Gt: jnp.ndarray, bt: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Portable FISTA on feature-major inputs: Gt (r², n), bt (r, n) →
    simplex weights (r, n).  Same math as ops.lae.lae_weights_xla
    (src/lae.cpp:97-130 semantics), transposed."""
    r, n = bt.shape
    G = Gt.reshape(r, r, n)

    L = jnp.max(jnp.sum(jnp.abs(G), axis=1), axis=0) + 1e-12   # Gershgorin, (n,)
    inv_L = (1.0 / L)[None, :]

    def project_simplex_t(v):
        # Euclidean simplex projection along axis 0 (src/lae.cpp:137-153)
        u = jnp.sort(v, axis=0)[::-1]
        cssv = jnp.cumsum(u, axis=0)
        k = jnp.arange(1, r + 1, dtype=v.dtype)[:, None]
        cond = u - (cssv - 1.0) / k > 0
        rho = jnp.maximum(jnp.sum(cond, axis=0), 1)
        theta = (
            jnp.take_along_axis(cssv, (rho - 1)[None, :], axis=0)[0] - 1.0
        ) / rho.astype(v.dtype)
        return jnp.maximum(v - theta[None, :], 0.0)

    z0 = jnp.full_like(bt, 1.0 / r)

    def body(carry, _):
        z_prev, z_curr, d_prev, d_curr = carry
        alpha = (d_prev - 1.0) / d_curr
        v = z_curr + alpha * (z_curr - z_prev)
        grad = jnp.einsum("rn,rsn->sn", v, G, precision=PRECISION) - bt
        z_next = project_simplex_t(v - inv_L * grad)
        d_next = (1.0 + jnp.sqrt(1.0 + 4.0 * d_curr * d_curr)) / 2.0
        return (z_curr, z_next, d_curr, d_next), None

    (_, z, _, _), _ = jax.lax.scan(
        body, (z0, z0, jnp.asarray(0.0, bt.dtype), jnp.asarray(1.0, bt.dtype)),
        None, length=iters,
    )
    return z


def _lae_weights_t(Gt: jnp.ndarray, bt: jnp.ndarray, iters: int) -> jnp.ndarray:
    """FISTA on feature-major inputs, Pallas on TPU lowerings (per-lowering
    dispatch, as ops.lae.lae_weights)."""
    import functools as _ft

    from .pallas_kernels import _HAVE_PALLAS, fused_lae_tiles

    if not _HAVE_PALLAS or bt.dtype != jnp.float32:
        return _fista_t_xla(Gt, bt, iters)
    return jax.lax.platform_dependent(
        Gt, bt,
        tpu=_ft.partial(fused_lae_tiles, out_dtype=bt.dtype, iters=iters),
        default=_ft.partial(_fista_t_xla, iters=iters),
    )


def build_graph_colmajor(
    Xt: jnp.ndarray,
    U: jnp.ndarray,
    r: int,
    kernel: KernelType = KernelType.LAE,
    epsilon_sq4: jnp.ndarray | None = None,
    lae_iters: int = 150,
    chunk: int = 1 << 16,
) -> tuple:
    """kNN + kernel weights for Xt (d, n) against anchors U (s, d).

    Returns (idx_t (r, npad) int32, w_t (r, npad)) — the RAW (un-normalized)
    ELL graph in feature-major layout, padded to a chunk multiple; pad
    columns carry zero weights so every downstream sum ignores them.
    ``epsilon_sq4`` is the SE denominator (4ε² or a2·d̄,
    src/Spectrum.cpp:132 / src/Fit.cpp:150)."""
    d, n = Xt.shape
    s = U.shape[0]
    kernel = KernelType(kernel)
    dtype = Xt.dtype

    u2 = jnp.sum(U * U, axis=1)
    # per-row Gram table: G entries become two flat gathers, so the (n, r, d)
    # anchor gather (the 20.48 GB allocation of round 2) never exists
    UUt = jnp.matmul(U, U.T, precision=PRECISION)

    pad = (-n) % chunk
    Xp = jnp.pad(Xt, ((0, 0), (0, pad))) if pad else Xt
    npad = Xp.shape[1]
    chunks = jnp.moveaxis(Xp.reshape(d, npad // chunk, chunk), 1, 0)  # (nch, d, chunk)

    def one(Xc):
        xc = Xc.T                                        # (chunk, d)
        XU = jnp.matmul(xc, U.T, precision=PRECISION)    # (chunk, s) — MXU
        x2 = jnp.sum(xc * xc, axis=1)
        dist = x2[:, None] - 2.0 * XU + u2[None, :]
        neg, idx = jax.lax.top_k(-dist, r)
        idx = idx.astype(jnp.int32)
        if kernel == KernelType.SE:
            w = jnp.exp(jnp.minimum(neg, 0.0) / epsilon_sq4)
            return idx.T, w.T.astype(dtype)
        # LAE terms: b from the already-computed XU, G from the UUt table
        b = jnp.take_along_axis(XU, idx, axis=1)         # (chunk, r)
        Gflat = UUt.reshape(-1)[
            (idx[:, :, None] * s + idx[:, None, :]).reshape(-1, r * r)
        ]                                                # (chunk, r²)
        return idx.T, Gflat.T.astype(dtype), b.T.astype(dtype)

    if kernel == KernelType.SE:
        idxs, ws = jax.lax.map(one, chunks)
        idx_t = jnp.moveaxis(idxs, 0, 1).reshape(r, npad)
        w_t = jnp.moveaxis(ws, 0, 1).reshape(r, npad)
    else:
        idxs, Gs, bs = jax.lax.map(one, chunks)
        idx_t = jnp.moveaxis(idxs, 0, 1).reshape(r, npad)
        Gt = jnp.moveaxis(Gs, 0, 1).reshape(r * r, npad)
        bt = jnp.moveaxis(bs, 0, 1).reshape(r, npad)
        w_t = _lae_weights_t(Gt, bt, lae_iters).astype(dtype)

    if pad:
        # zero pad-row weights: they then contribute nothing to any colsum,
        # Gram, or extension; their rows are sliced off at the end
        valid = (jnp.arange(npad) < n)[None, :]
        w_t = jnp.where(valid, w_t, 0.0)
    return idx_t, w_t


def normalize_colmajor(
    idx_t: jnp.ndarray,
    w_t: jnp.ndarray,
    s: int,
    gl: LaplacianType,
    cluster_sizes: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Graph-Laplacian normalization on the feature-major ELL graph —
    identical semantics to ops.laplacian.normalize_graph_laplacian
    (src/Utils.cpp:195-212), flat segment-sums instead of (n, r) gathers."""
    gl = LaplacianType(gl)
    if gl != LaplacianType.RW:
        colsum = jnp.zeros((s,), w_t.dtype).at[idx_t.reshape(-1)].add(w_t.reshape(-1))
        scale = 1.0 / (colsum + EPS)
        if gl == LaplacianType.CLUSTER_NORMALIZED:
            if cluster_sizes is None:
                raise ValueError("cluster-normalized Laplacian requires cluster sizes")
            scale = scale * cluster_sizes.astype(w_t.dtype)
        w_t = w_t * scale[idx_t]
    rowsum = jnp.sum(w_t, axis=0)
    return w_t / (rowsum + EPS)[None, :]


def spectrum_colmajor(
    idx_t: jnp.ndarray,
    w_t: jnp.ndarray,
    s: int,
    K: int,
    root: bool,
    n: int,
    gram_chunk: int = 1 << 15,
) -> EigenPair:
    """Top-K spectrum of W = Z·D⁻¹·Zᵀ from the feature-major ELL graph —
    the exact Gram+eigh re-design of spectrum_from_Z (src/Spectrum.cpp:146-161),
    chunked so no point-major intermediate exceeds O(gram_chunk·s).

    ``n`` is the REAL point count (pad columns must carry zero weights)."""
    r, npad = idx_t.shape
    dtype = w_t.dtype

    colsum = jnp.zeros((s,), dtype).at[idx_t.reshape(-1)].add(w_t.reshape(-1))
    cinv = 1.0 / jnp.sqrt(jnp.abs(colsum) + EPS)
    a_t = w_t * cinv[idx_t]                       # A = Z·diag(colsum)^(-1/2)

    pad = (-npad) % gram_chunk
    if pad:
        a_t = jnp.pad(a_t, ((0, 0), (0, pad)))
        idx_t = jnp.pad(idx_t, ((0, 0), (0, pad)))
    npc = a_t.shape[1]
    a_ch = jnp.moveaxis(a_t.reshape(r, npc // gram_chunk, gram_chunk), 1, 0)
    i_ch = jnp.moveaxis(idx_t.reshape(r, npc // gram_chunk, gram_chunk), 1, 0)
    rows = jnp.broadcast_to(jnp.arange(gram_chunk)[None, :], (r, gram_chunk))

    def gram_body(acc, blk):
        ic, ac = blk
        dense = jnp.zeros((gram_chunk, s), dtype).at[rows, ic].add(ac)
        return acc + jnp.matmul(dense.T, dense, precision=PRECISION), None

    G, _ = jax.lax.scan(gram_body, jnp.zeros((s, s), dtype), (i_ch, a_ch))
    w, V = jnp.linalg.eigh(G)
    w = w[::-1][:K]
    V = V[:, ::-1][:, :K]
    sigma2 = jnp.maximum(w, 0.0)
    sigma = jnp.sqrt(sigma2)

    # Eigenvector extension: ONE preallocated (n, K) output updated in place
    # (XLA donates the fori_loop carry).  The earlier lax.map + [:n] slice +
    # rescale version held THREE (n, K) ≈ 5.1 GB buffers at n=1e7/K=128 and
    # OOMed the 16 GB chip mid-execution; here the σ⁻¹·√n rescale is folded
    # into V so the loop body writes final values, and the tail chunk uses
    # the shifted-window trick (overlap rows recompute to identical values).
    V_ext = V * (jnp.sqrt(jnp.asarray(n, dtype)) / (sigma + EPS))[None, :]
    c = min(gram_chunk, n)
    n_blocks = -(-n // c)

    def ext_block(i, out):
        start = jnp.minimum(i * c, n - c)
        ic = jax.lax.dynamic_slice(idx_t, (0, start), (r, c))
        ac = jax.lax.dynamic_slice(a_t, (0, start), (r, c))
        blk = jnp.einsum("rc,rck->ck", ac, V_ext[ic], precision=PRECISION)
        return jax.lax.dynamic_update_slice(out, blk, (start, 0))

    vectors = jax.lax.fori_loop(0, n_blocks, ext_block, jnp.zeros((n, K), dtype))
    values = sigma if root else sigma2
    return EigenPair(values, vectors)


def heat_kernel_spectrum_colmajor(
    Xt: jnp.ndarray,
    U: jnp.ndarray,
    r: int,
    K: int,
    gl: LaplacianType = LaplacianType.NORMALIZED,
    root: bool = True,
    kernel: KernelType = KernelType.LAE,
    epsilon_sq4: jnp.ndarray | None = None,
    cluster_sizes: jnp.ndarray | None = None,
    lae_iters: int = 150,
    chunk: int = 1 << 16,
) -> EigenPair:
    """Full graph → normalize → spectrum pipeline on (d, n) input: the
    huge-n equivalent of ops.spectrum.cross_similarity_* + spectrum_from_Z
    with peak HBM O(n·r) instead of O(n·128-padded-lanes)."""
    n = Xt.shape[1]
    s = U.shape[0]
    idx_t, w_t = build_graph_colmajor(
        Xt, U, r, kernel, epsilon_sq4, lae_iters, chunk
    )
    w_t = normalize_colmajor(idx_t, w_t, s, gl, cluster_sizes)
    return spectrum_colmajor(idx_t, w_t, s, K, root, n, gram_chunk=min(chunk, 1 << 15))
