"""Chunked feature-major spectral stage for huge point clouds (n ≳ 1e6).

TPU arrays tile the last two axes as (sublane, lane) = (8, 128); any
point-major array with a tiny minor dim pads its lanes to 128, so at n=1e7
the (n, 3) point cloud costs 5.1 GB, the (n, r) kNN indices another 5.1 GB,
and the (n, r, d) LAE anchor gather 20.5 GB — the round-2 bench OOM on a
16 GB chip.  Equally fatal (measured, round 3): *transposing* to a flat
feature-major (r, n) array — XLA materializes the transpose through a
lane-minor intermediate (r on the 128-lane axis, 42.7× padding → 3×4.78 GB
temps) — and 2-D gathers ``scale[idx_t]`` with an (r, n) index array, which
force the same transposed copies.

So the internal layout here is CHUNKED 3-D and never transposed:

    idx, w : (nch, r, c)   — point axis minor (c on lanes), r on sublanes,
                             chunks stacked on a leading axis by lax.map
    grams  : (nch, r², c)

exactly the order the one-pass builder emits.  Rules that keep the memory
honest (oracle-tested equal to ops.spectrum/ops.laplacian,
src/Spectrum.cpp:101-161 semantics, in tests/test_colmajor.py):

- every gather/scatter runs on flat 1-D views (1-D arrays have no lane
  padding and pairing is preserved by reshape);
- reductions over r use axis=-2 — no reshapes that move the point axis;
- the LAE FISTA loop runs in the fused Pallas kernel per chunk inside the
  map (``fused_lae_tiles``; XLA scan fallback off-TPU) — its operand layout
  constraint anchors the chunk buffers at row-major;
- Gram AᵀA and the eigenvector extension scatter each chunk into a dense
  (c, s) block and ride the MXU; the only O(n·K) arrays are the extension
  output and its tail-trim slice (K ≥ 128 ⇒ no lane padding).
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
    """FISTA on ONE chunk's feature-major inputs (r², c)/(r, c) → (r, c):
    Pallas on TPU lowerings, the XLA scan elsewhere.  Called inside the
    chunk map, so the Pallas operand layout constraint anchors the chunk
    buffers at row-major — no full-n G/b ever stacks up."""
    import functools as _ft

    from .pallas_kernels import _HAVE_PALLAS, fused_lae_tiles

    if not _HAVE_PALLAS or bt.dtype != jnp.float32 or bt.shape[-1] % 128:
        return _fista_t_xla(Gt, bt, iters)
    return jax.lax.platform_dependent(
        Gt, bt,
        tpu=_ft.partial(fused_lae_tiles, out_dtype=bt.dtype, iters=iters),
        default=_ft.partial(_fista_t_xla, iters=iters),
    )


def kmeans_anchors_colmajor(
    key: jax.Array,
    Xt: jnp.ndarray,
    s: int,
    n_sample: int = 1 << 17,
    nstart: int = 1,
    iters: int = 100,
) -> jnp.ndarray:
    """k-means anchors for a feature-major (d, n) cloud: k-means‖-seeded
    Lloyd on a uniform column sample of ``n_sample`` points (with
    replacement — immaterial at n ≫ n_sample).  This restores the
    reference's anchor semantics (src/Utils.cpp:37-56: k-means everywhere)
    on the huge-n path, where round-4's random-row anchors swung the n=1e7
    GPC error 2.8× across draws (VERDICT r4 §missing-2).

    The gather uses a 1-D column-index array (output (d, n_sample) stays
    lane-friendly); the (n_sample, d) transpose is a ~1.5 MB copy, nothing
    like the full-n transposes the module docstring forbids.  Jittable;
    returns (s, d) centers — full-n cluster sizes, when the
    CLUSTER_NORMALIZED Laplacian needs them, come from
    :func:`cluster_sizes_colmajor`."""
    from .kmeans import kmeans

    n = Xt.shape[1]
    k_idx, k_km = jax.random.split(key)
    cols = jax.random.randint(k_idx, (min(n_sample, n),), 0, n)
    Xs = Xt[:, cols].T
    return kmeans(k_km, Xs, s, nstart=nstart, iters=iters).centers


def cluster_sizes_colmajor(
    Xt: jnp.ndarray, centers: jnp.ndarray, chunk: int = 1 << 16
) -> jnp.ndarray:
    """Full-n 1-NN cluster counts for (d, n) input against (s, d) centers —
    the column the cluster-normalized Laplacian consumes
    (src/Utils.cpp:59-62), computed in the same chunked layout as
    :func:`build_graph_colmajor` (one fused-kNN r=1 pass, O(s) output)."""
    from .knn import knn

    d, n = Xt.shape
    s = centers.shape[0]
    chunk = min(chunk, ((n + 127) // 128) * 128)
    pad = (-n) % chunk
    Xp = jnp.pad(Xt, ((0, 0), (0, pad))) if pad else Xt
    nch = Xp.shape[1] // chunk

    def one(i):
        Xc = jax.lax.dynamic_slice(Xp, (0, i * chunk), (d, chunk))
        lab = knn(Xc.T, centers, 1).indices[:, 0]
        valid = (i * chunk + jnp.arange(chunk)) < n
        return jnp.zeros((s,), Xt.dtype).at[lab].add(valid.astype(Xt.dtype))

    return jnp.sum(jax.lax.map(one, jnp.arange(nch)), axis=0)


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

    Returns (idx (nch, r, c) int32, w (nch, r, c)) — the RAW (un-normalized)
    ELL graph in the chunked layout; pad points (beyond n) carry zero
    weights so every downstream sum ignores them.  ``epsilon_sq4`` is the SE
    denominator (4ε² or a2·d̄, src/Spectrum.cpp:132 / src/Fit.cpp:150)."""
    d, n = Xt.shape
    s = U.shape[0]
    kernel = KernelType(kernel)
    dtype = Xt.dtype
    chunk = min(chunk, ((n + 127) // 128) * 128)

    pad = (-n) % chunk
    Xp = jnp.pad(Xt, ((0, 0), (0, pad))) if pad else Xt
    npad = Xp.shape[1]
    nch = npad // chunk

    # Chunks are dynamic-sliced from the (d, npad) array inside the map, and
    # every per-chunk array is CONSTRUCTED feature-major — no `.T` anywhere
    # after the kNN: XLA's layout assignment propagates an in-chunk transpose
    # outward onto the stacked (nch, ·, c) scan buffers as an r-minor layout
    # (r on the 128-lane axis, 42.7× padding → 2×4.78 GB at n=1e7, measured).
    # Gathers are safe anchors: a gather's output shape IS its index shape.
    from .knn import knn

    def one(i):
        Xc = jax.lax.dynamic_slice(Xp, (0, i * chunk), (d, chunk))
        xc = Xc.T                                        # (c, d) — chunk-local
        # production kNN — the fused Pallas kernel on TPU lowerings.  An
        # inline matmul + lax.top_k here costs 360 s at n=1e6 (measured:
        # XLA's top_k lowering inside the chunk map serializes); the fused
        # kernel's iterative min-extraction does the same work in 0.11 s.
        res = knn(xc, U, r)
        idx = res.indices                                # (c, r)
        # feature-major arrays via r column-slices stacked on a NEW leading
        # axis (not a transpose of the (c, r) array)
        idx_t = jnp.stack([idx[:, k].astype(jnp.int32) for k in range(r)])
        if pad:
            # point j of chunk i is real iff i*c + j < n
            vc = (i * chunk + jnp.arange(chunk)) < n
        else:
            vc = None

        if kernel == KernelType.SE:
            d_t = jnp.stack([res.sqdists[:, k] for k in range(r)])
            wt = jnp.exp(jnp.minimum(-d_t, 0.0) / epsilon_sq4).astype(dtype)
            if vc is not None:
                wt = wt * vc[None, :].astype(dtype)
            return idx_t, wt
        # LAE terms from the gathered anchor rows — the small (s, d) table
        # gather fuses with the einsums; nothing (c, s)-sized touches HBM
        Ui = U[idx]                                      # (c, r, d)
        b_t = jnp.stack(
            [jnp.einsum("cd,cd->c", xc, Ui[:, k], precision=PRECISION) for k in range(r)]
        ).astype(dtype)
        G = jnp.einsum("crd,csd->crs", Ui, Ui, precision=PRECISION)
        G_t = jnp.stack(
            [G[:, a, b] for a in range(r) for b in range(r)]
        ).astype(dtype)
        w_t = _lae_weights_t(G_t, b_t, lae_iters).astype(dtype)
        if vc is not None:
            w_t = w_t * vc[None, :].astype(dtype)
        return idx_t, w_t

    return jax.lax.map(one, jnp.arange(nch))


def normalize_colmajor(
    idx: jnp.ndarray,
    w: jnp.ndarray,
    s: int,
    gl: LaplacianType,
    cluster_sizes: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Graph-Laplacian normalization — identical semantics to
    ops.laplacian.normalize_graph_laplacian (src/Utils.cpp:195-212).

    Accepts any layout with r on axis −2 and points on axis −1: the chunked
    (nch, r, c) form or a flat (r, n).  All gathers/scatters run on flat
    1-D views (2-D gathers with an (r, ·) index array make XLA materialize
    lane-transposed copies — 42.7× padding at n=1e7)."""
    gl = LaplacianType(gl)
    shape = w.shape
    if gl != LaplacianType.RW:
        flat_idx = idx.reshape(-1)
        flat_w = w.reshape(-1)
        colsum = jnp.zeros((s,), w.dtype).at[flat_idx].add(flat_w)
        scale = 1.0 / (colsum + EPS)
        if gl == LaplacianType.CLUSTER_NORMALIZED:
            if cluster_sizes is None:
                raise ValueError("cluster-normalized Laplacian requires cluster sizes")
            scale = scale * cluster_sizes.astype(w.dtype)
        w = (flat_w * scale[flat_idx]).reshape(shape)
    rowsum = jnp.sum(w, axis=-2, keepdims=True)
    return w / (rowsum + EPS)


def spectrum_colmajor(
    idx: jnp.ndarray,
    w: jnp.ndarray,
    s: int,
    K: int,
    root: bool,
    n: int,
    gram_block: int = 1 << 15,
) -> EigenPair:
    """Top-K spectrum of W = Z·D⁻¹·Zᵀ from the chunked ELL graph — the exact
    Gram+eigh re-design of spectrum_from_Z (src/Spectrum.cpp:146-161).

    ``idx``/``w`` are (nch, r, c) (a flat (r, n) is accepted as one chunk);
    ``n`` is the REAL point count (pad points must carry zero weights).
    Each chunk scatters into dense (≤gram_block, s) blocks for the MXU
    Gram accumulation and eigenvector extension."""
    if idx.ndim == 2:
        idx, w = idx[None], w[None]
    nch, r, c = idx.shape
    dtype = w.dtype

    flat_idx = idx.reshape(-1)
    flat_w = w.reshape(-1)
    colsum = jnp.zeros((s,), dtype).at[flat_idx].add(flat_w)
    cinv = 1.0 / jnp.sqrt(jnp.abs(colsum) + EPS)
    a = (flat_w * cinv[flat_idx]).reshape(nch, r, c)  # A = Z·diag(colsum)^(-1/2)
    # barrier: `a` is read by BOTH the Gram scan and the extension map —
    # keep XLA from rematerializing the full-n gather inside each scan step
    a = jax.lax.optimization_barrier(a)

    # sub-block the chunk columns so the dense scatter block stays
    # O(gram_block·s) regardless of the build chunk size
    n_sub = max(1, -(-c // gram_block))
    sub = -(-c // n_sub)
    col_slices = [slice(j * sub, min((j + 1) * sub, c)) for j in range(n_sub)]

    def dense_of(ic, ac, sl):
        cols = sl.stop - sl.start
        rows = jnp.broadcast_to(jnp.arange(cols)[None, :], (r, cols))
        return jnp.zeros((cols, s), dtype).at[rows, ic[:, sl]].add(ac[:, sl])

    def gram_body(acc, blk):
        ic, ac = blk
        for sl in col_slices:
            dense = dense_of(ic, ac, sl)
            acc = acc + jnp.matmul(dense.T, dense, precision=PRECISION)
        return acc, None

    G, _ = jax.lax.scan(gram_body, jnp.zeros((s, s), dtype), (idx, a))
    wv, V = jnp.linalg.eigh(G)
    wv = wv[::-1][:K]
    V = V[:, ::-1][:, :K]
    sigma2 = jnp.maximum(wv, 0.0)
    sigma = jnp.sqrt(sigma2)

    # Eigenvector extension — vectors = A·(V·σ⁻¹·√n); the σ⁻¹/√n rescale is
    # folded into V so the only O(n·K) arrays are the map output and its
    # tail-trim slice.  Same dense-scatter MXU pattern as the Gram.
    V_ext = V * (jnp.sqrt(jnp.asarray(n, dtype)) / (sigma + EPS))[None, :]

    def ext_body(blk):
        ic, ac = blk
        outs = [
            jnp.matmul(dense_of(ic, ac, sl), V_ext, precision=PRECISION)
            for sl in col_slices
        ]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    vectors = jax.lax.map(ext_body, (idx, a)).reshape(nch * c, K)[:n]
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
    with peak HBM O(n·r) + the (n, K) output instead of O(n·128-padded
    lanes)."""
    n = Xt.shape[1]
    s = U.shape[0]
    gl = LaplacianType(gl)
    idx_c, w_c = build_graph_colmajor(Xt, U, r, kernel, epsilon_sq4, lae_iters, chunk)
    # stage barriers: without them XLA rematerializes the expensive build
    # (kNN + 150-iteration FISTA) inside the downstream Gram/extension scans
    # — measured 461 s fused vs 24 s staged for the identical n=1e7 program
    idx_c, w_c = jax.lax.optimization_barrier((idx_c, w_c))

    def _fallback(idx_c, w_c, csz):
        sizes = csz if gl == LaplacianType.CLUSTER_NORMALIZED else None
        wn = normalize_colmajor(idx_c, w_c, s, gl, sizes)
        idx2, wn = jax.lax.optimization_barrier((idx_c, wn))
        return spectrum_colmajor(idx2, wn, s, K, root, n)

    from .pallas_kernels import (
        _HAVE_PALLAS,
        ell_colsum_t,
        ell_norm_gram_t,
        ell_norm_matmat_t,
    )

    # Fused one-hot tail on TPU lowerings (round 5): the scatter-based
    # normalize + colsum + dense-scatter Gram measured 2.1 s of the 3.7 s
    # n=1e7 stage — the feature-major kernel variants stream the chunked
    # (nch, r, c) arrays once per pass with VMEM accumulators, identical
    # reassociated math to the composition (see ops.spectrum.spectrum_fused).
    if (
        not _HAVE_PALLAS
        or w_c.dtype != jnp.float32
        or jax.config.jax_enable_x64
        or w_c.shape[2] % 1024  # kernel block must divide the chunk columns
    ):
        return _fallback(idx_c, w_c, cluster_sizes)

    def _fused(idx_c, w_c, csz):
        if gl == LaplacianType.RW:
            cscale = jnp.ones((s,), w_c.dtype)
        else:
            C = ell_colsum_t(w_c, idx_c, s)
            cscale = 1.0 / (C + EPS)
            if gl == LaplacianType.CLUSTER_NORMALIZED:
                cscale = cscale * csz.astype(w_c.dtype)
        Ghat, D = ell_norm_gram_t(w_c, idx_c, cscale, eps=EPS)
        dinv = 1.0 / jnp.sqrt(jnp.abs(D) + EPS)
        G = Ghat * dinv[:, None] * dinv[None, :]
        wv, V = jnp.linalg.eigh(G)
        wv = wv[::-1][:K]
        V = V[:, ::-1][:, :K]
        sigma2 = jnp.maximum(wv, 0.0)
        sigma = jnp.sqrt(sigma2)
        W_eff = dinv[:, None] * V * (
            jnp.sqrt(jnp.asarray(n, w_c.dtype)) / (sigma + EPS)
        )[None, :]
        vectors = ell_norm_matmat_t(w_c, idx_c, cscale, W_eff, eps=EPS)[:n]
        return EigenPair(sigma if root else sigma2, vectors)

    csz = (
        jnp.ones((s,), w_c.dtype) if cluster_sizes is None
        else cluster_sizes.astype(w_c.dtype)
    )
    return jax.lax.platform_dependent(
        idx_c, w_c, csz, tpu=_fused, default=_fallback
    )
