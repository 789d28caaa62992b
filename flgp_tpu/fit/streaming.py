"""Out-of-core fits: X streams from disk, the graph stays on device.

The reference holds X (and dense distance matrices) fully in RAM
(src/Fit.cpp:123-129); FLGP exists to scale n (DESCRIPTION:7-12), so here X
may exceed host memory.  The key observation: only X is large — the ELL graph
(values + indices, n×2r numbers) and the (n, K) eigenvector store are tiny by
comparison and device-resident.  So the streamed pipeline makes exactly ONE
pass over the on-disk matrix (``native.MatrixFile`` + double-buffered
``StreamLoader``), builds each chunk's kNN + kernel weights on device while
the next chunk loads, and scatters them into preallocated device buffers with
donated updates.  Everything downstream (Laplacian normalization, Gram+eigh
spectrum, GPR/GPC tails) is the standard in-memory path — bit-identical to a
non-streamed fit (tested in tests/test_streaming.py).

Anchors for out-of-core data come from reservoir-sampled rows + on-device
k-means (``streamed_subsample``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FitConfig, GraphConfig, KernelType
from ..native import MatrixFile, StreamLoader
from ..ops.kmeans import SubsampleResult, kmeans
from ..ops.knn import knn
from ..ops.lae import lae_weights
from ..ops.laplacian import normalize_graph_laplacian
from ..ops.spectrum import spectrum_from_Z
from ..types import EigenPair, EllMatrix


def reservoir_sample(mat: MatrixFile, size: int, chunk_rows: int = 1 << 16,
                     seed: int = 0) -> np.ndarray:
    """Uniform sample of ``size`` rows in one streamed pass (Vitter's
    Algorithm R, vectorized per chunk)."""
    if size > mat.shape[0]:
        raise ValueError("matrix smaller than the requested sample")
    rng = np.random.default_rng(seed)
    sample = np.empty((size, mat.shape[1]), mat.dtype)
    seen = 0
    for lo, chunk in StreamLoader(mat, chunk_rows):
        if seen < size:  # fill the reservoir first
            take = min(size - seen, len(chunk))
            sample[seen : seen + take] = chunk[:take]
            seen += take
            chunk = chunk[take:]
        if len(chunk):
            idx = seen + np.arange(len(chunk))
            j = rng.integers(0, idx + 1)
            take = j < size
            sample[j[take]] = chunk[take]
            seen += len(chunk)
    return sample


def streamed_subsample(
    key: jax.Array,
    mat: MatrixFile,
    g: GraphConfig,
    sample_factor: int = 50,
    chunk_rows: int = 1 << 16,
) -> SubsampleResult:
    """Anchors for out-of-core X: k-means++ on a uniform row sample of
    ``sample_factor``·s rows (one streamed pass), then a streamed 1-NN count
    pass so cluster-normalized Laplacians see true cluster sizes."""
    sample = reservoir_sample(mat, min(sample_factor * g.s, mat.shape[0]), chunk_rows)
    sub = kmeans(key, jnp.asarray(sample), g.s, nstart=g.nstart, iters=g.kmeans_iters)
    counts = np.zeros((g.s,), np.float64)
    assign = jax.jit(lambda X, U: knn(X, U, 1).indices[:, 0])
    for lo, chunk in StreamLoader(mat, chunk_rows):
        lab = np.asarray(assign(jnp.asarray(chunk, sub.centers.dtype), sub.centers))
        counts += np.bincount(lab, minlength=g.s)
    return SubsampleResult(sub.centers, jnp.asarray(counts, sub.centers.dtype))


@functools.partial(jax.jit, static_argnames=("g",), donate_argnums=(0, 1))
def _scatter_chunk(vals, idx, chunk, anchors, lo, g: GraphConfig):
    res = knn(chunk, anchors, g.r)
    if g.kernel == KernelType.LAE:
        w = lae_weights(chunk, anchors, res.indices)
    else:
        w = jnp.exp(-res.sqdists / (4.0 * g.epsilon * g.epsilon))
    vals = jax.lax.dynamic_update_slice(vals, w, (lo, 0))
    idx = jax.lax.dynamic_update_slice(idx, res.indices, (lo, 0))
    return vals, idx


def streamed_ell_graph(
    mat: MatrixFile,
    anchors: jnp.ndarray,
    g: GraphConfig,
    chunk_rows: int = 1 << 16,
) -> EllMatrix:
    """One streamed pass X → device-resident ELL graph (n, r).

    Host IO (prefetch thread) overlaps device compute; the fixed chunk shape
    compiles once (the tail chunk is padded then truncated by the scatter)."""
    n, d = mat.shape
    dtype = anchors.dtype
    chunk_rows = min(chunk_rows, n)
    vals = jnp.zeros((n, g.r), dtype)
    idx = jnp.zeros((n, g.r), jnp.int32)
    for lo, chunk in StreamLoader(mat, chunk_rows):
        if chunk.shape[0] < chunk_rows:
            # tail: shift the window back to [n - chunk_rows, n) so the
            # compiled chunk shape is reused; the overlap rows recompute to
            # identical values
            lo = n - chunk_rows
            chunk = mat.read(lo, chunk_rows)
        vals, idx = _scatter_chunk(
            vals, idx, jnp.asarray(chunk, dtype), anchors, lo, g
        )
    return EllMatrix(vals, idx, anchors.shape[0])


def streamed_build_spectrum(
    key: jax.Array,
    mat: MatrixFile,
    g: GraphConfig,
    chunk_rows: int = 1 << 16,
    anchors: Optional[SubsampleResult] = None,
) -> Tuple[EigenPair, SubsampleResult]:
    """Out-of-core equivalent of fit.spectral.build_spectrum: X on disk, the
    spectrum on device.  Matches the in-memory result bit-for-bit given the
    same anchors."""
    sub = anchors if anchors is not None else streamed_subsample(key, mat, g, chunk_rows=chunk_rows)
    Z = streamed_ell_graph(mat, sub.centers, g, chunk_rows)
    Z = normalize_graph_laplacian(Z, g.gl, sub.counts)
    return spectrum_from_Z(Z, g.resolved_K(), g.root), sub


def fit_lae_regression_gp_streamed(
    key: jax.Array,
    mat: MatrixFile,
    Y_train: np.ndarray,
    train_idx: np.ndarray,
    cfg: FitConfig = FitConfig(sigma=1e-5),
    chunk_rows: int = 1 << 16,
):
    """Transductive GPR where the design matrix never fits in host memory:
    rows of ``mat`` are all points (train + test); ``train_idx`` marks the
    observed rows.  Returns (posterior mean at every row, trained params)."""
    import dataclasses

    from ..inference.optimize import GprOptResult  # noqa: F401 (re-export typing)
    from ..models import gpr as gpr_mod
    from .drivers import _train_gpr

    g = dataclasses.replace(cfg.graph, kernel=KernelType.LAE)
    eig, _ = streamed_build_spectrum(key, mat, g, chunk_rows)
    n = mat.shape[0]
    K = min(g.resolved_K(), g.s, n)
    Y = jnp.asarray(Y_train, cfg.dtype)
    idx = jnp.asarray(train_idx, jnp.int32)
    res = _train_gpr(eig, Y, idx, K, cfg)
    pred = gpr_mod.gpr_predict(eig, Y, idx, jnp.arange(n), K, res.t, res.noise, cfg.sigma)
    return pred, dict(t=res.t, noise=res.noise, obj=res.obj)
