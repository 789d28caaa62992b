"""Distributed spectral pipeline: n-axis sharding over a device mesh.

The n-point axis (rows of X, Z, and the (n, K) eigenvector store) shards over
the ``data`` mesh axis; anchors, column statistics, and the (s, s) Gram are
replicated.  Exactly two collectives build the full spectrum:

    psum(column-sums of the local Z shard)   → Laplacian normalization
    psum(local Gram AᵀA contributions)       → one replicated eigh

kNN, LAE, row normalization and the final U = A·V·Σ⁻¹ are purely local.  The
(n, K) eigenvectors never materialize on one device — prediction and NMLL
reductions ride further psums.  This is the "sequence-parallel" analogue for
this workload (SURVEY §5: the scaling axis is n).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import EPS, GraphConfig, KernelType, LaplacianType
from ..ops.knn import knn
from ..ops.linalg import pdot
from ..ops.lae import lae_weights
from ..types import EigenPair, EllMatrix


def _local_ell(X_local, anchors, g: GraphConfig):
    """Local shard of Z: kNN + kernel weights on this device's rows."""
    res = knn(X_local, anchors, g.r)
    if g.kernel == KernelType.LAE:
        vals = lae_weights(X_local, anchors, res.indices)
    else:
        vals = jnp.exp(-res.sqdists / (4.0 * g.epsilon * g.epsilon))
    return EllMatrix(vals, res.indices, g.s)


def _spectrum_from_local_ell(Z: EllMatrix, counts, g: GraphConfig, K: int, axis: str):
    """Shared tail: normalize a row-sharded ELL graph and extract the
    spectrum — two psums (column stats, Gram), one replicated eigh."""
    if g.gl in (LaplacianType.NORMALIZED, LaplacianType.CLUSTER_NORMALIZED):
        col = jax.lax.psum(Z.colsum(), axis)
        Z = Z.scale_cols(1.0 / (col + EPS))
        if g.gl == LaplacianType.CLUSTER_NORMALIZED:
            Z = Z.scale_cols(counts.astype(Z.dtype))
    Z = Z.scale_rows(1.0 / (Z.rowsum() + EPS))

    colsum = jax.lax.psum(Z.colsum(), axis)
    A = Z.scale_cols(1.0 / jnp.sqrt(jnp.abs(colsum) + EPS))
    G = jax.lax.psum(A.gram(), axis)
    w, V = jnp.linalg.eigh(G)
    w = w[::-1][:K]
    V = V[:, ::-1][:, :K]
    sigma2 = jnp.maximum(w, 0.0)
    sigma = jnp.sqrt(sigma2)
    U_local = A.matmat(V) / (sigma[None, :] + EPS)
    n_total = jax.lax.psum(jnp.asarray(Z.shape[0], U_local.dtype), axis)
    values = sigma if g.root else sigma2
    vectors_local = U_local * jnp.sqrt(n_total)
    return values, vectors_local


def sharded_spectrum_fn(mesh: Mesh, g: GraphConfig, axis: str = "data"):
    """Returns a shard_mapped function (X_shard, anchors, counts) → spectrum.

    Output: (values replicated, vectors sharded on rows)."""
    K = g.resolved_K()

    def fn(X_local, anchors, counts):
        Z = _local_ell(X_local, anchors, g)
        return _spectrum_from_local_ell(Z, counts, g, K, axis)

    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=(P(), P(axis)),
        check_vma=False,
    )


def sharded_spectrum_from_ell_fn(mesh: Mesh, g: GraphConfig, axis: str = "data"):
    """Spectrum from a row-sharded, already-built ELL graph (vals, idx) —
    the entry point for the out-of-core path, where fit.streaming builds the
    graph chunk-by-chunk from disk and X never materializes
    (SURVEY §7 step 6)."""
    K = g.resolved_K()
    s = g.s

    def fn(vals_local, idx_local, counts):
        Z = EllMatrix(vals_local, idx_local, s)
        return _spectrum_from_local_ell(Z, counts, g, K, axis)

    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(), P(axis)),
        check_vma=False,
    )


def sharded_gpr_nmll_fn(mesh: Mesh, K: int, sigma: float, axis: str = "data"):
    """Woodbury GPR NMLL with the (n, K) eigenvector store left sharded.

    Observed-row selection is by a sharded {0,1} mask (the transductive
    train/test split); every reduction over rows is a masked psum, so the
    objective works at any n without gathering V.  Matches the reference's
    m>K branch algebra (src/train.cpp:393-433).
    """

    def fn(values, vectors_local, Y_local, mask_local, t, noise):
        lam = 1.0 - values[:K]
        lam_sqrt = jnp.exp(-0.5 * t * lam)
        Vm = vectors_local[:, :K] * mask_local[:, None]
        z = noise + sigma
        VtV = jax.lax.psum(pdot(Vm.T, Vm), axis)
        Q = lam_sqrt[:, None] * VtV * lam_sqrt[None, :] / z
        Q = Q + jnp.eye(K, dtype=Q.dtype)
        L_Q = jnp.linalg.cholesky(Q)
        Ym = Y_local * mask_local
        VtY = jax.lax.psum(pdot(Vm.T, Ym[:, None])[:, 0], axis)
        rhs = lam_sqrt * (VtY / z)
        sol = jax.scipy.linalg.cho_solve((L_Q, True), rhs)
        # alpha = (Y - V Λ^{1/2} Q⁻¹ Λ^{1/2} Vᵀ Y / z) / z   (local rows)
        alpha_local = (Ym - pdot(Vm, (lam_sqrt * sol)[:, None])[:, 0]) / z
        quad = jax.lax.psum(jnp.sum(Ym * alpha_local), axis)
        m = jax.lax.psum(jnp.sum(mask_local), axis)
        nmll = 0.5 * quad
        nmll = nmll + jnp.sum(jnp.log(jnp.diagonal(L_Q) + EPS))
        nmll = nmll + 0.5 * m * jnp.log(z)
        return nmll

    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(),
        check_vma=False,
    )


def sharded_predict_fn(mesh: Mesh, K: int, sigma: float, axis: str = "data"):
    """Posterior-mean prediction at every (sharded) row given the sharded
    basis and observed mask — the transductive predict without any gather
    (src/Predict.cpp:60-75's Woodbury branch, n-sharded)."""

    def fn(values, vectors_local, Y_local, mask_local, t, noise):
        lam = 1.0 - values[:K]
        lam_sqrt = jnp.exp(-0.5 * t * lam)
        w_full = jnp.exp(-t * lam)
        Vm = vectors_local[:, :K] * mask_local[:, None]
        z = noise + sigma
        VtV = jax.lax.psum(pdot(Vm.T, Vm), axis)
        Q = lam_sqrt[:, None] * VtV * lam_sqrt[None, :] / z
        Q = Q + jnp.eye(K, dtype=Q.dtype)
        L_Q = jnp.linalg.cholesky(Q)
        Ym = Y_local * mask_local
        VtY = jax.lax.psum(pdot(Vm.T, Ym[:, None])[:, 0], axis)
        sol = jax.scipy.linalg.cho_solve((L_Q, True), lam_sqrt * (VtY / z))
        Vt_alpha = (VtY - pdot(VtV, (lam_sqrt * sol)[:, None])[:, 0]) / z
        pred_local = pdot(vectors_local[:, :K], (w_full * Vt_alpha)[:, None])[:, 0]
        return pred_local

    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
