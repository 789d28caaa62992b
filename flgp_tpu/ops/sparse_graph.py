"""Symmetric kNN-graph operator in static-shape COO form.

The GLGP sparse path symmetrizes a kNN graph: Z_sym = (Z + Zᵀ)/2
(src/Fit.cpp:417-423).  A transpose breaks the fixed fan-in of the ELL
layout, so the symmetrized operator lives as a static 2·n·r-edge COO list
(duplicate edges act additively — exactly the +/2 semantics).  Matvecs are
gather + segment-sum over edge blocks; this is the operator LOBPCG drives
for the large-n eigensolve.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import EPS


class SymCoo(NamedTuple):
    rows: jnp.ndarray    # (E,) int32
    cols: jnp.ndarray    # (E,) int32
    vals: jnp.ndarray    # (E,)
    n: int

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A x for x of shape (n,) or (n, k), edge-blocked."""
        contrib = self.vals[:, None] * x[self.cols] if x.ndim == 2 else self.vals * x[self.cols]
        out_shape = (self.n,) + x.shape[1:]
        return jnp.zeros(out_shape, x.dtype).at[self.rows].add(contrib)

    def rowsum(self) -> jnp.ndarray:
        return jnp.zeros((self.n,), self.vals.dtype).at[self.rows].add(self.vals)

    def scale_sym(self, d: jnp.ndarray) -> "SymCoo":
        """diag(d) · A · diag(d)."""
        return self._replace(vals=self.vals * d[self.rows] * d[self.cols])


def symmetrize_knn(knn_idx: jnp.ndarray, knn_vals: jnp.ndarray, n: int) -> SymCoo:
    """(Z + Zᵀ)/2 from ELL kNN values: each directed edge contributes v/2 in
    both orientations (src/Fit.cpp:419)."""
    r = knn_idx.shape[1]
    rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32), r)
    cols = knn_idx.reshape(-1).astype(jnp.int32)
    half = (knn_vals.reshape(-1) / 2.0)
    return SymCoo(
        jnp.concatenate([rows, cols]),
        jnp.concatenate([cols, rows]),
        jnp.concatenate([half, half]),
        n,
    )


def glgp_operator(sym: SymCoo) -> tuple[SymCoo, jnp.ndarray]:
    """Double normalization of the GLGP graph (src/Fit.cpp:420-423):
    A = D⁻¹·Z_sym·D⁻¹ then W = D_A^{-1/2}·A·D_A^{-1/2}.

    Returns (W as COO, sqrt_D_A_inv) — the latter rescales eigenvectors
    (src/Fit.cpp:430)."""
    d_inv = 1.0 / (sym.rowsum() + EPS)
    A = sym.scale_sym(d_inv)
    sqrt_da_inv = 1.0 / jnp.sqrt(A.rowsum() + EPS)
    W = A.scale_sym(sqrt_da_inv)
    return W, sqrt_da_inv
