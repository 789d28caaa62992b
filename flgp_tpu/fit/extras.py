"""Covariance-only and dimension-reduction entry points.

``heat_kernel_covariance`` (src/Spectrum.cpp:28-43) and ``lae_eigenmap``
(src/Spectrum.cpp:17-25).  Note the reference's R wrapper overrides the C++
defaults to cluster-normalized/root=TRUE (R/Fit.R:760-767 vs
src/Spectrum.h:54-59); we follow the R-visible behavior.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import FitConfig, GraphConfig, LaplacianType, Subsample
from ..ops.heat_kernel import heat_kernel
from ..ops.kmeans import subsample
from ..ops.spectrum import cross_similarity_lae, spectrum_from_Z
from ..types import EigenPair
from . import spectral


@functools.partial(jax.jit, static_argnames=("g", "m", "n"))
def _hk_cov_impl(key, X_all, t, g: GraphConfig, m: int, n: int):
    eig, _ = spectral.build_spectrum(key, X_all, g)
    K = min(g.resolved_K(), g.s, n)
    idx0 = jnp.arange(n)
    idx1 = jnp.arange(m)
    return heat_kernel(eig, t, K, idx0, idx1)


def heat_kernel_covariance(key, X, X_new, t, g: GraphConfig = GraphConfig()) -> jnp.ndarray:
    """(n, m) heat-kernel covariance between all points and the first m
    (src/Spectrum.cpp:28-43)."""
    X = jnp.asarray(X)
    X_new = jnp.asarray(X_new, X.dtype)
    X_all = jnp.concatenate([X, X_new], axis=0)
    return _hk_cov_impl(key, X_all, jnp.asarray(t, X.dtype), g, X.shape[0], X_all.shape[0])


@functools.partial(jax.jit, static_argnames=("s", "r", "ndim", "method", "norm", "nstart"))
def _eigenmap_impl(key, X, s: int, r: int, ndim: int, method: Subsample,
                   norm: LaplacianType, nstart: int):
    sub = subsample(key, X, s, method, nstart)
    Z = cross_similarity_lae(X, sub.centers, r, norm, sub.counts)
    eig = spectrum_from_Z(Z, ndim, True)
    return 1.0 - eig.values, eig.vectors


def lae_eigenmap(
    key,
    X,
    s: int,
    r: int,
    ndim: int,
    method: Subsample = Subsample.KMEANS,
    norm: LaplacianType = LaplacianType.CLUSTER_NORMALIZED,
    nstart: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Laplacian-eigenmap spectral embedding: (Laplacian eigenvalues 1−λ,
    √n-scaled eigenvectors) (src/Spectrum.cpp:17-25)."""
    return _eigenmap_impl(key, jnp.asarray(X), s, r, ndim, Subsample(method),
                          LaplacianType(norm), nstart)
