"""Graph-Laplacian normalizations of the cross-similarity matrix Z.

In-place sparse transforms in the reference (src/Utils.cpp:195-212); here pure
functions over the ELL layout — column sums via segment-sum, row/column
scalings as elementwise gathers.  All divisions carry the reference's 1e-9
jitter.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import EPS, LaplacianType
from ..types import EllMatrix


def normalize_graph_laplacian(
    Z: EllMatrix,
    gl: LaplacianType,
    cluster_sizes: jnp.ndarray | None = None,
) -> EllMatrix:
    """Apply the requested normalization then row-normalize (src/Utils.cpp:195-212).

    - rw: row-normalize only
    - normalized: column-normalize, then row-normalize
    - cluster-normalized: column-normalize, scale columns by cluster sizes,
      then row-normalize
    """
    gl = LaplacianType(gl)
    if gl == LaplacianType.RW:
        pass
    elif gl == LaplacianType.NORMALIZED:
        Z = Z.scale_cols(1.0 / (Z.colsum() + EPS))
    elif gl == LaplacianType.CLUSTER_NORMALIZED:
        if cluster_sizes is None:
            raise ValueError("cluster-normalized Laplacian requires cluster sizes")
        Z = Z.scale_cols(1.0 / (Z.colsum() + EPS))
        Z = Z.scale_cols(cluster_sizes.astype(Z.dtype))
    else:
        raise ValueError(f"unsupported graph Laplacian: {gl}")

    return Z.scale_rows(1.0 / (Z.rowsum() + EPS))
