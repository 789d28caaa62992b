"""Device-mesh helpers.

The reference's only parallelism is TBB threads on one host (SURVEY §2.5);
all multi-device structure here is new design.  Axis conventions:

- ``data``: the n-point axis of the spectral stage (kNN/LAE/Z rows, the
  (n, K) eigenvector store).  The analogue of sequence parallelism for this
  workload — n is the scaling axis.
- ``chain``: MCMC chains / SMC particles for the inference stack.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def shard_rows(mesh: Mesh, x: jax.Array, axis: str = "data") -> jax.Array:
    """Place a row-major array with its leading axis sharded over ``axis``."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x: jax.Array) -> jax.Array:
    return jax.device_put(x, NamedSharding(mesh, P()))


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad the leading axis to a device-count multiple; returns (padded, n)."""
    import jax.numpy as jnp

    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), n
