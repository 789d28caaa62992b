"""Checkpoint / resume for spectral artifacts and sampler state.

The reference keeps everything in-memory in one synchronous call
(SURVEY §5: no persistence); here the two expensive artifacts — the spectral
stage (anchors, counts, eigenpairs) and MCMC chain state — serialize through
orbax so grid searches and long multi-host sampling runs are resumable.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover - orbax is baked into the image
    _HAVE_ORBAX = False

from ..types import EigenPair


def _to_pytree(obj: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, obj)


def save_pytree(path: str, tree: Any) -> None:
    """Save an arbitrary pytree of arrays (overwrites)."""
    if not _HAVE_ORBAX:
        raise RuntimeError("orbax unavailable")
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_pytree(tree), force=True)
    ckptr.wait_until_finished()


def load_pytree(path: str, like: Optional[Any] = None) -> Any:
    if not _HAVE_ORBAX:
        raise RuntimeError("orbax unavailable")
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        like = jax.tree_util.tree_map(
            lambda x: ocp.utils.to_shape_dtype_struct(x) if hasattr(x, "shape") else x,
            _to_pytree(like),
        )
        return ckptr.restore(path, like)
    return ckptr.restore(path)


def save_spectrum(path: str, eigenpair: EigenPair, anchors, counts) -> None:
    """Persist the spectral stage (the dominant cost of every fit;
    SURVEY §5 'checkpoint/resume')."""
    save_pytree(
        path,
        {
            "values": eigenpair.values,
            "vectors": eigenpair.vectors,
            "anchors": anchors,
            "counts": counts,
        },
    )


def load_spectrum(path: str):
    tree = load_pytree(path)
    return EigenPair(tree["values"], tree["vectors"]), tree["anchors"], tree["counts"]
