"""Worker for the 2-process jax.distributed integration test.

NOT a pytest module (no test_ prefix): launched as a subprocess by
tests/test_distributed.py, twice, with FLGP_* env wiring the coordinator.
Exercises the REAL multi-process path that single-process virtual-mesh tests
cannot: parallel.mesh.init_distributed → global_mesh over 2 processes × 4
virtual CPU devices, Gloo-backed cross-process psums inside the sharded
spectral stage and the sharded GPC Laplace tail, asserting equality with a
locally-computed single-device oracle.  Prints DISTRIBUTED_OK on success.
"""

import os
import sys

# env must be set before jax import (FLGP_* are set by the parent)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from flgp_tpu.config import GraphConfig, KernelType, LaplacianType  # noqa: E402
from flgp_tpu.parallel.mesh import global_mesh, init_distributed  # noqa: E402


def main() -> None:
    assert init_distributed(), "FLGP_* env not picked up"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    mesh = global_mesh(("data",))

    # deterministic problem, identical on both processes
    rng = np.random.default_rng(3)
    n, d, s, K, m = 512, 3, 24, 10, 64
    X = rng.normal(size=(n, d))
    U = rng.normal(size=(s, d))
    counts = rng.integers(1, 20, size=(s,)).astype(np.float64)
    g = GraphConfig(s=s, r=3, K=K, gl=LaplacianType.CLUSTER_NORMALIZED,
                    kernel=KernelType.LAE)

    def sharded(arr):
        """Global row-sharded array from this process's half of the rows."""
        arr = np.asarray(arr)
        rows = arr.shape[0] // jax.process_count()
        lo = jax.process_index() * rows
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data", *([None] * (arr.ndim - 1)))),
            arr[lo:lo + rows],
        )

    def replicated(arr):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), np.asarray(arr)
        )

    def fetch(garr):
        """Value of a replicated global array on this process."""
        return np.asarray(jax.device_get(garr.addressable_shards[0].data))

    # ---- sharded spectrum vs local oracle --------------------------------
    from flgp_tpu.ops.spectrum import cross_similarity_lae, spectrum_from_Z
    from flgp_tpu.parallel.spectral import sharded_spectrum_fn

    Z = cross_similarity_lae(jnp.asarray(X), jnp.asarray(U), g.r, g.gl,
                             jnp.asarray(counts))
    ref = spectrum_from_Z(Z, K, g.root)

    fn = sharded_spectrum_fn(mesh, g)
    values, vectors = jax.jit(fn)(sharded(X), replicated(U), replicated(counts))
    np.testing.assert_allclose(fetch(values), np.asarray(ref.values), atol=1e-8)
    ref_vec = np.asarray(ref.vectors)
    for shard in vectors.addressable_shards:
        got = np.asarray(jax.device_get(shard.data))
        want = ref_vec[shard.index]
        signs = np.sign(np.sum(got * want, axis=0))
        signs[signs == 0] = 1.0
        np.testing.assert_allclose(got * signs, want, atol=1e-7)
    print(f"proc {jax.process_index()}: sharded spectrum matches", flush=True)

    # ---- sharded GPC Laplace tail vs dense oracle -------------------------
    from flgp_tpu.models import gpc as gpc_mod
    from flgp_tpu.ops import linalg
    from flgp_tpu.ops.heat_kernel import heat_kernel, heat_kernel_diag
    from flgp_tpu.parallel.gpc import sharded_gpc_laplace_fn
    from flgp_tpu.types import EigenPair

    sigma, t = 1e-3, 8.0
    eig = EigenPair(jnp.asarray(ref.values), jnp.asarray(ref.vectors))
    Y_full = (rng.uniform(size=n) > 0.5).astype(np.float64)
    mask = np.zeros(n)
    mask[:m] = 1.0
    Y = Y_full * mask

    idx0, idx1 = jnp.arange(m), jnp.arange(m, n)
    C11 = linalg.add_diag(
        heat_kernel(eig, t, K, idx0, idx0), jnp.full((m,), sigma)
    )
    C21 = heat_kernel(eig, t, K, idx1, idx0)
    C22 = heat_kernel_diag(eig, t, K, idx1) + sigma
    amll_ref = gpc_mod.gpc_marginal_log_likelihood(C11, jnp.asarray(Y[:m]), jnp.ones((m,)))
    mean_ref, var_ref = gpc_mod.gpc_posterior_moments(C11, C21, C22, jnp.asarray(Y[:m]))

    gfn = sharded_gpc_laplace_fn(mesh, K, sigma)
    amll, mean, var, _label = jax.jit(gfn)(
        replicated(np.asarray(ref.values)),
        sharded(np.asarray(ref.vectors)),
        sharded(Y),
        sharded(mask),
        sharded(mask),
        replicated(np.asarray(t)),
    )
    np.testing.assert_allclose(float(fetch(amll)), float(amll_ref), rtol=1e-5)
    mean_full = np.concatenate([np.zeros(m), np.asarray(mean_ref)])
    var_full = np.concatenate([np.zeros(m), np.asarray(var_ref)])
    for shard in mean.addressable_shards:
        got = np.asarray(jax.device_get(shard.data))
        sel = shard.index[0]
        keep = np.arange(n)[sel] >= m          # train rows unchecked (oracle is test-only)
        np.testing.assert_allclose(got[keep], mean_full[sel][keep], rtol=1e-5, atol=1e-8)
    for shard in var.addressable_shards:
        got = np.asarray(jax.device_get(shard.data))
        sel = shard.index[0]
        keep = np.arange(n)[sel] >= m
        np.testing.assert_allclose(got[keep], var_full[sel][keep], rtol=1e-5, atol=1e-8)
    print(f"proc {jax.process_index()}: sharded GPC tail matches", flush=True)

    print("DISTRIBUTED_OK", flush=True)


if __name__ == "__main__":
    main()
