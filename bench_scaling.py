"""Chain-sharded sampling scaling probe (BASELINE config-5 proxy).

Real multi-chip hardware is unavailable in this environment (one v5e chip via
a tunnel), so this measures the *sharded code path* on a virtual 8-device CPU
mesh: the same `shard_map` program that would ride ICI on a pod slice.
Chains are embarrassingly parallel (zero collectives in the hot loop —
parallel/mcmc.py), so on real chips the speedup is bounded only by dispatch;
here it is bounded by the host's physical cores, which we report alongside.

Run by bench.py in a subprocess with JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=8.  Prints one JSON line.
"""

import json
import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from flgp_tpu.models.latent import GpcLogPost, WhitenedGP
from flgp_tpu.parallel.mcmc import sharded_hmc_fn
from flgp_tpu.parallel.mesh import make_mesh


def main():
    K, m = 32, 64
    n_chains, n_samples, n_warmup = 64, 256, 64
    key = jax.random.PRNGKey(0)
    kv, ky, kx = jax.random.split(key, 3)
    V = jax.random.normal(kv, (m, K), jnp.float32) / np.sqrt(K)
    lam = jnp.linspace(0.0, 1.0, K, dtype=jnp.float32)
    Y = (jax.random.uniform(ky, (m,)) > 0.5).astype(jnp.float32)
    gp = WhitenedGP(V, lam, 1e-3)
    logpost = GpcLogPost(gp, Y, jnp.ones((m,), jnp.float32), 1e-2, 10.0, 2.0)
    x0 = 0.1 * jax.random.normal(kx, (n_chains, K + 1), jnp.float32)
    # sharded_hmc_fn consumes the natural (C, 2) split: one raw key pair per
    # chain; each shard seeds its local run_hmc batch from its first pair
    keys = jax.random.split(jax.random.PRNGKey(1), n_chains)

    def rate_at(n_dev: int) -> float:
        mesh = make_mesh(n_dev, axis_names=("chain",))
        fn = jax.jit(sharded_hmc_fn(mesh, logpost, n_warmup, n_samples, n_leapfrog=8))
        run = fn(keys, x0)
        run.samples.block_until_ready()
        t0 = time.perf_counter()
        run = fn(keys, x0)
        run.samples.block_until_ready()
        dt = time.perf_counter() - t0
        return n_chains * n_samples / dt

    r1 = rate_at(1)
    r8 = rate_at(8)
    cores = os.cpu_count() or 1
    print(json.dumps({
        "scaling_samples_per_s_1dev": round(r1, 1),
        "scaling_samples_per_s_8dev": round(r8, 1),
        "scaling_speedup_8dev": round(r8 / r1, 3),
        "scaling_host_cores": cores,
        "scaling_efficiency_vs_host_ceiling": round((r8 / r1) / min(8, cores), 3),
    }))


if __name__ == "__main__":
    main()
