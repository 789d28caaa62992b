"""Benchmark harness: README-parity goldens + throughput on real hardware.

Headline metric: wall-clock of the flagship LKFLGP fit (binary GPC with LAE
kernel) on the README torus benchmark — n=4800, m=100, s=600, r=3, K=100 —
against the reference's committed 3.97 s single-CPU number
(/root/reference/README.md:106, BASELINE.md).  Steady-state timing: the jitted
pipeline is compiled on a first call, then timed.

Prints ONE JSON line with the headline metric; parity/secondary numbers ride
as extra fields.
"""

import json
import os
import sys
import time

import jax

# Persistent compile cache: compiles dominate wall-clock over the axon
# tunnel; cached reruns skip them entirely.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _mark(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

# Precision policy (measured on v5e): everything runs f32 with
# Precision.HIGHEST-pinned contractions; GPC prediction uses the
# Rao-Blackwellized collapsed predictor (average over the last 50 ω states)
# instead of the reference's one-sample final-state estimate — torus error
# 0.015 ± seed noise vs the reference's 0.027, at full f32 speed.  An f64
# solve tail (FitConfig.solve_dtype) is available but not needed here.
import jax.numpy as jnp
import numpy as np

import flgp_tpu
from flgp_tpu import FitConfig, GraphConfig
from flgp_tpu.datasets import spiral, torus_rings

BASELINE_TORUS_LKFLGP_S = 3.97      # README.md:106
BASELINE_TORUS_ERR = 0.02702       # README.md:109
BASELINE_SPIRAL_RMSE = 0.4582      # README.md:169


def main():
    key = jax.random.PRNGKey(0)

    # ---- torus GPC, LKFLGP config ---------------------------------------
    torus = torus_rings(n=4800, m_train=100, seed=1234)
    cfg = FitConfig(graph=GraphConfig(s=600, r=3, K=100), sigma=1e-3)

    def run_torus():
        return flgp_tpu.fit_lae_logit_gp(
            key, torus.x_train, torus.y_train, torus.x_test, cfg=cfg
        )

    _mark("torus: compiling")
    res = run_torus()  # compile + warm caches
    _mark("torus: compiled, timing")
    t0 = time.perf_counter()
    res = run_torus()
    torus_fit_s = time.perf_counter() - t0
    torus_err = float(np.mean(res.y_test != torus.y_test))

    # ---- spiral GPR, LKFLGP config --------------------------------------
    sp = spiral(n=4000, m_train=200, seed=1234)
    cfg_r = FitConfig(graph=GraphConfig(s=500, r=3, K=100), sigma=1e-5)

    def run_spiral():
        return flgp_tpu.fit_lae_regression_gp(key, sp.x_train, sp.y_train, sp.x_test, cfg_r)

    _mark("spiral: compiling")
    res_sp = run_spiral()
    _mark("spiral: compiled, timing")
    t0 = time.perf_counter()
    res_sp = run_spiral()
    spiral_fit_s = time.perf_counter() - t0
    spiral_rmse = float(np.sqrt(np.mean((res_sp.y_test - sp.y_test) ** 2)))

    # ---- ESS/sec/chip on the GPC posterior (whitened HMC) ---------------
    from flgp_tpu.inference.diagnostics import ess
    from flgp_tpu.inference.hmc import run_hmc
    from flgp_tpu.models.latent import GpcLogPost, make_whitened

    eig = res.eigenpair
    K = 100
    m = torus.x_train.shape[0]
    gp = make_whitened(eig, jnp.arange(m), K, 1e-3)
    logpost = GpcLogPost(
        gp,
        jnp.asarray(torus.y_train, jnp.float32),
        jnp.ones((m,), jnp.float32),
        1e-2, 10.0, 2.0,
    )
    n_chains, n_samp = 16, 512
    x0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (n_chains, K + 1), jnp.float32)

    hmc = jax.jit(
        lambda k, x: run_hmc(k, logpost, x, n_warmup=256, n_samples=n_samp, n_leapfrog=16)
    )
    _mark("hmc: compiling")
    run = hmc(jax.random.PRNGKey(2), x0)
    jax.block_until_ready(run.samples)
    _mark("hmc: compiled, timing")
    t0 = time.perf_counter()
    run = hmc(jax.random.PRNGKey(3), x0)
    jax.block_until_ready(run.samples)
    hmc_s = time.perf_counter() - t0
    ess_vals = ess(np.asarray(run.samples, np.float64))
    ess_per_sec = float(np.min(ess_vals)) / hmc_s

    # ---- spectral stage at n=1e6 (north-star scale metric) ---------------
    # Full LAE pipeline — kNN + FISTA LAE + Laplacian normalize + Gram/eigh
    # spectrum, s=1024 anchors, K=128 — on one chip.  Anchors are fed
    # directly (k-means++ seeding measured separately) so this times the
    # graph+spectrum build the reference runs under TBB.
    from flgp_tpu.config import LaplacianType
    from flgp_tpu.ops.knn import knn as _knn
    from flgp_tpu.ops.lae import lae_weights as _lae
    from flgp_tpu.ops.laplacian import normalize_graph_laplacian as _norm
    from flgp_tpu.ops.spectrum import spectrum_from_Z as _spec
    from flgp_tpu.types import EllMatrix as _Ell

    n_big, d_big, s_big, K_big = 1_000_000, 3, 1024, 128
    kb = jax.random.PRNGKey(7)
    X_big = jax.random.normal(kb, (n_big, d_big), jnp.float32)
    U_big = X_big[:: n_big // s_big][:s_big]

    @jax.jit
    def spectral_stage(X, U):
        res = _knn(X, U, 3)
        w = _lae(X, U, res.indices)
        Z = _Ell(w, res.indices, s_big)
        Z = _norm(Z, LaplacianType.NORMALIZED, None)
        return _spec(Z, K_big, True)

    _mark("spectral1e6: compiling")
    eig_big = spectral_stage(X_big, U_big)
    jax.block_until_ready(eig_big.vectors)
    _mark("spectral1e6: compiled, timing")
    t0 = time.perf_counter()
    eig_big = spectral_stage(X_big, U_big)
    jax.block_until_ready(eig_big.vectors)
    spectral_1e6_s = time.perf_counter() - t0

    print(json.dumps({
        "metric": "torus_gpc_lae_fit_wall_clock",
        "value": round(torus_fit_s, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_TORUS_LKFLGP_S / torus_fit_s, 2),
        "torus_test_error": round(torus_err, 5),
        "torus_err_baseline": BASELINE_TORUS_ERR,
        "spiral_fit_s": round(spiral_fit_s, 4),
        "spiral_rmse": round(spiral_rmse, 5),
        "spiral_rmse_baseline": BASELINE_SPIRAL_RMSE,
        "gpc_min_ess_per_sec_per_chip": round(ess_per_sec, 1),
        "hmc_accept_mean": round(float(jnp.mean(run.accept_prob)), 3),
        "spectral_stage_n1e6_s": round(spectral_1e6_s, 4),
    }))


if __name__ == "__main__":
    main()
