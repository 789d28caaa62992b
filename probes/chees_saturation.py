"""Ad-hoc TPU probe: ChEES saturation on the torus GPC posterior."""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from flgp_tpu import GraphConfig
from flgp_tpu.datasets import torus_rings_r
from flgp_tpu.fit.spectral import build_spectrum
from flgp_tpu.inference.chees import run_chees, run_chees_fixed
from flgp_tpu.inference.diagnostics import ess
from flgp_tpu.models.latent import GpcLogPost, make_whitened


def _fetch(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][:1])
    return x


def main():
    tor = torus_rings_r()
    K = 100
    m = tor.x_train.shape[0]
    X_all = jnp.concatenate(
        [jnp.asarray(tor.x_train, jnp.float32), jnp.asarray(tor.x_test, jnp.float32)]
    )
    g = GraphConfig(s=600, r=3, K=K)
    eig = jax.jit(lambda k: build_spectrum(k, X_all, g)[0])(jax.random.PRNGKey(42))
    _fetch(eig.values)
    gp = make_whitened(eig, jnp.arange(m), K, 1e-3)
    logpost = GpcLogPost(
        gp, jnp.asarray(tor.y_train, jnp.float32), jnp.ones((m,), jnp.float32),
        1e-2, 10.0, 2.0,
    )
    out = {}

    C0 = 128
    x0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (C0, K + 1), jnp.float32)
    adapt = jax.jit(
        lambda k, x: run_chees(k, logpost, x, n_warmup=512, n_samples=64, max_steps=256)
    )
    t0 = time.perf_counter()
    arun = adapt(jax.random.PRNGKey(2), x0)
    _fetch(arun.samples)
    out["adapt_s"] = time.perf_counter() - t0
    out["step"] = float(arun.step)
    out["traj_len"] = float(arun.traj_len)
    out["accept_adapt"] = float(jnp.mean(arun.accept_prob))
    out["mean_leap_per_draw_adapt"] = float(arun.n_leapfrog_total) / 64
    print("[probe] adapted:", out, file=sys.stderr, flush=True)

    for C in (1024, 16384):
        reps = C // C0
        x0C = jnp.tile(arun.samples[-1], (reps, 1))
        n_samp = 256
        fit = jax.jit(
            lambda k, x: run_chees_fixed(
                k, logpost, x, arun.step, arun.traj_len, arun.inv_mass,
                n_samples=n_samp, max_steps=256,
            )
        )
        compiled = fit.lower(jax.random.PRNGKey(3), x0C).compile()
        warm = compiled(jax.random.PRNGKey(3), x0C)
        _fetch(warm.samples[:1, :1])
        x1C = warm.samples[-1]  # decorrelated start for the timed run
        _fetch(x1C)
        jax.tree_util.tree_map(lambda a: a.delete(), warm)
        t0 = time.perf_counter()
        run = compiled(jax.random.PRNGKey(4), x1C)
        _fetch(run.samples[-1:, -1:])
        dt = time.perf_counter() - t0
        sub = min(C, 256)
        es = ess(np.asarray(run.samples[:, :sub], np.float64))
        nleap = int(run.n_leapfrog_total)
        jax.tree_util.tree_map(lambda a: a.delete(), run)
        ess_total = float(np.min(es)) * (C / sub)
        out[f"C{C}_wall_s"] = dt
        out[f"C{C}_min_ess_per_sec"] = ess_total / dt
        out[f"C{C}_leap_per_draw"] = nleap / n_samp
        out[f"C{C}_leap_steps_per_sec"] = C * nleap / dt
        print(f"[probe] C={C}: {ess_total/dt:.0f} ESS/s wall {dt:.2f}s leap/draw {nleap/n_samp:.1f}", file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
