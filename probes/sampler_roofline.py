"""Ad-hoc TPU probe: roofline + matmul-precision ablation of the saturated
sampler gradient (VERDICT r4 #4)."""
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
from flgp_tpu.models.latent import (
    WhitenedGP, GpcLogPost, make_whitened, log_prior_u,
    bernoulli_logit_loglik, _theta_log_prior,
)


def _fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[:1] if getattr(leaf, "ndim", 0) else leaf)
    return x


def make_logpost_prec(gp, Y, N, precision):
    """GpcLogPost with the latent matmul at a chosen TPU precision."""

    def lp(x):
        u, t = x[:-1], jnp.exp(x[-1])
        scale = jnp.exp(-0.5 * t * gp.lam)
        f = jnp.matmul(gp.V, (scale * u)[..., None], precision=precision)[..., 0]
        out = log_prior_u(u) + bernoulli_logit_loglik(f, Y, N)
        return out + _theta_log_prior(x[-1], t, 1e-2, 10.0, 2.0, 2.3, 1.5)

    return lp


def main():
    tor = torus_rings_r()
    K = 100
    m = tor.x_train.shape[0]
    X_all = jnp.concatenate(
        [jnp.asarray(tor.x_train, jnp.float32), jnp.asarray(tor.x_test, jnp.float32)]
    )
    eig = jax.jit(lambda k: build_spectrum(k, X_all, GraphConfig(s=600, r=3, K=K))[0])(
        jax.random.PRNGKey(42)
    )
    _fetch(eig.values)
    gp = make_whitened(eig, jnp.arange(m), K, 1e-3)
    Y = jnp.asarray(tor.y_train, jnp.float32)
    N1 = jnp.ones((m,), jnp.float32)
    out = {"m": m, "K": K}

    C = 16384
    x0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (C, K + 1), jnp.float32)

    # ---- pure batched-gradient throughput at each matmul precision -------
    n_evals = 512
    for name, prec in (
        ("highest_f32x6", jax.lax.Precision.HIGHEST),
        ("high_bf16x3", jax.lax.Precision.HIGH),
        ("default_bf16x1", jax.lax.Precision.DEFAULT),
    ):
        lp = make_logpost_prec(gp, Y, N1, prec)
        vg = jax.vmap(jax.value_and_grad(lp))

        @jax.jit
        def grad_scan(x, seed):
            def body(c, _):
                lpv, g = vg(c)
                return c + 1e-12 * seed * g, jnp.sum(lpv)

            return jax.lax.scan(body, x, None, length=n_evals)[1][-1]

        ca = jax.jit(vg).lower(x0).compile().cost_analysis()
        gf = (ca if isinstance(ca, dict) else ca[0]).get("flops", 0.0)
        _fetch(grad_scan(x0, jnp.float32(1.0)))
        t0 = time.perf_counter()
        _fetch(grad_scan(x0, jnp.float32(1.0 + 1e-7)))
        dt = time.perf_counter() - t0
        out[f"grad_{name}_tflops"] = gf * n_evals / dt / 1e12
        out[f"grad_{name}_us_per_eval"] = dt / n_evals * 1e6
        out["grad_xla_flops_per_eval"] = gf
        print(f"[roofline] {name}: {gf*n_evals/dt/1e12:.2f} TFLOP/s "
              f"({dt/n_evals*1e6:.0f} us/eval)", file=sys.stderr, flush=True)

    # ---- end-to-end: ChEES fixed at DEFAULT vs HIGHEST with stat gates ---
    lp_hi = make_logpost_prec(gp, Y, N1, jax.lax.Precision.HIGHEST)
    lp_lo = make_logpost_prec(gp, Y, N1, jax.lax.Precision.DEFAULT)
    C0 = 128
    xa = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (C0, K + 1), jnp.float32)
    arun = jax.jit(lambda k, x: run_chees(k, lp_hi, x, n_warmup=512, n_samples=64))(
        jax.random.PRNGKey(2), xa
    )
    _fetch(arun.samples)
    reps = C // C0
    x0C = jnp.tile(arun.samples[-1], (reps, 1))
    n_samp = 256
    stats = {}
    for name, lp in (("f32", lp_hi), ("bf16", lp_lo)):
        fit = jax.jit(
            lambda k, x, lp=lp: run_chees_fixed(
                k, lp, x, arun.step, arun.traj_len, arun.inv_mass, n_samples=n_samp
            )
        )
        comp = fit.lower(jax.random.PRNGKey(3), x0C).compile()
        warm = comp(jax.random.PRNGKey(3), x0C)
        _fetch(warm.samples[:1, :1])
        x1C = warm.samples[-1]
        _fetch(x1C)
        jax.tree_util.tree_map(lambda a: a.delete(), warm)
        t0 = time.perf_counter()
        run = comp(jax.random.PRNGKey(4), x1C)
        _fetch(run.samples[-1:, -1:])
        dt = time.perf_counter() - t0
        S = np.asarray(run.samples[:, :256], np.float64)
        es = ess(S)
        nleap = int(run.n_leapfrog_total)
        jax.tree_util.tree_map(lambda a: a.delete(), run)
        ess_rate = float(np.min(es)) * (C / 256) / dt
        stats[name] = dict(
            wall=dt, ess_rate=ess_rate,
            mean=S.reshape(-1, K + 1).mean(0), sd=S.reshape(-1, K + 1).std(0),
            min_ess=float(np.min(es)), leap=nleap,
        )
        out[f"chees_{name}_min_ess_per_sec"] = ess_rate
        out[f"chees_{name}_wall_s"] = dt
        print(f"[roofline] chees {name}: {ess_rate:.0f} ESS/s", file=sys.stderr, flush=True)

    # moment agreement in MC-error units: se(mean) ~ sd/sqrt(min_ess_total)
    f32, bf16 = stats["f32"], stats["bf16"]
    se = f32["sd"] / np.sqrt(max(f32["min_ess"] * (C / 256), 1.0))
    out["bf16_mean_shift_mc_units_max"] = float(
        np.max(np.abs(bf16["mean"] - f32["mean"]) / np.maximum(se, 1e-12))
    )
    out["bf16_sd_ratio_worst"] = float(
        np.max(np.abs(bf16["sd"] / f32["sd"] - 1.0))
    )
    out["bf16_speedup"] = f32["wall"] / bf16["wall"]
    print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v) for k, v in out.items()}))


if __name__ == "__main__":
    main()
