"""Particle-parallel tempered SMC over a device mesh.

The particle axis shards over the mesh; each stage needs exactly three
collective touch-points (the design BASELINE.json asks for — "resampling …
done via collectives"; the reference has no distributed inference at all,
SURVEY §2.5):

1. the adaptive-tempering ESS bisection — a psum'd effective sample size,
2. the evidence increment — a global logsumexp (pmax + psum),
3. systematic resampling — an all_gather of weights *and* particles, after
   which every device slices out its own shard of the globally-resampled
   population.

Mutation (HMC or random-walk Metropolis) is embarrassingly parallel and runs
entirely on local shards; the step-size controller pools acceptance with one
psum so all devices stay in lock-step.  Control flow (the tempering
``while_loop``) is replicated: every device sees identical collective
results, so all devices run the same number of stages.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..inference.hmc import hmc_kernel, init_state
from ..inference.smc import SmcResult

LogProbFn = Callable[[jnp.ndarray], jnp.ndarray]


def sharded_smc_fn(
    mesh: Mesh,
    log_prior: LogProbFn,
    log_like: LogProbFn,
    n_mutation_steps: int = 5,
    n_leapfrog: int = 8,
    target_ess_frac: float = 0.5,
    max_stages: int = 50,
    step_size: float = 0.1,
    mutation: str = "hmc",
    axis: str = "chain",
):
    """Returns fn(key, x0 (n_particles, dim)) → SmcResult with the particle
    axis sharded over ``axis``.  n_particles must divide by the axis size.

    Semantically identical to ``inference.smc.run_smc`` (same tempering
    schedule, same systematic resample in global particle order, same
    evidence estimate) — the single-device version is the oracle.
    """
    if mutation not in ("hmc", "rwm"):
        raise ValueError(f"unknown mutation kernel {mutation!r}")
    n_dev = 1
    for ax, sz in zip(mesh.axis_names, mesh.devices.shape):
        if ax == axis:
            n_dev = sz

    def tempered(beta):
        return lambda x: log_prior(x) + beta * log_like(x)

    def fn(key, x_local):
        n_local, dim = x_local.shape
        n = n_local * n_dev
        dtype = x_local.dtype
        rank = jax.lax.axis_index(axis)

        def gmax(v):
            return jax.lax.pmax(jnp.max(v), axis)

        def glogsumexp(lw):
            m = gmax(lw)
            return jnp.log(jax.lax.psum(jnp.sum(jnp.exp(lw - m)), axis)) + m

        def gess(lw):
            m = gmax(lw)
            w = jnp.exp(lw - m)
            s = jax.lax.psum(jnp.sum(w), axis)
            s2 = jax.lax.psum(jnp.sum(w * w), axis)
            return s * s / s2

        class State(NamedTuple):
            key: jax.Array
            particles: jnp.ndarray   # (n_local, dim)
            beta: jnp.ndarray
            log_Z: jnp.ndarray
            stage: jnp.ndarray
            step: jnp.ndarray
            temps: jnp.ndarray

        def next_beta(particles, beta):
            ll = jax.vmap(log_like)(particles)

            def ess_at(b):
                return gess((b - beta) * ll)

            def cond(st):
                lo, hi, i = st
                return i < 30

            def body(st):
                lo, hi, i = st
                mid = 0.5 * (lo + hi)
                ok = ess_at(mid) >= target_ess_frac * n
                lo = jnp.where(ok, mid, lo)
                hi = jnp.where(ok, hi, mid)
                return lo, hi, i + 1

            full_ok = ess_at(jnp.asarray(1.0, dtype)) >= target_ess_frac * n
            lo, hi, _ = jax.lax.while_loop(
                cond, body, (beta, jnp.asarray(1.0, dtype), jnp.int32(0))
            )
            return jnp.where(full_ok, jnp.asarray(1.0, dtype), lo), ll

        def resample(k_res, log_w, particles):
            """Global systematic resample; every device keeps its slice."""
            m = gmax(log_w)
            w_local = jnp.exp(log_w - m)
            # (n_dev, n_local) / (n_dev, n_local, dim) in device order →
            # flatten to global particle order (matches the single-shard
            # oracle's layout under parallel.mesh.shard_rows).
            w_all = jax.lax.all_gather(w_local, axis).reshape(n)
            x_all = jax.lax.all_gather(particles, axis).reshape(n, dim)
            w_all = w_all / jnp.sum(w_all)
            positions = (jax.random.uniform(k_res, (), dtype) + jnp.arange(n, dtype=dtype)) / n
            idx = jnp.searchsorted(jnp.cumsum(w_all), positions)
            idx_local = jax.lax.dynamic_slice(idx, (rank * n_local,), (n_local,))
            return x_all[idx_local]

        def stage_cond(st: State):
            return jnp.logical_and(st.beta < 1.0, st.stage < max_stages)

        def stage_body(st: State):
            key, k_res, k_mut = jax.random.split(st.key, 3)
            beta_new, ll = next_beta(st.particles, st.beta)
            log_w = (beta_new - st.beta) * ll
            log_Z = st.log_Z + glogsumexp(log_w) - jnp.log(jnp.asarray(n, dtype))
            particles = resample(k_res, log_w, st.particles)

            target = tempered(beta_new)
            k_mut = jax.random.fold_in(k_mut, rank)  # distinct moves per shard

            if mutation == "hmc":

                def mutate(k, x):
                    state = init_state(target, x)

                    def body(carry, kk):
                        s, _ = carry
                        s, ap = hmc_kernel(
                            target, kk, s, st.step, jnp.ones((dim,), dtype), n_leapfrog
                        )
                        return (s, ap), None

                    (state, ap), _ = jax.lax.scan(
                        body,
                        (state, jnp.asarray(1.0, dtype)),
                        jax.random.split(k, n_mutation_steps),
                    )
                    return state.x, ap

                accept_target = 0.65
            else:  # rwm

                def mutate(k, x):
                    lp = target(x)

                    def body(carry, kk):
                        x, lp, _ = carry
                        k_prop, k_acc = jax.random.split(kk)
                        prop = x + st.step * jax.random.normal(k_prop, (dim,), dtype)
                        lp_prop = target(prop)
                        log_u = jnp.log(jax.random.uniform(k_acc, (), dtype))
                        ap = jnp.minimum(1.0, jnp.exp(lp_prop - lp))
                        take = log_u < lp_prop - lp
                        x = jnp.where(take, prop, x)
                        lp = jnp.where(take, lp_prop, lp)
                        return (x, lp, ap), None

                    (x, _, ap), _ = jax.lax.scan(
                        body,
                        (x, lp, jnp.asarray(1.0, dtype)),
                        jax.random.split(k, n_mutation_steps),
                    )
                    return x, ap

                accept_target = 0.3

            xs, aps = jax.vmap(mutate)(jax.random.split(k_mut, n_local), particles)
            mean_ap = jax.lax.psum(jnp.sum(aps), axis) / n
            step = st.step * jnp.exp(1.0 * (mean_ap - accept_target))
            temps = st.temps.at[st.stage].set(beta_new)
            return State(key, xs, beta_new, log_Z, st.stage + 1, step, temps)

        dim_dtype = x_local.dtype
        init = State(
            key,
            x_local,
            jnp.asarray(0.0, dim_dtype),
            jnp.asarray(0.0, dim_dtype),
            jnp.int32(0),
            jnp.asarray(step_size, dim_dtype),
            jnp.ones((max_stages,), dim_dtype),
        )
        out = jax.lax.while_loop(stage_cond, stage_body, init)
        return SmcResult(out.particles, out.log_Z, out.stage, out.temps)

    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=SmcResult(P(axis), P(), P(), P()),
        check_vma=False,
    )
