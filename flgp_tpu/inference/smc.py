"""Adaptive tempered Sequential Monte Carlo with HMC mutations.

Particles live on the same flattened parameter space as the HMC/NUTS/SVI
stack.  The tempering schedule is chosen adaptively by bisecting on effective
sample size; resampling is systematic.  Particles shard over the ``chain``
mesh axis in ``parallel.mcmc``-style deployments — resampling is the one
collective (an all-gather of weights), matching the BASELINE.json design
("resampling … done via collectives").
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .hmc import HmcState, hmc_kernel, init_state

LogProbFn = Callable[[jnp.ndarray], jnp.ndarray]


class SmcResult(NamedTuple):
    particles: jnp.ndarray      # (n_particles, dim) final posterior particles
    log_evidence: jnp.ndarray   # log-normalizing-constant estimate
    n_stages: jnp.ndarray
    temperatures: jnp.ndarray   # (max_stages,) padded with 1.0


def _systematic_resample(key, log_w, n):
    w = jax.nn.softmax(log_w)
    positions = (jax.random.uniform(key, ()) + jnp.arange(n)) / n
    cum = jnp.cumsum(w)
    return jnp.searchsorted(cum, positions)


def _ess_from_logw(log_w):
    w = jax.nn.softmax(log_w)
    return 1.0 / jnp.sum(w * w)


def run_smc(
    key: jax.Array,
    log_prior: LogProbFn,
    log_like: LogProbFn,
    x0: jnp.ndarray,
    n_mutation_steps: int = 5,
    n_leapfrog: int = 8,
    target_ess_frac: float = 0.5,
    max_stages: int = 50,
    step_size: float = 0.1,
    mutation: str = "hmc",
) -> SmcResult:
    """Temper from the prior to prior·likelihood.

    x0: (n_particles, dim) draws from the prior.  The per-stage mutation
    targets log_prior + β·log_like with a shared step size rescaled by the
    acceptance statistics of the previous stage.

    mutation: "hmc" (gradient-based; requires log_like to be reverse-mode
    differentiable) or "rwm" (Gaussian random-walk Metropolis — for targets
    whose likelihood runs through non-differentiable solvers, e.g. the
    Laplace-approximate GPC marginal's Newton ``while_loop``).
    """
    if mutation not in ("hmc", "rwm"):
        raise ValueError(f"unknown mutation kernel {mutation!r}")
    n, dim = x0.shape
    dtype = x0.dtype

    def tempered(beta):
        return lambda x: log_prior(x) + beta * log_like(x)

    class State(NamedTuple):
        key: jax.Array
        particles: jnp.ndarray
        beta: jnp.ndarray
        log_Z: jnp.ndarray
        stage: jnp.ndarray
        step: jnp.ndarray
        temps: jnp.ndarray

    def next_beta(particles, beta):
        """Bisect the increment so the incremental ESS hits the target."""
        ll = jax.vmap(log_like)(particles)

        def ess_at(b):
            return _ess_from_logw((b - beta) * ll)

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

    def stage_cond(st: State):
        return jnp.logical_and(st.beta < 1.0, st.stage < max_stages)

    def stage_body(st: State):
        key, k_res, k_mut = jax.random.split(st.key, 3)
        beta_new, ll = next_beta(st.particles, st.beta)
        log_w = (beta_new - st.beta) * ll
        log_Z = st.log_Z + jax.nn.logsumexp(log_w) - jnp.log(jnp.asarray(n, dtype))

        idx = _systematic_resample(k_res, log_w, n)
        particles = st.particles[idx]

        target = tempered(beta_new)

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
                    body, (state, jnp.asarray(1.0, dtype)), jax.random.split(k, n_mutation_steps)
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
                    body, (x, lp, jnp.asarray(1.0, dtype)),
                    jax.random.split(k, n_mutation_steps),
                )
                return x, ap

            accept_target = 0.3

        xs, aps = jax.vmap(mutate)(jax.random.split(k_mut, n), particles)
        mean_ap = jnp.mean(aps)
        # crude step-size controller toward the kernel's target acceptance
        step = st.step * jnp.exp(1.0 * (mean_ap - accept_target))
        temps = st.temps.at[st.stage].set(beta_new)
        return State(key, xs, beta_new, log_Z, st.stage + 1, step, temps)

    init = State(
        key,
        x0,
        jnp.asarray(0.0, dtype),
        jnp.asarray(0.0, dtype),
        jnp.int32(0),
        jnp.asarray(step_size, dtype),
        jnp.ones((max_stages,), dtype),
    )
    out = jax.lax.while_loop(stage_cond, stage_body, init)
    return SmcResult(out.particles, out.log_Z, out.stage, out.temps)
