"""Hamiltonian Monte Carlo with dual-averaging and mass adaptation.

The reference's only posterior sampler is the PG Gibbs chain with host
callbacks (src/PGLogitModel.cpp).  This module is the general-purpose
replacement: leapfrog HMC over arbitrary differentiable log posteriors (the
whitened spectral GP models in ``models.latent``), fully batched over chains
with vmap — the chain axis shards across devices in ``parallel.mcmc``.

Warmup follows the Stan schedule: dual-averaging step size (Nesterov 2009 /
Hoffman & Gelman 2014) plus windowed diagonal mass-matrix estimation.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

LogProbFn = Callable[[jnp.ndarray], jnp.ndarray]


class HmcState(NamedTuple):
    x: jnp.ndarray
    logp: jnp.ndarray
    grad: jnp.ndarray


class DualAveragingState(NamedTuple):
    log_step: jnp.ndarray
    log_step_avg: jnp.ndarray
    h_sum: jnp.ndarray
    mu: jnp.ndarray
    count: jnp.ndarray


def init_state(logprob: LogProbFn, x0: jnp.ndarray) -> HmcState:
    logp, grad = jax.value_and_grad(logprob)(x0)
    return HmcState(x0, logp, grad)


def leapfrog(
    logprob: LogProbFn,
    state: HmcState,
    p: jnp.ndarray,
    step: jnp.ndarray,
    inv_mass: jnp.ndarray,
    n_steps: int,
) -> Tuple[HmcState, jnp.ndarray]:
    """n_steps leapfrog integration steps (velocity Verlet)."""

    def body(carry, _):
        st, p = carry
        p_half = p + 0.5 * step * st.grad
        x_new = st.x + step * inv_mass * p_half
        logp, grad = jax.value_and_grad(logprob)(x_new)
        p_new = p_half + 0.5 * step * grad
        return (HmcState(x_new, logp, grad), p_new), None

    (st, p), _ = jax.lax.scan(body, (state, p), None, length=n_steps)
    return st, p


def hmc_kernel(
    logprob: LogProbFn,
    key: jax.Array,
    state: HmcState,
    step: jnp.ndarray,
    inv_mass: jnp.ndarray,
    n_steps: int,
) -> Tuple[HmcState, jnp.ndarray]:
    """One HMC transition; returns (state, acceptance probability)."""
    k_mom, k_acc = jax.random.split(key)
    p0 = jax.random.normal(k_mom, state.x.shape, state.x.dtype) / jnp.sqrt(inv_mass)
    new, p1 = leapfrog(logprob, state, p0, step, inv_mass, n_steps)
    ke0 = 0.5 * jnp.sum(inv_mass * p0 * p0)
    ke1 = 0.5 * jnp.sum(inv_mass * p1 * p1)
    log_accept = (new.logp - ke1) - (state.logp - ke0)
    log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
    accept_prob = jnp.minimum(1.0, jnp.exp(log_accept))
    take = jax.random.uniform(k_acc, (), state.x.dtype) < accept_prob
    out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(take, a, b), new, state
    )
    return out, accept_prob


def da_init(step0: jnp.ndarray) -> DualAveragingState:
    log_step = jnp.log(step0)
    return DualAveragingState(
        log_step, log_step, jnp.zeros_like(step0), jnp.log(10.0 * step0), jnp.zeros_like(step0)
    )


def da_update(da: DualAveragingState, accept_prob: jnp.ndarray, target: float = 0.8) -> DualAveragingState:
    """Nesterov dual-averaging step-size update (NUTS paper, Alg 5)."""
    gamma, t0, kappa = 0.05, 10.0, 0.75
    count = da.count + 1.0
    eta_h = 1.0 / (count + t0)
    h_sum = (1.0 - eta_h) * da.h_sum + eta_h * (target - accept_prob)
    log_step = da.mu - jnp.sqrt(count) / gamma * h_sum
    eta = count ** (-kappa)
    log_step_avg = eta * log_step + (1.0 - eta) * da.log_step_avg
    return DualAveragingState(log_step, log_step_avg, h_sum, da.mu, count)


class HmcRun(NamedTuple):
    samples: jnp.ndarray        # (n_samples, n_chains, dim)
    accept_prob: jnp.ndarray    # (n_samples, n_chains)
    step: jnp.ndarray           # (n_chains,)
    inv_mass: jnp.ndarray       # (n_chains, dim)


def _find_reasonable_step(logprob, state, inv_mass, key, dtype):
    """Coarse initial step: double/halve until acceptance crosses 0.5
    (NUTS paper Alg 4), bounded iterations."""

    def accept_at(step, k):
        _, ap = hmc_kernel(logprob, k, state, step, inv_mass, 1)
        return ap

    step0 = jnp.asarray(1.0, dtype)
    ap0 = accept_at(step0, key)
    direction = jnp.where(ap0 > 0.5, 1.0, -1.0)

    def cond(carry):
        i, step, ap = carry
        crossed = jnp.where(direction > 0, ap < 0.5, ap > 0.5)
        return jnp.logical_and(i < 20, ~crossed)

    def body(carry):
        i, step, _ = carry
        step_new = step * jnp.exp2(direction)
        ap = accept_at(step_new, jax.random.fold_in(key, i))
        return i + 1, step_new, ap

    _, step, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), step0, ap0))
    return step


def run_hmc(
    key: jax.Array,
    logprob: LogProbFn,
    x0: jnp.ndarray,
    n_warmup: int = 500,
    n_samples: int = 1000,
    n_leapfrog: int = 16,
    target_accept: float = 0.8,
    jitter_steps: bool = True,
) -> HmcRun:
    """Adaptive HMC for a batch of chains: x0 has shape (n_chains, dim).

    Everything vmaps over the chain axis; warmup adapts step size per chain
    (dual averaging) and a shared-shape diagonal inverse mass from the second
    half of warmup draws.
    """
    n_chains, dim = x0.shape
    dtype = x0.dtype

    def one_chain(key, x0_c):
        state = init_state(logprob, x0_c)
        inv_mass0 = jnp.ones((dim,), dtype)
        k_init, k_warm, k_main = jax.random.split(key, 3)
        step0 = _find_reasonable_step(logprob, state, inv_mass0, k_init, dtype)
        da0 = da_init(step0)

        def warm_body(carry, k):
            state, da, inv_mass = carry
            n_lf = n_leapfrog
            state, ap = hmc_kernel(logprob, k, state, jnp.exp(da.log_step), inv_mass, n_lf)
            da = da_update(da, ap, target_accept)
            return (state, da, inv_mass), state.x

        (state, da, _), warm_draws = jax.lax.scan(
            warm_body, (state, da0, inv_mass0), jax.random.split(k_warm, n_warmup)
        )
        # diagonal mass from the second half of warmup (regularized, Stan-style)
        half = warm_draws[n_warmup // 2:]
        var = jnp.var(half, axis=0)
        w = half.shape[0]
        inv_mass = (w / (w + 5.0)) * var + 1e-3 * (5.0 / (w + 5.0))
        step = jnp.exp(da.log_step_avg)

        def main_body(carry, kk):
            state = carry
            k_step, k_jit = jax.random.split(kk)
            if jitter_steps:
                # uniform step-size jitter breaks periodic-orbit resonance
                # while keeping the trajectory length static for XLA
                scale = jax.random.uniform(k_jit, (), dtype, 0.8, 1.0)
            else:
                scale = jnp.asarray(1.0, dtype)
            state, ap = hmc_kernel(logprob, k_step, state, step * scale, inv_mass, n_leapfrog)
            return state, (state.x, ap)

        state, (draws, aps) = jax.lax.scan(main_body, state, jax.random.split(k_main, n_samples))
        return draws, aps, step, inv_mass

    draws, aps, step, inv_mass = jax.vmap(one_chain)(jax.random.split(key, n_chains), x0)
    # reorder to (n_samples, n_chains, dim)
    return HmcRun(jnp.swapaxes(draws, 0, 1), jnp.swapaxes(aps, 0, 1), step, inv_mass)
