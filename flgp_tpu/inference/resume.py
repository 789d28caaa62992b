"""Checkpointed, bit-exact-resumable sampling and grid search.

The reference's runs are single synchronous calls — an interrupted 100k-sweep
chain or 10-point bandwidth grid restarts from zero (SURVEY §5
checkpoint/resume).  Here long HMC runs execute in fixed-size segments whose
PRNG keys derive deterministically from (base key, segment index); each
segment's draws and the carried chain state persist through orbax, so a
killed run resumes from the last completed segment and produces *identical*
draws to an uninterrupted run (tested in tests/test_resume.py).
"""

from __future__ import annotations

import os
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.checkpoint import load_pytree, save_pytree
from .hmc import (
    HmcRun,
    da_init,
    da_update,
    hmc_kernel,
    init_state,
    _find_reasonable_step,
)


class HmcPhase(NamedTuple):
    """Post-warmup sampling state carried between segments."""

    x: jnp.ndarray          # (C, dim) current positions
    step: jnp.ndarray       # (C,) adapted step sizes
    inv_mass: jnp.ndarray   # (C, dim) adapted diagonal inverse mass


def hmc_warmup(
    key: jax.Array,
    logprob: Callable,
    x0: jnp.ndarray,
    n_warmup: int,
    n_leapfrog: int = 16,
    target_accept: float = 0.8,
) -> HmcPhase:
    """Dual-averaging warmup (identical schedule to inference.hmc.run_hmc),
    returning the frozen sampling phase."""

    def one_chain(k, x0_c):
        state = init_state(logprob, x0_c)
        inv_mass0 = jnp.ones_like(x0_c)
        k_init, k_warm = jax.random.split(k)
        step0 = _find_reasonable_step(logprob, state, inv_mass0, k_init, x0_c.dtype)
        da = da_init(step0)

        def body(carry, kk):
            st, da = carry
            st, ap = hmc_kernel(logprob, kk, st, jnp.exp(da.log_step), inv_mass0, n_leapfrog)
            da = da_update(da, ap, target_accept)
            return (st, da), st.x

        (state, da), draws = jax.lax.scan(
            body, (state, da), jax.random.split(k_warm, n_warmup)
        )
        half = draws[n_warmup // 2:]
        var = jnp.var(half, axis=0)
        w = half.shape[0]
        inv_mass = (w / (w + 5.0)) * var + 1e-3 * (5.0 / (w + 5.0))
        return state.x, jnp.exp(da.log_step_avg), inv_mass

    keys = jax.random.split(key, x0.shape[0])
    x, step, inv_mass = jax.vmap(one_chain)(keys, x0)
    return HmcPhase(x, step, inv_mass)


def hmc_segment(
    key: jax.Array,
    logprob: Callable,
    phase: HmcPhase,
    n_sweeps: int,
    n_leapfrog: int = 16,
):
    """Run ``n_sweeps`` fixed-parameter HMC sweeps from ``phase``; returns
    (draws (n_sweeps, C, dim), accept (n_sweeps, C), new phase)."""

    def one_chain(k, x_c, step_c, im_c):
        state = init_state(logprob, x_c)

        def body(st, kk):
            st, ap = hmc_kernel(logprob, kk, st, step_c, im_c, n_leapfrog)
            return st, (st.x, ap)

        state, (draws, aps) = jax.lax.scan(body, state, jax.random.split(k, n_sweeps))
        return draws, aps, state.x

    keys = jax.random.split(key, phase.x.shape[0])
    draws, aps, x = jax.vmap(one_chain)(keys, phase.x, phase.step, phase.inv_mass)
    return (
        jnp.swapaxes(draws, 0, 1),
        jnp.swapaxes(aps, 0, 1),
        HmcPhase(x, phase.step, phase.inv_mass),
    )


def run_hmc_checkpointed(
    key: jax.Array,
    logprob: Callable,
    x0: jnp.ndarray,
    ckpt_dir: str,
    n_warmup: int = 256,
    n_samples: int = 1024,
    segment: int = 256,
    n_leapfrog: int = 16,
    target_accept: float = 0.8,
) -> HmcRun:
    """Segmented HMC with kill-and-resume semantics.

    Segment keys are fold_in(key, 1 + segment index) and warmup uses
    fold_in(key, 0), so the draw stream is a pure function of (key, shapes) —
    a resumed run and an uninterrupted run produce identical samples.
    Checkpoints land in ``ckpt_dir``: ``phase_<i>`` after segment i, plus
    ``seg_<i>`` holding that segment's draws.
    """
    n_segments = -(-n_samples // segment)
    os.makedirs(ckpt_dir, exist_ok=True)

    def seg_path(i):
        return os.path.join(ckpt_dir, f"seg_{i}")

    def phase_path(i):
        return os.path.join(ckpt_dir, f"phase_{i}")

    # resume point: the last i with both phase_i and seg_i on disk
    done = 0
    for i in range(n_segments):
        if os.path.isdir(phase_path(i)) and os.path.isdir(seg_path(i)):
            done = i + 1
        else:
            break

    if done == 0:
        phase = hmc_warmup(
            jax.random.fold_in(key, 0), logprob, x0, n_warmup, n_leapfrog, target_accept
        )
    else:
        # no `like=` spec: restore at the exact saved dtypes (a cast would
        # break bit-exact resume)
        tree = load_pytree(phase_path(done - 1))
        phase = HmcPhase(
            jnp.asarray(tree["x"]), jnp.asarray(tree["step"]), jnp.asarray(tree["inv_mass"])
        )

    seg_fn = jax.jit(
        lambda k, ph: hmc_segment(k, logprob, ph, segment, n_leapfrog)
    )
    for i in range(done, n_segments):
        draws, aps, phase = seg_fn(jax.random.fold_in(key, 1 + i), phase)
        save_pytree(seg_path(i), {"draws": draws, "accept": aps})
        save_pytree(phase_path(i), phase._asdict())

    all_draws, all_aps = [], []
    for i in range(n_segments):
        tree = load_pytree(seg_path(i))
        all_draws.append(np.asarray(tree["draws"]))
        all_aps.append(np.asarray(tree["accept"]))
    samples = jnp.asarray(np.concatenate(all_draws)[:n_samples])
    accept = jnp.asarray(np.concatenate(all_aps)[:n_samples])
    return HmcRun(samples, accept, phase.step, phase.inv_mass)
