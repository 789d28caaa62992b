"""Vectorized Pólya-Gamma sampling on device.

The reference draws ω | f ~ PG(N, f) by calling back into the R package
``pgdraw`` once per Gibbs sweep (src/PGLogitModel.h:20-21,
src/PGLogitModel.cpp:42-45) — a host round-trip per iteration.  Here the
Devroye alternating-series sampler (Polson–Scott–Windle) is vectorized over
the whole batch under ``lax.while_loop`` with per-lane acceptance masks: no
host, no data-dependent shapes, jit- and vmap-compatible.

PG(1, z) = J*(1, z/2)/4 with J* drawn by mixture proposal (truncated
inverse-Gaussian below t = 0.64, truncated exponential above) and the
alternating-series squeeze.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_T = 0.64          # series/proposal cut point
_MAX_ROUNDS = 64   # outer rejection rounds (P(accept) ≳ 0.57 per round)
_MAX_TERMS = 128   # alternating-series terms (decision typically ≤ 10)
_MAX_INNER = 32    # inner rejection rounds for the truncated proposals


def _norm_cdf(x):
    return 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(jnp.asarray(2.0, x.dtype))))


def _a_n(n, x):
    """Series coefficient a_n(x) of the J*(1,·) density (piecewise at t)."""
    np_half = n + 0.5
    pi = jnp.asarray(jnp.pi, x.dtype)
    left = pi * np_half * (2.0 / (pi * x)) ** 1.5 * jnp.exp(-2.0 * np_half**2 / x)
    right = pi * np_half * jnp.exp(-(np_half**2) * pi**2 * x / 2.0)
    return jnp.where(x <= _T, left, right)


def _mass_texpon(z):
    """Mixture weights (p, q): exponential tail mass and truncated-IG mass."""
    pi = jnp.asarray(jnp.pi, z.dtype)
    K = pi**2 / 8.0 + z**2 / 2.0
    t = jnp.asarray(_T, z.dtype)
    p = (pi / (2.0 * K)) * jnp.exp(-K * t)
    sqrt_t = jnp.sqrt(t)
    # IG(μ=1/z, λ=1) CDF at t, written directly in z (finite at z = 0)
    q = 2.0 * jnp.exp(-z) * (
        _norm_cdf((t * z - 1.0) / sqrt_t) + jnp.exp(2.0 * z) * _norm_cdf(-(t * z + 1.0) / sqrt_t)
    )
    return p, q


def _sample_ig(key, mu):
    """Inverse-Gaussian IG(mu, 1) (Michael–Schucany–Haas)."""
    k1, k2 = jax.random.split(key)
    y = jax.random.normal(k1, mu.shape, mu.dtype) ** 2
    x = mu + 0.5 * mu**2 * y - 0.5 * mu * jnp.sqrt(4.0 * mu * y + (mu * y) ** 2)
    u = jax.random.uniform(k2, mu.shape, mu.dtype)
    return jnp.where(u <= mu / (mu + x), x, mu**2 / jnp.maximum(x, 1e-30))


def _sample_rtigauss(key, z):
    """IG(μ=1/z, λ=1) truncated to (0, t]; BayesLogit rtigauss, vectorized.

    Both branch strategies (μ > t: χ² proposal; μ ≤ t: resample IG until ≤ t)
    are advanced simultaneously with acceptance masks."""
    t = jnp.asarray(_T, z.dtype)
    mu = 1.0 / jnp.maximum(z, 1e-10)
    big_mu = mu > t

    def cond(st):
        i, _, done, _ = st
        return jnp.logical_and(i < _MAX_INNER, ~jnp.all(done))

    def body(st):
        i, key, done, x = st
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        # branch A (μ > t): one-sided χ²-style proposal
        e1 = jax.random.exponential(k1, z.shape, z.dtype)
        e2 = jax.random.exponential(k2, z.shape, z.dtype)
        ok_e = e1 * e1 <= 2.0 * e2 / t
        xa = t / (1.0 + t * e1) ** 2
        ua = jax.random.uniform(k3, z.shape, z.dtype)
        acc_a = jnp.logical_and(ok_e, ua <= jnp.exp(-0.5 * z * z * xa))
        # branch B (μ ≤ t): plain IG, accept if ≤ t
        xb = _sample_ig(k4, mu)
        acc_b = xb <= t
        acc = jnp.where(big_mu, acc_a, acc_b)
        prop = jnp.where(big_mu, xa, xb)
        newly = jnp.logical_and(~done, acc)
        x = jnp.where(newly, prop, x)
        done = jnp.logical_or(done, acc)
        return i + 1, key, done, x

    init = (jnp.int32(0), key, jnp.zeros(z.shape, bool), jnp.full(z.shape, 0.5 * t, z.dtype))
    _, _, _, x = jax.lax.while_loop(cond, body, init)
    return x


def _series_accept(key, x):
    """Alternating-series accept/reject for a proposal x of J*(1, z)."""
    s0 = _a_n(jnp.zeros((), x.dtype), x)
    y = jax.random.uniform(key, x.shape, x.dtype) * s0

    def cond(st):
        n, _, decided, _ = st
        return jnp.logical_and(n < _MAX_TERMS, ~jnp.all(decided))

    def body(st):
        n, s, decided, accept = st
        n = n + 1
        a = _a_n(n.astype(x.dtype), x)
        odd = n % 2 == 1
        s = jnp.where(odd, s - a, s + a)
        dec_acc = jnp.logical_and(odd, y <= s)
        dec_rej = jnp.logical_and(~odd, y > s)
        newly = jnp.logical_and(~decided, jnp.logical_or(dec_acc, dec_rej))
        accept = jnp.where(jnp.logical_and(newly, dec_acc), True, accept)
        decided = jnp.logical_or(decided, newly)
        return n, s, decided, accept

    init = (
        jnp.int32(0),
        s0,
        jnp.zeros(x.shape, bool),
        jnp.zeros(x.shape, bool),
    )
    _, _, decided, accept = jax.lax.while_loop(cond, body, init)
    # undecided after _MAX_TERMS (prob ~0): accept, the partial sums have converged
    return jnp.logical_or(accept, ~decided)


def _sample_jstar(key, z):
    """J*(1, z) for z ≥ 0, batched over z's shape."""

    def cond(st):
        i, _, done, _ = st
        return jnp.logical_and(i < _MAX_ROUNDS, ~jnp.all(done))

    def body(st):
        i, key, done, x = st
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        p, q = _mass_texpon(z)
        ratio = p / (p + q)
        use_tail = jax.random.uniform(k1, z.shape, z.dtype) < ratio
        pi = jnp.asarray(jnp.pi, z.dtype)
        Kz = pi**2 / 8.0 + z**2 / 2.0
        x_tail = _T + jax.random.exponential(k2, z.shape, z.dtype) / Kz
        x_ig = _sample_rtigauss(k3, z)
        prop = jnp.where(use_tail, x_tail, x_ig)
        acc = _series_accept(k4, prop)
        newly = jnp.logical_and(~done, acc)
        x = jnp.where(newly, prop, x)
        done = jnp.logical_or(done, acc)
        return i + 1, key, done, x

    init = (jnp.int32(0), key, jnp.zeros(z.shape, bool), jnp.full(z.shape, _T, z.dtype))
    _, _, _, x = jax.lax.while_loop(cond, body, init)
    return x


def polya_gamma(key: jax.Array, c: jnp.ndarray) -> jnp.ndarray:
    """One PG(1, c) draw per element of c."""
    z = jnp.abs(c) / 2.0
    return _sample_jstar(key, z) / 4.0


def polya_gamma_int(key: jax.Array, b: int, c: jnp.ndarray) -> jnp.ndarray:
    """PG(b, c) for a static integer b ≥ 1 as a sum of b PG(1, c) draws
    (pgdraw's integer-b semantics, src/PGLogitModel.cpp:42-45)."""
    keys = jax.random.split(key, b)
    draws = jax.vmap(lambda k: polya_gamma(k, c))(keys)
    return jnp.sum(draws, axis=0)


def polya_gamma_counts(key: jax.Array, N: jnp.ndarray, c: jnp.ndarray, max_n: int) -> jnp.ndarray:
    """PG(N_i, c_i) with per-element integer counts N_i ≤ max_n (static bound):
    masked sum of max_n PG(1, c) draws."""
    keys = jax.random.split(key, max_n)
    draws = jax.vmap(lambda k: polya_gamma(k, c))(keys)  # (max_n, m)
    mask = jnp.arange(max_n)[:, None] < N[None, :]
    return jnp.sum(draws * mask, axis=0)
