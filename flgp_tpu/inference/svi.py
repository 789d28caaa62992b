"""Stochastic variational inference for the whitened spectral GP models.

Mean-field Gaussian posterior over the flattened parameter vector (latent u
plus log-hyperparameters) trained with reparameterized ELBO gradients.  The
reference has no variational inference at all; this is the cheap-inference
tier of the stack (BASELINE.json north star: "stochastic VI").
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

LogProbFn = Callable[[jnp.ndarray], jnp.ndarray]


class MeanField(NamedTuple):
    mu: jnp.ndarray
    log_scale: jnp.ndarray

    def sample(self, key: jax.Array, n: int) -> jnp.ndarray:
        eps = jax.random.normal(key, (n,) + self.mu.shape, self.mu.dtype)
        return self.mu + jnp.exp(self.log_scale) * eps

    def entropy(self) -> jnp.ndarray:
        d = self.mu.shape[0]
        return 0.5 * d * (1.0 + jnp.log(2.0 * jnp.pi)) + jnp.sum(self.log_scale)


class SviResult(NamedTuple):
    posterior: MeanField
    elbo_trace: jnp.ndarray


def fit_svi(
    key: jax.Array,
    logprob: LogProbFn,
    dim: int,
    steps: int = 1000,
    n_mc: int = 8,
    lr: float = 0.02,
    init_mu: jnp.ndarray | None = None,
    dtype=jnp.float32,
) -> SviResult:
    """Maximize the ELBO E_q[log p(x)] + H(q) with Adam on (μ, log σ)."""
    mu0 = jnp.zeros((dim,), dtype) if init_mu is None else init_mu.astype(dtype)
    params0 = MeanField(mu0, jnp.full((dim,), -2.0, dtype))

    def neg_elbo(params: MeanField, k):
        xs = params.sample(k, n_mc)
        lp = jnp.mean(jax.vmap(logprob)(xs))
        return -(lp + params.entropy())

    opt_b1, opt_b2 = 0.9, 0.999

    def step(carry, kk):
        params, m, v, i = carry
        loss, grads = jax.value_and_grad(neg_elbo)(params, kk)
        m = jax.tree_util.tree_map(lambda a, g: opt_b1 * a + (1 - opt_b1) * g, m, grads)
        v = jax.tree_util.tree_map(lambda a, g: opt_b2 * a + (1 - opt_b2) * g * g, v, grads)
        ic = i + 1.0
        params = jax.tree_util.tree_map(
            lambda p, mm, vv: p
            - lr * (mm / (1 - opt_b1**ic)) / (jnp.sqrt(vv / (1 - opt_b2**ic)) + 1e-8),
            params,
            m,
            v,
        )
        return (params, m, v, ic), -loss

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params0)
    (params, _, _, _), elbo = jax.lax.scan(
        step, (params0, zeros, zeros, jnp.asarray(0.0, dtype)), jax.random.split(key, steps)
    )
    return SviResult(params, elbo)
