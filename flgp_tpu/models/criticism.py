"""Model criticism: held-out negative log likelihood.

Analytic Gaussian NLL for regression; Monte-Carlo integration of the
Bernoulli likelihood under the Gaussian posterior for (multi)classification,
with the reference's 100 samples and 1e-2 stabilizer (src/Utils.cpp:302-336).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import EPS


def nll_regression(mean: jnp.ndarray, cov: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Gaussian predictive NLL (src/Utils.cpp:305-306)."""
    sq = (target - mean) ** 2 / cov
    return (jnp.mean(sq + jnp.log(cov + EPS)) + jnp.log(2.0 * jnp.pi)) / 2.0


def nll_classification(
    key: jax.Array,
    mean: jnp.ndarray,
    cov: jnp.ndarray,
    target: jnp.ndarray,
    n_samples: int = 100,
) -> jnp.ndarray:
    """MC estimate of the Bernoulli predictive NLL (src/Utils.cpp:321-336)."""
    n = mean.shape[0]
    eps = jax.random.normal(key, (n, n_samples), mean.dtype)
    f = mean[:, None] + jnp.sqrt(jnp.maximum(cov, 0.0))[:, None] * eps
    pi = jax.nn.sigmoid(f)
    like = pi * target[:, None] + (1.0 - pi) * (1.0 - target[:, None])
    like = jnp.mean(like, axis=1)
    return -jnp.mean(jnp.log(like + 1e-2))


def negative_log_likelihood(
    key: jax.Array,
    mean: jnp.ndarray,
    cov: jnp.ndarray,
    target: jnp.ndarray,
    kind: str = "regression",
    n_samples: int = 100,
) -> jnp.ndarray:
    """Dispatch on task kind (src/Utils.cpp:302-318)."""
    if kind == "regression":
        return nll_regression(mean, cov, target)
    if kind == "binary":
        return nll_classification(key, mean, cov, target, n_samples)
    if kind == "multinomial":
        J = mean.shape[1]
        onehot = jax.nn.one_hot(target.astype(jnp.int32), J, dtype=mean.dtype)
        keys = jax.random.split(key, J)
        nlls = jax.vmap(
            lambda k, mu, cv, y: nll_classification(k, mu, cv, y, n_samples)
        )(keys, mean.T, cov.T, onehot.T)
        return jnp.sum(nlls)
    raise ValueError(f"unknown criticism kind: {kind}")
