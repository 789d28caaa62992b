"""MCMC diagnostics: split-R̂ and effective sample size.

Used by the benchmark harness (ESS/sec/chip is the north-star metric) and the
statistical test layer; the reference has no diagnostics at all (SURVEY §5).
Implements the split-R̂ and Geyer initial-monotone-sequence ESS of the Stan
reference manual / Vehtari et al. 2021.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def split_rhat(draws: jnp.ndarray) -> jnp.ndarray:
    """Split-R̂ per dimension for draws of shape (n_samples, n_chains, dim)."""
    n, c, d = draws.shape
    half = n // 2
    x = jnp.concatenate([draws[:half], draws[half : 2 * half]], axis=1)  # (half, 2c, d)
    n, c = x.shape[0], x.shape[1]
    chain_mean = jnp.mean(x, axis=0)                     # (2c, d)
    chain_var = jnp.var(x, axis=0, ddof=1)               # (2c, d)
    B = n * jnp.var(chain_mean, axis=0, ddof=1)          # (d,)
    W = jnp.mean(chain_var, axis=0)                      # (d,)
    var_plus = (n - 1) / n * W + B / n
    return jnp.sqrt(var_plus / W)


def ess(draws: jnp.ndarray, max_lag: int | None = None) -> np.ndarray:
    """Bulk ESS per dimension (Geyer initial monotone sequence), NumPy host
    implementation — diagnostics run on summaries, not in the hot path."""
    x = np.asarray(draws, dtype=np.float64)
    n, c, d = x.shape
    if max_lag is None:
        max_lag = min(n - 1, 1000)
    out = np.zeros(d)
    for j in range(d):
        xc = x[:, :, j] - x[:, :, j].mean(0)
        # FFT autocovariance per chain, averaged
        m = 1 << (2 * n - 1).bit_length()
        f = np.fft.rfft(xc, n=m, axis=0)
        acov = np.fft.irfft(f * np.conj(f), n=m, axis=0)[:n].real / n
        rho = acov.mean(1) / acov[0].mean()
        # Geyer pairs
        tau = 1.0
        k = 1
        prev_pair = np.inf
        while k + 1 < max_lag:
            pair = rho[k] + rho[k + 1]
            if pair < 0:
                break
            pair = min(pair, prev_pair)  # monotone
            tau += 2.0 * pair
            prev_pair = pair
            k += 2
        out[j] = n * c / tau
    return out
