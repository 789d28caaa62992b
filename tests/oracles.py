"""NumPy oracles implementing the reference's model-layer math directly.

Independent transcriptions of the formulas in /root/reference/src/train.cpp,
Predict.cpp and Utils.cpp, used to validate the JAX implementations.
"""

import numpy as np


def heat_kernel_np(values, vectors, K, t, idx0, idx1):
    lam = 1.0 - values[:K]
    V0 = vectors[np.asarray(idx0)][:, :K]
    V1 = vectors[np.asarray(idx1)][:, :K]
    return V0 @ np.diag(np.exp(-t * lam)) @ V1.T


def gpr_nmll_direct_np(values, vectors, Y, idx, K, t, noise, sigma):
    """Direct-branch NMLL (src/train.cpp:362-392)."""
    Y = Y[:, None] if Y.ndim == 1 else Y
    m, q = Y.shape
    C = heat_kernel_np(values, vectors, K, t, idx, idx)
    C = C + np.eye(m) * (noise + sigma)
    L = np.linalg.cholesky(C)
    alpha = np.linalg.solve(C, Y)
    nmll = 0.5 * np.sum(Y * alpha) / q
    nmll += np.sum(np.log(np.diag(L) + 1e-9))
    return nmll


def gpr_nmll_woodbury_np(values, vectors, Y, idx, K, t, noise, sigma):
    """Woodbury-branch NMLL (src/train.cpp:393-433)."""
    Y = Y[:, None] if Y.ndim == 1 else Y
    m, q = Y.shape
    lam = 1.0 - values[:K]
    V = vectors[np.asarray(idx)][:, :K]
    ls = np.exp(-0.5 * t * lam)
    Q = np.diag(ls) @ V.T @ V @ np.diag(ls) + (noise + sigma) * np.eye(K)
    LQ = np.linalg.cholesky(Q)
    alpha = (Y - V @ np.diag(ls) @ np.linalg.solve(Q, np.diag(ls) @ (V.T @ Y))) / (noise + sigma)
    nmll = 0.5 * np.sum(Y * alpha) / q
    nmll += np.sum(np.log(np.diag(LQ) + 1e-9))
    nmll += 0.5 * (m - K) * np.log(noise + sigma)
    return nmll


def gpr_nmll_diff_noise_direct_np(values, vectors, Y, idx, K, t, noise_vec, sigma):
    """Per-point-noise direct-branch NMLL + the reference's hand-derived
    gradients, pre-clipping (src/train.cpp:470-499).  Returns
    (nmll, grad_t, grad_noise (m,))."""
    Y = Y[:, None] if Y.ndim == 1 else Y
    m, q = Y.shape
    C = heat_kernel_np(values, vectors, K, t, idx, idx)
    C = C + np.diag(noise_vec + sigma)
    L = np.linalg.cholesky(C)
    alpha = np.linalg.solve(C, Y)
    nmll = 0.5 * np.sum(Y * alpha) / q
    nmll += np.sum(np.log(np.diag(L) + 1e-9))

    # GPML Eq 5.9: U = ααᵀ/q − C⁻¹; ∂C/∂t = V·(−λ·e^{−tλ})·Vᵀ; ∂C/∂zᵢ = eᵢeᵢᵀ
    C_inv = np.linalg.solve(C, np.eye(m))
    U = alpha @ alpha.T / q - C_inv
    lam = 1.0 - values[:K]
    V = vectors[np.asarray(idx)][:, :K]
    grad_t_mat = V @ np.diag(-lam * np.exp(-t * lam)) @ V.T
    grad_t = -0.5 * np.sum(U * grad_t_mat.T)
    grad_noise = -0.5 * np.diag(U)
    return nmll, grad_t, grad_noise


def gpr_nmll_diff_noise_woodbury_np(values, vectors, Y, idx, K, t, noise_vec, sigma):
    """Per-point-noise Woodbury-branch NMLL + the reference's hand-derived
    gradients, pre-clipping (src/train.cpp:500-551).  Returns
    (nmll, grad_t, grad_noise (m,))."""
    Y = Y[:, None] if Y.ndim == 1 else Y
    m, q = Y.shape
    lam = 1.0 - values[:K]
    V = vectors[np.asarray(idx)][:, :K]
    ls = np.exp(-0.5 * t * lam)
    z = noise_vec + sigma
    z_inv = 1.0 / z
    VtZiV = V.T @ (z_inv[:, None] * V)
    Q = np.diag(ls) @ VtZiV @ np.diag(ls) + np.eye(K)
    LQ = np.linalg.cholesky(Q)
    alpha = z_inv[:, None] * Y - z_inv[:, None] * (
        V @ (np.diag(ls) @ np.linalg.solve(Q, np.diag(ls) @ (V.T @ (z_inv[:, None] * Y))))
    )
    nmll = 0.5 * np.sum(Y * alpha) / q
    nmll += np.sum(np.log(np.diag(LQ) + 1e-9))
    nmll += 0.5 * np.sum(np.log(z + 1e-9))

    Q_inv = np.linalg.solve(Q, np.eye(K))
    A = np.diag(-lam * np.exp(-t * lam))
    grad_t = -0.5 * np.sum(alpha * ((alpha.T @ V) @ A @ V.T).T) / q
    grad_t += 0.5 * np.trace(A @ VtZiV)
    grad_t += -0.5 * np.sum(
        (Q_inv @ np.diag(ls) @ VtZiV) * (A @ VtZiV @ np.diag(ls)).T
    )
    grad_noise = np.empty(m)
    for i in range(m):
        grad_noise[i] = -0.5 * np.sum(alpha[i] * alpha[i]) / q
        tmp = z_inv[i] * V[i] @ np.diag(ls)
        grad_noise[i] += 0.5 * (z_inv[i] - (tmp @ Q_inv) @ tmp)
    return nmll, grad_t, grad_noise


def laplace_marginal_np(C, Y, N, tol=1e-5, max_iter=100):
    """GPC Laplace marginal (src/train.cpp:716-760)."""
    m = len(Y)
    f = np.zeros(m)
    a = np.zeros(m)
    logdet = 0.0
    for _ in range(max_iter):
        pi = 1.0 / (1.0 + np.exp(-f))
        W = N * pi * (1.0 - pi)
        sw = np.sqrt(W)
        B = np.eye(m) + sw[:, None] * C * sw[None, :]
        LB = np.linalg.cholesky(B)
        b = W * f + (Y - N * pi)
        a = b - sw * np.linalg.solve(B, sw * (C @ b))
        f_new = C @ a
        logdet = np.sum(np.log(np.diag(LB) + 1e-9))
        delta = np.sum(np.abs(f - f_new))
        f = f_new
        if delta < tol:
            break
    pi = 1.0 / (1.0 + np.exp(-f))
    amll = -0.5 * np.sum(a * f)
    amll += np.sum(Y * np.log(pi) + (N - Y) * np.log(1 - pi))
    amll -= logdet
    return amll


def posterior_classification_np(C11, C21, C22, Y, tol=1e-5, max_iter=100):
    """Laplace predictive moments (src/Utils.cpp:252-299)."""
    m = len(Y)
    f = np.zeros(m)
    for _ in range(max_iter):
        pi = 1.0 / (1.0 + np.exp(-f))
        W = pi * (1 - pi)
        sw = np.sqrt(W)
        B = np.eye(m) + sw[:, None] * C11 * sw[None, :]
        b = W * f + (Y - pi)
        a = b - sw * np.linalg.solve(B, sw * (C11 @ b))
        f_new = C11 @ a
        delta = np.sum(np.abs(f - f_new))
        f = f_new
        if delta < tol:
            break
    pi = 1.0 / (1.0 + np.exp(-f))
    W = pi * (1 - pi)
    sw = np.sqrt(W)
    B = np.eye(m) + sw[:, None] * C11 * sw[None, :]
    mean = C21 @ (Y - pi)
    beta = sw[:, None] * np.linalg.inv(B) * sw[None, :]
    cov = C22 - np.sum((C21 @ beta) * C21, axis=1)
    return mean, cov


def pg_mean_np(z):
    """E[PG(1, z)] = tanh(z/2)/(2z)."""
    z = np.asarray(z, dtype=float)
    out = np.where(np.abs(z) < 1e-6, 0.25, np.tanh(z / 2.0) / (2.0 * np.where(z == 0, 1, z)))
    return out
