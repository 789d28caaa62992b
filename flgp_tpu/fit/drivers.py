"""Fit drivers: one per method × task, mirroring the reference's 12 public
entry points plus the covariance-only and eigenmap extras
(src/Fit.cpp, NAMESPACE:5-16).

Every driver is a thin host-side orchestrator around a single jitted pipeline:
basis construction, empirical-Bayes hyperparameter learning (bandwidth grids
vmapped instead of the serial loop at src/Fit.cpp:147-178), prediction and
posterior moments all compile into one XLA program per configuration.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Approach, FitConfig, GraphConfig, KernelType, NoiseModel, default_a2s
from ..inference.optimize import GprOptResult, minimize_1d_log, minimize_t_noise, minimize_t_noisevec
from ..inference.pg_gibbs import test_pgbinary
from ..models import gpc as gpc_mod
from ..models import gpr as gpr_mod
from ..ops import linalg
from ..ops.heat_kernel import heat_kernel, heat_kernel_diag
from ..types import EigenPair
from . import spectral


@dataclasses.dataclass
class FitResult:
    """Mirror of the reference's returned R list (src/Fit.cpp:90-97)."""

    y_train: np.ndarray
    y_test: np.ndarray
    posterior_mean: np.ndarray
    posterior_cov: np.ndarray
    pars: Dict[str, np.ndarray]
    obj: float
    C: Optional[np.ndarray] = None
    eigenpair: Optional[EigenPair] = None
    # per-stage wall-clock + solver residuals, populated when a
    # MetricsReport is passed to the driver (SURVEY §5 observability)
    metrics: Optional[Dict[str, float]] = None


def _concat_all(X, X_new, dtype):
    X = jnp.asarray(X, dtype)
    X_new = jnp.asarray(X_new, dtype)
    return jnp.concatenate([X, X_new], axis=0), X.shape[0], X.shape[0] + X_new.shape[0]


def _solve_cast(cfg: FitConfig, eigenpair: EigenPair, *arrays):
    """Cast the spectral pair + data to ``cfg.solve_dtype`` for the solve
    tail (see config.FitConfig.solve_dtype).  No-op when unset."""
    dt = cfg.solve_dtype
    if dt is None or dt == cfg.dtype:
        return cfg, eigenpair, arrays
    cfg = dataclasses.replace(cfg, dtype=dt)
    eigenpair = EigenPair(eigenpair.values.astype(dt), eigenpair.vectors.astype(dt))
    return cfg, eigenpair, tuple(a.astype(dt) for a in arrays)


# ---------------------------------------------------------------------------
# Shared train/predict tails
# ---------------------------------------------------------------------------


def _train_gpr(eigenpair: EigenPair, Y, idx, K: int, cfg: FitConfig) -> GprOptResult:
    tc = cfg.train
    posterior = tc.approach == Approach.POSTERIOR

    if tc.noise == NoiseModel.SAME:
        def fn(t, noise):
            if posterior:
                return gpr_mod.gpr_nmll_posterior(
                    eigenpair, Y, idx, K, t, noise, cfg.sigma,
                    p=tc.prior_p_gpr, q=tc.prior_q, tau=tc.prior_tau,
                    alpha=tc.prior_alpha, beta=tc.prior_beta,
                )
            return gpr_mod.gpr_nmll(eigenpair, Y, idx, K, t, noise, cfg.sigma)

        return minimize_t_noise(
            fn, t_lb=tc.t_lb, noise_lb=tc.noise_lb,
            adam_steps=tc.adam_steps, adam_lr=tc.adam_lr, dtype=cfg.dtype,
        )

    m = idx.shape[0]

    def fnv(t, noise_vec):
        if posterior:
            return gpr_mod.gpr_nmll_posterior(
                eigenpair, Y, idx, K, t, noise_vec, cfg.sigma,
                p=tc.prior_p_gpr, q=tc.prior_q, tau=tc.prior_tau,
                alpha=tc.prior_alpha, beta=tc.prior_beta,
            )
        return gpr_mod.gpr_nmll(eigenpair, Y, idx, K, t, noise_vec, cfg.sigma)

    return minimize_t_noisevec(
        fnv, m, t_lb=tc.t_lb, noise_lb=tc.noise_lb, t0=tc.t0, noise0=tc.noise0,
        adam_steps=max(tc.adam_steps, 400), adam_lr=tc.adam_lr, dtype=cfg.dtype,
    )


def _train_gpc(eigenpair: EigenPair, Y, N, idx, K: int, cfg: FitConfig):
    tc = cfg.train

    def obj_at(t, max_iter):
        if tc.approach == Approach.POSTERIOR:
            return gpc_mod.gpc_nlp_objective(
                eigenpair, Y, N, idx, K, t, cfg.sigma,
                p=tc.prior_p_gpc, q=tc.prior_q, tau=tc.prior_tau,
                tol=tc.newton_tol, max_iter=max_iter,
            )
        return gpc_mod.gpc_nmll_objective(
            eigenpair, Y, N, idx, K, t, cfg.sigma,
            tol=tc.newton_tol, max_iter=max_iter,
        )

    # coarse scan lanes at extreme t run Newton to the full iteration cap
    # and the batched while_loop serializes to the WORST lane — a reduced
    # budget ranks grid cells just as well (the landscape separates cells by
    # orders of magnitude); refinement keeps the reference's full budget.
    # Safety margin: refinement spans [cell-1, cell+1] of the surrogate
    # argmin with the EXACT objective, so a surrogate misranking only
    # matters if it is off by ≥2 coarse cells — requiring 30-iteration
    # Newton error (quadratic convergence ⇒ ~machine-eps except at t values
    # whose objective is orders of magnitude off-optimal) to exceed two
    # whole inter-cell objective gaps
    coarse_cap = min(30, tc.newton_max_iter)
    return minimize_1d_log(
        lambda t: obj_at(t, tc.newton_max_iter),
        lo=tc.t_lb, hi=tc.t_ub, n_grid=tc.grid_size, dtype=cfg.dtype,
        coarse_fn=lambda t: obj_at(t, coarse_cap),
    )


def _gpr_tail(eigenpair: EigenPair, Y, m: int, n: int, K: int, cfg: FitConfig, t, noise):
    """Prediction + posterior for regression (src/Fit.cpp:64-97)."""
    idx0 = jnp.arange(m)
    idx1 = jnp.arange(m, n)
    train_pred = gpr_mod.gpr_predict(eigenpair, Y, idx0, idx0, K, t, noise, cfg.sigma)
    test_pred = gpr_mod.gpr_predict(eigenpair, Y, idx0, idx1, K, t, noise, cfg.sigma)
    # posterior covariance follows the reference in using the scalar noise
    # (pars[1]) even under the per-point model (src/Utils.cpp:215-220)
    noise0 = noise if jnp.ndim(noise) == 0 else noise[0]
    cov = gpr_mod.gpr_posterior_cov(eigenpair, idx0, idx1, K, t, noise0, cfg.sigma)
    out = dict(train=train_pred, test=test_pred, cov=cov)
    if cfg.output_cov:
        Cvv = heat_kernel(eigenpair, t, K, idx0, idx0)
        Cnv = heat_kernel(eigenpair, t, K, idx1, idx0)
        out["C"] = jnp.concatenate([Cvv, Cnv], axis=0)
    return out


def _gpc_tail(key, eigenpair: EigenPair, Y, N, m: int, n: int, K: int, cfg: FitConfig, t, max_count: int):
    """PG-Gibbs labels + Laplace posterior for binary GPC (src/Fit.cpp:565-592)."""
    idx0 = jnp.arange(m)
    idx1 = jnp.arange(m, n)
    Cvv = heat_kernel(eigenpair, t, K, idx0, idx0)
    Cvv = linalg.add_diag(Cvv, jnp.full((m,), cfg.sigma, Cvv.dtype))
    Cnv = heat_kernel(eigenpair, t, K, idx1, idx0)
    C = jnp.concatenate([Cvv, Cnv], axis=0)

    Cnn = heat_kernel_diag(eigenpair, t, K, idx1) + cfg.sigma
    post_mean, post_cov = gpc_mod.gpc_posterior_moments(Cvv, Cnv, Cnn, Y)

    label_pred, _ = test_pgbinary(
        key, Cvv, Y, C, cfg.n_gibbs, N, max_count, avg_sweeps=cfg.gibbs_avg_sweeps
    )
    out = dict(
        train=label_pred[:m], test=label_pred[m:], mean=post_mean, cov=post_cov
    )
    if cfg.output_cov:
        out["C"] = C
    return out


def _to_result(out, pars, obj, eigenpair=None) -> FitResult:
    return FitResult(
        y_train=np.asarray(out["train"]),
        y_test=np.asarray(out["test"]),
        posterior_mean=np.asarray(out.get("mean", out["test"])),
        posterior_cov=np.asarray(out["cov"]),
        pars={k: np.asarray(v) for k, v in pars.items()},
        obj=float(obj),
        C=np.asarray(out["C"]) if "C" in out else None,
        eigenpair=eigenpair,
    )


def _resolve(cfg: FitConfig, task: str) -> FitConfig:
    """Apply the task-specific default σ (1e-5 regression / 1e-3 logit,
    R/Fit.R:56, 528) when the caller left the generic default in place."""
    if task == "regression" and cfg.sigma == 1e-3:
        cfg = dataclasses.replace(cfg, sigma=1e-5)
    return cfg


def _a2_grid(cfg: FitConfig):
    if cfg.a2s is None:
        return default_a2s().astype(cfg.dtype)
    return jnp.asarray(cfg.a2s, cfg.dtype)


def _select(tree, i):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


# ---------------------------------------------------------------------------
# Instrumented staged execution (SURVEY §5 observability).  The default path
# fuses the whole fit into one XLA program; passing a MetricsReport switches
# the LAE drivers to separately-jitted stages so per-stage wall-clock and
# solver residuals land in FitResult.metrics.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("g",))
def _spectrum_stage(key, X_all, g):
    eig, _ = spectral.build_spectrum(key, X_all, g)
    # eigh/SVD quality: ||VᵀV/n − I||_F / K for the K kept columns (vectors
    # are √n-scaled left singular vectors, src/Spectrum.cpp:157-158)
    n = X_all.shape[0]
    Vt_V = jnp.matmul(eig.vectors.T, eig.vectors, precision=jax.lax.Precision.HIGHEST) / n
    resid = jnp.linalg.norm(Vt_V - jnp.eye(Vt_V.shape[0], dtype=Vt_V.dtype)) / Vt_V.shape[0]
    return eig, resid


def _instrumented_lae_fit(key, X_all, Y, N, cfg: FitConfig, m, n, max_count, task, report):
    g = dataclasses.replace(cfg.graph, kernel=KernelType.LAE)
    K = min(g.resolved_K(), g.s, n)
    metrics: Dict[str, float] = {}
    k_spec, k_pg = jax.random.split(key)
    with report.stage("spectrum") as slot:
        eig, resid = _spectrum_stage(k_spec, X_all, g)
        slot["_sync"] = eig.vectors
    metrics["spectrum_s"] = report.stages[-1].wall_s
    metrics["spectrum_orth_residual"] = float(resid)
    if N is None:
        N = jnp.ones((m,), cfg.dtype)
    scfg, seig, (Ys, Ns) = _solve_cast(cfg, eig, Y, N)

    if task == "regression":
        train = jax.jit(
            lambda e, y: _train_gpr(e, y, jnp.arange(m), K, scfg)
        )
        with report.stage("train") as slot:
            res = train(seig, Ys)
            slot["_sync"] = res.t
        metrics["train_s"] = report.stages[-1].wall_s
        # SURVEY §5 failure detection: gradient norm (log-coords) recomputed
        # at the RETURNED (t, noise) — even when the coarse-grid seed beats
        # the Adam iterate (optimize.minimize_t_noise) — plus best objective
        metrics["adam_grad_norm"] = float(res.grad_norm)
        metrics["train_obj"] = float(res.obj)
        tail = jax.jit(lambda e, y, t, nz: _gpr_tail(e, y, m, n, K, scfg, t, nz))
        with report.stage("predict") as slot:
            out = tail(seig, Ys, res.t, res.noise)
            slot["_sync"] = out["test"]
        metrics["predict_s"] = report.stages[-1].wall_s
        result = _to_result(out, dict(t=res.t, noise=res.noise), -res.obj, eig)
    else:
        train = jax.jit(lambda e, y, nv: _train_gpc(e, y, nv, jnp.arange(m), K, scfg))
        with report.stage("train") as slot:
            res = train(seig, Ys, Ns)
            slot["_sync"] = res.x
        metrics["train_s"] = report.stages[-1].wall_s
        # SURVEY §5 failure detection: 1-D refiner bracket + Newton status at
        # the selected t (iters == max_iter with delta >= tol ⇒ non-converged;
        # the reference's only signal is a printed "nlopt failed!",
        # src/train.cpp:63-65)
        metrics["opt_bracket_logwidth"] = float(res.bracket_logwidth)
        metrics["opt_window_expansions"] = float(res.n_expansions)
        _, n_it, n_delta = jax.jit(
            lambda e, y, nv, t: gpc_mod.gpc_nmll_objective_status(
                e, y, nv, jnp.arange(m), K, t, scfg.sigma,
                tol=scfg.train.newton_tol, max_iter=scfg.train.newton_max_iter,
            )
        )(seig, Ys, Ns, res.x)
        metrics["newton_iters"] = float(n_it)
        metrics["newton_final_delta"] = float(n_delta)
        tail = jax.jit(
            lambda k, e, y, nv, t: _gpc_tail(k, e, y, nv, m, n, K, scfg, t, max_count)
        )
        with report.stage("predict") as slot:
            out = tail(k_pg, seig, Ys, Ns, res.x)
            slot["_sync"] = out["test"]
        metrics["predict_s"] = report.stages[-1].wall_s
        result = _to_result(out, dict(t=res.x), -res.obj, eig)
    result.metrics = metrics
    return result


# ---------------------------------------------------------------------------
# LAE drivers (no bandwidth grid; src/Fit.cpp:20-99, 521-605, 609-662)
# ---------------------------------------------------------------------------


def _as_anchors(anchors, dtype):
    """Normalize a user-provided anchor override — a SubsampleResult or a
    (centers, sizes) pair (e.g. datasets.spiral_r_anchors) — to the
    SubsampleResult the spectral builders consume."""
    if anchors is None:
        return None
    from ..ops.kmeans import SubsampleResult

    centers, counts = anchors
    return SubsampleResult(jnp.asarray(centers, dtype), jnp.asarray(counts, dtype))


@functools.partial(jax.jit, static_argnames=("cfg", "m", "n"))
def _lae_regression_impl(key, X_all, Y, cfg: FitConfig, m: int, n: int, anchors=None):
    g = dataclasses.replace(cfg.graph, kernel=KernelType.LAE)
    K = min(g.resolved_K(), g.s, n)
    eig, _ = spectral.build_spectrum(key, X_all, g, anchors)
    scfg, seig, (Ys,) = _solve_cast(cfg, eig, Y)
    res = _train_gpr(seig, Ys, jnp.arange(m), K, scfg)
    out = _gpr_tail(seig, Ys, m, n, K, scfg, res.t, res.noise)
    return out, res, eig


def fit_lae_regression_gp(key, X, Y, X_new, cfg: FitConfig = FitConfig(sigma=1e-5),
                          report=None, anchors=None) -> FitResult:
    """GPR with the LAE kernel (src/Fit.cpp:20-99).

    Passing a ``utils.metrics.MetricsReport`` as ``report`` runs the pipeline
    as separately-jitted stages and returns per-stage wall-clock + solver
    residuals in ``FitResult.metrics`` (slightly slower than the fused
    default: three dispatches instead of one).  ``anchors``: optional
    (centers, sizes) override of the subsampler (exact-parity runs)."""
    cfg = _resolve(cfg, "regression")
    X_all, m, n = _concat_all(X, X_new, cfg.dtype)
    Y = jnp.asarray(Y, cfg.dtype)
    if report is not None:
        return _instrumented_lae_fit(
            key, X_all, Y, None, cfg, m, n, 1, "regression", report
        )
    out, res, eig = _lae_regression_impl(
        key, X_all, Y, cfg, m, n, _as_anchors(anchors, cfg.dtype)
    )
    return _to_result(out, dict(t=res.t, noise=res.noise), -res.obj, eig)


@functools.partial(jax.jit, static_argnames=("cfg", "m", "n", "max_count"))
def _lae_logit_impl(key, X_all, Y, N, cfg: FitConfig, m: int, n: int, max_count: int,
                    anchors=None):
    g = dataclasses.replace(cfg.graph, kernel=KernelType.LAE)
    K = min(g.resolved_K(), g.s, n)
    k_spec, k_pg = jax.random.split(key)
    eig, _ = spectral.build_spectrum(k_spec, X_all, g, anchors)
    scfg, seig, (Ys, Ns) = _solve_cast(cfg, eig, Y, N)
    res = _train_gpc(seig, Ys, Ns, jnp.arange(m), K, scfg)
    out = _gpc_tail(k_pg, seig, Ys, Ns, m, n, K, scfg, res.x, max_count)
    return out, res, eig


def fit_lae_logit_gp(key, X, Y, X_new, N=None, cfg: FitConfig = FitConfig(),
                     report=None, anchors=None) -> FitResult:
    """Binary GPC with the LAE kernel (src/Fit.cpp:521-605).

    ``report``: optional MetricsReport — see fit_lae_regression_gp.
    ``anchors``: optional (centers, sizes) subsampler override."""
    X_all, m, n = _concat_all(X, X_new, cfg.dtype)
    Y = jnp.asarray(Y, cfg.dtype)
    if N is None:
        N_arr = jnp.ones((m,), cfg.dtype)
        max_count = 1
    else:
        N_arr = jnp.asarray(N, cfg.dtype)
        max_count = int(np.max(np.asarray(N)))
    if report is not None:
        return _instrumented_lae_fit(
            key, X_all, Y, N_arr, cfg, m, n, max_count, "logit", report
        )
    out, res, eig = _lae_logit_impl(
        key, X_all, Y, N_arr, cfg, m, n, max_count, _as_anchors(anchors, cfg.dtype)
    )
    return _to_result(out, dict(t=res.x), -res.obj, eig)


# ---------------------------------------------------------------------------
# SE drivers with vmapped bandwidth grid (src/Fit.cpp:102-219, 669-793)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "m", "n"))
def _se_regression_impl(key, X_all, Y, a2s, cfg: FitConfig, m: int, n: int, anchors=None):
    g = cfg.graph
    K = min(g.resolved_K(), g.s, n)
    basis = spectral.se_grid_setup(key, X_all, g, anchors)
    idx = jnp.arange(m)

    def per_a2(a2):
        eig = spectral.se_spectrum_at(basis, a2, g)
        scfg, seig, (Ys,) = _solve_cast(cfg, eig, Y)
        res = _train_gpr(seig, Ys, idx, K, scfg)
        return eig, res

    eigs, results = jax.vmap(per_a2)(a2s)
    best = jnp.argmax(-results.obj)  # max marginal (min objective)
    eig = _select(eigs, best)
    res = _select(results, best)
    scfg, seig, (Ys,) = _solve_cast(cfg, eig, Y)
    out = _gpr_tail(seig, Ys, m, n, K, scfg, res.t, res.noise)
    return out, res, a2s[best], eig


def fit_se_regression_gp(key, X, Y, X_new, cfg: FitConfig = FitConfig(sigma=1e-5),
                         anchors=None) -> FitResult:
    """GPR with the SE kernel and bandwidth grid search (src/Fit.cpp:102-219)."""
    cfg = _resolve(cfg, "regression")
    X_all, m, n = _concat_all(X, X_new, cfg.dtype)
    Y = jnp.asarray(Y, cfg.dtype)
    out, res, best_a2, eig = _se_regression_impl(
        key, X_all, Y, _a2_grid(cfg), cfg, m, n, _as_anchors(anchors, cfg.dtype)
    )
    return _to_result(out, dict(t=res.t, noise=res.noise, a2=best_a2), -res.obj, eig)


@functools.partial(jax.jit, static_argnames=("cfg", "m", "n", "max_count"))
def _se_logit_impl(key, X_all, Y, N, a2s, cfg: FitConfig, m: int, n: int, max_count: int,
                   anchors=None):
    g = cfg.graph
    K = min(g.resolved_K(), g.s, n)
    k_spec, k_pg = jax.random.split(key)
    basis = spectral.se_grid_setup(k_spec, X_all, g, anchors)
    idx = jnp.arange(m)

    def per_a2(a2):
        eig = spectral.se_spectrum_at(basis, a2, g)
        scfg, seig, (Ys, Ns) = _solve_cast(cfg, eig, Y, N)
        res = _train_gpc(seig, Ys, Ns, idx, K, scfg)
        return eig, res

    eigs, results = jax.vmap(per_a2)(a2s)
    best = jnp.argmax(-results.obj)
    eig = _select(eigs, best)
    res = _select(results, best)
    scfg, seig, (Ys, Ns) = _solve_cast(cfg, eig, Y, N)
    out = _gpc_tail(k_pg, seig, Ys, Ns, m, n, K, scfg, res.x, max_count)
    return out, res, a2s[best], eig


def fit_se_logit_gp(key, X, Y, X_new, N=None, cfg: FitConfig = FitConfig(),
                    anchors=None) -> FitResult:
    """Binary GPC with the SE kernel and bandwidth grid (src/Fit.cpp:669-793)."""
    X_all, m, n = _concat_all(X, X_new, cfg.dtype)
    Y = jnp.asarray(Y, cfg.dtype)
    if N is None:
        N_arr = jnp.ones((m,), cfg.dtype)
        max_count = 1
    else:
        N_arr = jnp.asarray(N, cfg.dtype)
        max_count = int(np.max(np.asarray(N)))
    out, res, best_a2, eig = _se_logit_impl(
        key, X_all, Y, N_arr, _a2_grid(cfg), cfg, m, n, max_count,
        _as_anchors(anchors, cfg.dtype),
    )
    return _to_result(out, dict(t=res.x, a2=best_a2), -res.obj, eig)


# ---------------------------------------------------------------------------
# Nyström drivers (src/Fit.cpp:221-358, 897-1040)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "m", "n"))
def _nystrom_regression_impl(key, X_all, Y, a2s, cfg: FitConfig, m: int, n: int):
    g = cfg.graph
    K = min(g.resolved_K(), g.s)
    basis = spectral.nystrom_setup(key, X_all, g)
    idx = jnp.arange(m)

    def per_a2(a2):
        anchor, Z_UU = spectral.nystrom_anchor_eigs(basis, a2, K)
        eig_train = spectral.nystrom_extend(
            anchor, Z_UU, basis.dist_allU[:m], a2, basis.dist_mean, False,
            rcond=g.nystrom_rcond,
        )
        scfg, seig, (Ys,) = _solve_cast(cfg, eig_train, Y)
        res = _train_gpr(seig, Ys, idx, K, scfg)
        return anchor, Z_UU, res

    anchors, Z_UUs, results = jax.vmap(per_a2)(a2s)
    best = jnp.argmax(-results.obj)
    anchor = _select(anchors, best)
    Z_UU = _select(Z_UUs, best)
    res = _select(results, best)
    eig = spectral.nystrom_extend(
        anchor, Z_UU, basis.dist_allU, a2s[best], basis.dist_mean, True,
        rcond=g.nystrom_rcond,
    )
    scfg, seig, (Ys,) = _solve_cast(cfg, eig, Y)
    out = _gpr_tail(seig, Ys, m, n, K, scfg, res.t, res.noise)
    return out, res, a2s[best], eig


def fit_nystrom_regression_gp(key, X, Y, X_new, cfg: FitConfig = FitConfig(sigma=1e-5)) -> FitResult:
    """GPR via Nyström extension of the anchor diffusion operator
    (src/Fit.cpp:221-358)."""
    cfg = _resolve(cfg, "regression")
    X_all, m, n = _concat_all(X, X_new, cfg.dtype)
    Y = jnp.asarray(Y, cfg.dtype)
    out, res, best_a2, eig = _nystrom_regression_impl(key, X_all, Y, _a2_grid(cfg), cfg, m, n)
    return _to_result(out, dict(t=res.t, noise=res.noise, a2=best_a2), -res.obj, eig)


@functools.partial(jax.jit, static_argnames=("cfg", "m", "n", "max_count"))
def _nystrom_logit_impl(key, X_all, Y, N, a2s, cfg: FitConfig, m: int, n: int, max_count: int):
    g = cfg.graph
    K = min(g.resolved_K(), g.s)
    k_spec, k_pg = jax.random.split(key)
    basis = spectral.nystrom_setup(k_spec, X_all, g)
    idx = jnp.arange(m)

    def per_a2(a2):
        anchor, Z_UU = spectral.nystrom_anchor_eigs(basis, a2, K)
        eig_train = spectral.nystrom_extend(
            anchor, Z_UU, basis.dist_allU[:m], a2, basis.dist_mean, False,
            rcond=g.nystrom_rcond,
        )
        scfg, seig, (Ys, Ns) = _solve_cast(cfg, eig_train, Y, N)
        res = _train_gpc(seig, Ys, Ns, idx, K, scfg)
        return anchor, Z_UU, res

    anchors, Z_UUs, results = jax.vmap(per_a2)(a2s)
    best = jnp.argmax(-results.obj)
    anchor = _select(anchors, best)
    Z_UU = _select(Z_UUs, best)
    res = _select(results, best)
    eig = spectral.nystrom_extend(
        anchor, Z_UU, basis.dist_allU, a2s[best], basis.dist_mean, True,
        rcond=g.nystrom_rcond,
    )
    scfg, seig, (Ys, Ns) = _solve_cast(cfg, eig, Y, N)
    out = _gpc_tail(k_pg, seig, Ys, Ns, m, n, K, scfg, res.x, max_count)
    return out, res, a2s[best], eig


def fit_nystrom_logit_gp(key, X, Y, X_new, N=None, cfg: FitConfig = FitConfig()) -> FitResult:
    """Binary GPC via Nyström extension (src/Fit.cpp:897-1040)."""
    X_all, m, n = _concat_all(X, X_new, cfg.dtype)
    Y = jnp.asarray(Y, cfg.dtype)
    if N is None:
        N_arr = jnp.ones((m,), cfg.dtype)
        max_count = 1
    else:
        N_arr = jnp.asarray(N, cfg.dtype)
        max_count = int(np.max(np.asarray(N)))
    out, res, best_a2, eig = _nystrom_logit_impl(
        key, X_all, Y, N_arr, _a2_grid(cfg), cfg, m, n, max_count
    )
    return _to_result(out, dict(t=res.x, a2=best_a2), -res.obj, eig)


# ---------------------------------------------------------------------------
# GLGP drivers — the exact-graph O(n²)-O(n³) baseline (src/Fit.cpp:361-512,
# 1166-1328)
# ---------------------------------------------------------------------------


def _gl_spectrum(key, basis, a2, K: int, cfg: FitConfig):
    """Returns (eigenpair, max residual norm).  The eigh path is exact, so
    its residual reports as 0; the LOBPCG path surfaces its true final
    residual as the structured convergence status (SURVEY §5
    failure-detection row)."""
    if cfg.gl_solver == "lobpcg":
        eig, resid = spectral.gl_spectrum_lobpcg_status(
            key, basis, a2, K, cfg.gl_lobpcg_iters
        )
        return eig, jnp.max(resid)
    eig = spectral.gl_spectrum_at(basis, a2, K)
    return eig, jnp.zeros((), eig.values.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "m", "n"))
def _gl_regression_impl(key, X_all, Y, a2s, cfg: FitConfig, m: int, n: int):
    K = min(cfg.graph.K, n) if cfg.graph.K > 0 else min(cfg.graph.s, n)
    basis = spectral.gl_setup(X_all, cfg.gl_sparse, cfg.gl_threshold)
    idx = jnp.arange(m)

    def per_a2(a2):
        eig, resid = _gl_spectrum(key, basis, a2, K, cfg)
        scfg, seig, (Ys,) = _solve_cast(cfg, eig, Y)
        res = _train_gpr(seig, Ys, idx, K, scfg)
        return eig, resid, res

    # lax.map bounds memory: each grid point materializes an (n, n) graph
    eigs, resids, results = jax.lax.map(per_a2, a2s)
    best = jnp.argmax(-results.obj)
    eig = _select(eigs, best)
    res = _select(results, best)
    scfg, seig, (Ys,) = _solve_cast(cfg, eig, Y)
    out = _gpr_tail(seig, Ys, m, n, K, scfg, res.t, res.noise)
    return out, res, a2s[best], eig, resids[best]


def fit_gl_regression_gp(key, X, Y, X_new, cfg: FitConfig = FitConfig(sigma=1e-5)) -> FitResult:
    """GPR on the exact graph Laplacian over all n points (src/Fit.cpp:361-512).

    ``FitResult.metrics["gl_eigensolve_max_residual"]`` carries the winning
    grid point's eigensolver residual (0 for the exact eigh path)."""
    cfg = _resolve(cfg, "regression")
    X_all, m, n = _concat_all(X, X_new, cfg.dtype)
    Y = jnp.asarray(Y, cfg.dtype)
    out, res, best_a2, eig, resid = _gl_regression_impl(key, X_all, Y, _a2_grid(cfg), cfg, m, n)
    result = _to_result(out, dict(t=res.t, noise=res.noise, a2=best_a2), -res.obj, eig)
    result.metrics = {"gl_eigensolve_max_residual": float(resid)}
    return result


@functools.partial(jax.jit, static_argnames=("cfg", "m", "n", "max_count"))
def _gl_logit_impl(key, X_all, Y, N, a2s, cfg: FitConfig, m: int, n: int, max_count: int):
    K = min(cfg.graph.K, n) if cfg.graph.K > 0 else min(cfg.graph.s, n)
    basis = spectral.gl_setup(X_all, cfg.gl_sparse, cfg.gl_threshold)
    idx = jnp.arange(m)
    k_spec, k_pg = jax.random.split(key)

    def per_a2(a2):
        eig, resid = _gl_spectrum(k_spec, basis, a2, K, cfg)
        scfg, seig, (Ys, Ns) = _solve_cast(cfg, eig, Y, N)
        res = _train_gpc(seig, Ys, Ns, idx, K, scfg)
        return eig, resid, res

    eigs, resids, results = jax.lax.map(per_a2, a2s)
    best = jnp.argmax(-results.obj)
    eig = _select(eigs, best)
    res = _select(results, best)
    scfg, seig, (Ys, Ns) = _solve_cast(cfg, eig, Y, N)
    out = _gpc_tail(k_pg, seig, Ys, Ns, m, n, K, scfg, res.x, max_count)
    return out, res, a2s[best], eig, resids[best]


def fit_gl_logit_gp(key, X, Y, X_new, N=None, cfg: FitConfig = FitConfig()) -> FitResult:
    """Binary GPC on the exact graph Laplacian (src/Fit.cpp:1166-1328).

    ``FitResult.metrics["gl_eigensolve_max_residual"]`` as in
    fit_gl_regression_gp."""
    X_all, m, n = _concat_all(X, X_new, cfg.dtype)
    Y = jnp.asarray(Y, cfg.dtype)
    if N is None:
        N_arr = jnp.ones((m,), cfg.dtype)
        max_count = 1
    else:
        N_arr = jnp.asarray(N, cfg.dtype)
        max_count = int(np.max(np.asarray(N)))
    out, res, best_a2, eig, resid = _gl_logit_impl(key, X_all, Y, N_arr, _a2_grid(cfg), cfg, m, n, max_count)
    result = _to_result(out, dict(t=res.x, a2=best_a2), -res.obj, eig)
    result.metrics = {"gl_eigensolve_max_residual": float(resid)}
    return result
