"""Eager config validation + string-coercion (SURVEY §5: the reference
dispatches on raw strings and aborts deep in C++ on typos, src/Utils.cpp:64)."""

import pytest

from flgp_tpu import (
    Approach,
    FitConfig,
    GraphConfig,
    KernelType,
    LaplacianType,
    Subsample,
    TrainConfig,
)


class TestGraphConfig:
    def test_string_coercion(self):
        g = GraphConfig(subsample="kmeans", kernel="se", gl="rw")
        assert g.subsample is Subsample.KMEANS
        assert g.kernel is KernelType.SE
        assert g.gl is LaplacianType.RW

    def test_bad_kernel_string(self):
        with pytest.raises(ValueError):
            GraphConfig(kernel="rbf")

    @pytest.mark.parametrize(
        "kw",
        [dict(s=0), dict(r=0), dict(s=4, r=5), dict(K=0),
         dict(nstart=0), dict(epsilon=0.0)],
    )
    def test_bad_scalars(self, kw):
        with pytest.raises(ValueError):
            GraphConfig(**kw)

    def test_resolved_K(self):
        assert GraphConfig(s=7).resolved_K() == 7
        assert GraphConfig(s=7, K=3).resolved_K() == 3

    def test_K_decoupled_from_s(self):
        # GL drivers take K independent of the anchor count s
        # (reference fit_gl_*_cpp); anchor-based builders clamp at call site.
        assert GraphConfig(s=10, K=800).K == 800


class TestTrainConfig:
    def test_string_coercion(self):
        tc = TrainConfig(approach="marginal", noise="different")
        assert tc.approach is Approach.MARGINAL
        from flgp_tpu import NoiseModel
        assert tc.noise is NoiseModel.DIFFERENT

    @pytest.mark.parametrize(
        "kw", [dict(t0=0.0), dict(noise_lb=0.0), dict(grid_size=1),
               dict(t_lb=10.0, t_ub=1.0)]
    )
    def test_bad_scalars(self, kw):
        with pytest.raises(ValueError):
            TrainConfig(**kw)


class TestFitConfig:
    @pytest.mark.parametrize(
        "kw",
        [dict(sigma=-1.0), dict(gl_solver="arpack"),
         dict(gl_solver="lobpcg", gl_sparse=False), dict(gl_threshold=0.0),
         dict(n_gibbs=0), dict(n_gibbs=10, gibbs_avg_sweeps=11)],
    )
    def test_bad_values(self, kw):
        with pytest.raises(ValueError):
            FitConfig(**kw)

    def test_defaults_construct(self):
        FitConfig()
