"""Module layer tests: linen activations, sketched Dense layers, surgery,
introspection, variance estimator."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

import fewbit_tpu.functional as F
import fewbit_tpu.modules as M
from fewbit_tpu.util import (convert_linear, estimate_memory_usage,
                             map_module, memory_delta_bytes, residual_shapes)

KEY = jax.random.key(0)
X = jnp.asarray(np.random.RandomState(0).randn(16, 32), jnp.float32)


class TestActivationModules:

    @pytest.mark.parametrize("cls,fn", [
        (M.ReLU, jax.nn.relu),
        (M.GELU, lambda x: jax.nn.gelu(x, approximate=False)),
        (M.Tanh, jnp.tanh),
        (M.SiLU, jax.nn.silu),
    ])
    def test_forward(self, cls, fn):
        mod = cls()
        y = mod.apply({}, X)
        np.testing.assert_allclose(np.asarray(y), np.asarray(fn(X)),
                                   atol=1e-6)

    def test_bits_field(self):
        y2 = M.GELU(bits=2).apply({}, X)
        y4 = M.GELU(bits=4).apply({}, X)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y4), atol=1e-6)

    def test_stepwise_module(self):
        mod = M.Stepwise(borders=jnp.asarray([0.0]),
                         levels=jnp.asarray([0.0, 1.0]))
        g = jax.grad(lambda x: mod.apply({}, x).sum())(X)
        np.testing.assert_allclose(np.asarray(g),
                                   (np.asarray(X) > 0).astype(np.float32))

    def test_hyperparam_modules(self):
        y = M.LeakyReLU(negative_slope=0.3).apply({}, X)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(jax.nn.leaky_relu(X, 0.3)),
                                   atol=1e-6)


class TestRandomizedDense:

    def test_forward_matches_dense(self):
        mod = M.RandomizedDense(features=8, proj_dim_ratio=0.5)
        params = mod.init({"params": KEY, "sketch": KEY}, X)
        y = mod.apply(params, X, rngs={"sketch": jax.random.key(1)})
        dense = nn.Dense(features=8)
        y_ref = dense.apply(params, X)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-5)

    def test_apply_without_rng(self):
        mod = M.RandomizedDense(features=8, proj_dim=4)
        params = mod.init({"params": KEY}, X)
        # Inference without a sketch rng works — on the constant-key
        # fallback, which must warn (training this way would freeze the
        # sketch signs).
        with pytest.warns(UserWarning, match="constant key"):
            y = mod.apply(params, X)
        assert y.shape == (16, 8)

    def test_strict_sketch_rng_mode(self, monkeypatch):
        monkeypatch.setenv("FEWBIT_TPU_STRICT_SKETCH", "1")
        mod = M.RandomizedDense(features=8, proj_dim=4)
        params = mod.init({"params": KEY}, X)  # init: params rng suffices
        with pytest.raises(RuntimeError, match="sketch"):
            mod.apply(params, X)
        y = mod.apply(params, X, rngs={"sketch": jax.random.key(1)})
        assert y.shape == (16, 8)

    def test_grad_flows(self):
        mod = M.RandomizedDense(features=8, proj_dim_ratio=0.5)
        params = mod.init({"params": KEY, "sketch": KEY}, X)

        def loss(p):
            return mod.apply(p, X, rngs={"sketch": jax.random.key(7)}).sum()

        g = jax.grad(loss)(params)
        assert jnp.linalg.norm(
            g["params"]["kernel"]) > 0

    def test_crs_module(self):
        mod = M.DenseCRS(features=8, nopairs=4)
        params = mod.init({"params": KEY, "sketch": KEY}, X)
        y = mod.apply(params, X, rngs={"sketch": jax.random.key(2)})
        assert y.shape == (16, 8)


class Encoder(nn.Module):
    """Field-declared toy model for surgery tests (map_module operates on
    dataclass-field submodules; see util.map_module docstring)."""
    proj: nn.Module
    out: nn.Module
    activation: nn.Module

    def __call__(self, x):
        return self.out(self.activation(self.proj(x)))


def make_encoder():
    return Encoder(proj=nn.Dense(24, name="proj"),
                   out=nn.Dense(4, name="out"), activation=M.GELU())


class TestSurgery:

    def test_map_module_swaps_dense(self):
        model = make_encoder()
        swapped = map_module(
            model,
            lambda m, path: convert_linear(m, M.RandomizedDense,
                                           proj_dim_ratio=0.25))
        assert isinstance(swapped.proj, M.RandomizedDense)
        assert isinstance(swapped.out, M.RandomizedDense)
        assert isinstance(swapped.activation, M.GELU)
        params = model.init(KEY, X)
        y_before = model.apply(params, X)
        # Same parameter tree loads into the rewritten model.
        y_after = swapped.apply(params, X, rngs={"sketch": KEY})
        np.testing.assert_allclose(np.asarray(y_before), np.asarray(y_after),
                                   atol=1e-5)

    def test_map_module_path_filter(self):
        model = make_encoder()
        hits = []

        def spy(m, path):
            hits.append(path)
            return m

        map_module(model, spy, patt=r".*/proj$")
        assert hits == ["/proj"]

    def test_map_module_validates_return(self):
        with pytest.raises(ValueError):
            map_module(make_encoder(), lambda m, p: None)

    def test_convert_passthrough(self):
        mod = M.GELU()
        assert convert_linear(mod, M.RandomizedDense) is mod


class TestIntrospection:

    def test_residual_shapes_abstract(self):
        shapes = list(residual_shapes(
            lambda t: F.gelu(t, bits=3), jnp.zeros((1024,))))
        assert any(s.dtype == jnp.uint32 for s in shapes)

    def test_memory_delta(self):
        n = 1 << 15
        x = jnp.zeros((n,), jnp.float32)
        delta = memory_delta_bytes(
            lambda t: jax.nn.gelu(t, approximate=False),
            lambda t: F.gelu(t, bits=3), x)
        # Exact gelu saves the fp32 input (4 B/elem); fewbit saves 3 bits.
        assert delta > n * 3  # at least ~3.6 B/elem saved

    def test_estimate_memory_usage_exact_counts(self):
        n = 1 << 15
        x = jnp.zeros((n,), jnp.float32)
        saved = estimate_memory_usage(lambda t: F.gelu(t, bits=3), x)
        expected_packed = 3 * n // 8
        assert expected_packed <= saved <= expected_packed + 256


class TestVarianceEstimator:

    def test_reports_stats(self):
        state = M.VarianceEstimatorState()
        layer = M.RandomizedDense(features=8, proj_dim_ratio=0.25)
        wrapped = M.VarianceEstimator(layer=layer, state=state)
        params = wrapped.init({"params": KEY, "sketch": KEY}, X)

        def loss(p):
            return wrapped.apply(p, X, rngs={"sketch": KEY}).sum()

        jax.grad(loss)(params)
        jax.effects_barrier()
        assert state.variance is not None
        corr, var_sgd, var_rmm = state.variance
        assert 0 <= corr <= 1 + 1e-6
        assert var_sgd > 0 and var_rmm > 0


class TestSketchKeyPlumbing:
    """A missing 'sketch' RNG must warn loudly: a constant fallback key
    would freeze the sketch signs across steps (correlated gradient noise).
    """

    @pytest.mark.parametrize("make", [
        lambda: M.RandomizedDense(features=8, proj_dim_ratio=0.25),
        lambda: M.FusedDenseActivation(features=32, proj_dim_ratio=0.25),
        lambda: M.FewBitFFN(inner_features=32, out_features=32,
                            proj_dim_ratio=0.25),
    ])
    def test_warns_without_sketch_rng(self, make):
        mod = make()
        params = mod.init({"params": KEY, "sketch": KEY}, X)
        with pytest.warns(UserWarning, match="sketch"):
            mod.apply(params, X)

    def test_no_warning_with_sketch_rng(self, recwarn):
        mod = M.RandomizedDense(features=8, proj_dim_ratio=0.25)
        params = mod.init({"params": KEY, "sketch": KEY}, X)
        mod.apply(params, X, rngs={"sketch": KEY})
        assert not [w for w in recwarn.list
                    if "sketch" in str(w.message)]

    def test_init_does_not_warn(self, recwarn):
        mod = M.RandomizedDense(features=8, proj_dim_ratio=0.25)
        mod.init({"params": KEY}, X)
        assert not [w for w in recwarn.list
                    if "sketch" in str(w.message)]
