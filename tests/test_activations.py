"""Activation engine tests.

Strategy follows the reference suite (SURVEY.md §4,
/root/reference/fewbit/functional/activations_test.py):

* forward parity with the exact function to ~1e-6;
* 1-bit piecewise family: gradients are *exact* (the derivative really is
  two-valued), so compare against jax.grad of the exact function;
* continuous family: gradients are approximate by design — validate the
  stored LUT itself via its analytic L2 error, and the engine against a
  direct LUT evaluation;
* residual accounting: the VJP closure must hold ~bits/32 words per element,
  not the input.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import fewbit_tpu.functional as F
from fewbit_tpu.lut import store

XS = jnp.asarray(np.linspace(-5.0, 5.0, 1001, dtype=np.float32))

# (fewbit fn, exact jax fn, kwargs) — piecewise family, exact 1-bit grads.
STEPWISE_CASES = [
    (F.relu, jax.nn.relu, {}),
    (F.relu6, lambda x: jnp.clip(x, 0.0, 6.0), {}),
    (F.leaky_relu, lambda x: jax.nn.leaky_relu(x, 0.01), {}),
    (F.leaky_relu, lambda x: jax.nn.leaky_relu(x, 0.2),
     {"negative_slope": 0.2}),
    (F.hardtanh, lambda x: jnp.clip(x, -1.0, 1.0), {}),
    (F.hardtanh, lambda x: jnp.clip(x, -2.0, 3.0),
     {"min_val": -2.0, "max_val": 3.0}),
    (F.hardsigmoid, jax.nn.hard_sigmoid, {}),
    (F.hardshrink, lambda x: jnp.where(jnp.abs(x) > 0.5, x, 0.0), {}),
    (F.softshrink, lambda x: jnp.where(
        x > 0.5, x - 0.5, jnp.where(x < -0.5, x + 0.5, 0.0)), {}),
    (F.threshold, lambda x: jnp.where(x > 1.0, x, 7.0),
     {"threshold": 1.0, "value": 7.0}),
]

CONTINUOUS = {
    "celu": F.celu, "elu": F.elu, "gelu": F.gelu, "hardswish": F.hardswish,
    "logsigmoid": F.logsigmoid, "mish": F.mish, "selu": F.selu,
    "sigmoid": F.sigmoid, "silu": F.silu, "softplus": F.softplus,
    "softsign": F.softsign, "tanh": F.tanh, "tanhshrink": F.tanhshrink,
}


@pytest.mark.parametrize("fn,exact,kwargs", STEPWISE_CASES,
                         ids=lambda c: getattr(c, "__name__", None) or "case")
def test_stepwise_forward_and_exact_grad(fn, exact, kwargs):
    # Avoid sampling exactly on the kink points where grads are ambiguous.
    xs = XS + 1e-3
    y = fn(xs, **kwargs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(exact(xs)),
                               atol=1e-6)

    g_few = jax.grad(lambda x: fn(x, **kwargs).sum())(xs)
    g_ref = jax.grad(lambda x: exact(x).sum())(xs)
    np.testing.assert_allclose(np.asarray(g_few), np.asarray(g_ref),
                               atol=1e-6)


@pytest.mark.parametrize("name", sorted(CONTINUOUS))
@pytest.mark.parametrize("bits", [1, 3])
def test_continuous_forward_exact(name, bits):
    fn = CONTINUOUS[name]
    import fewbit_tpu.functional.activations as A
    exact = getattr(A, f"_{name}_fwd")
    args = {"celu": (1.0,), "elu": (1.0,), "softplus": (1.0, 20.0)}.get(
        name, ())
    y = fn(XS, bits=bits)
    np.testing.assert_allclose(np.asarray(y), np.asarray(exact(XS, args)),
                               atol=1e-6)


@pytest.mark.parametrize("name", sorted(CONTINUOUS))
def test_continuous_grad_matches_lut(name):
    """Gradient must equal the stepwise LUT evaluated at the input."""
    fn = CONTINUOUS[name]
    borders, levels = store.get_interior(name, 3)
    g = jax.grad(lambda x: fn(x, bits=3).sum())(XS)
    codes = np.sum(np.asarray(XS)[:, None] > borders[None, :], axis=1)
    expected = levels[codes]
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-5)


def test_continuous_grad_close_to_true_grad():
    """Statistical check: 3-bit gelu grads within LUT error of true grads."""
    g_few = jax.grad(lambda x: F.gelu(x, bits=3).sum())(XS)
    g_true = jax.grad(lambda x: jax.nn.gelu(x, approximate=False).sum())(XS)
    err = np.sqrt(np.mean((np.asarray(g_few) - np.asarray(g_true)) ** 2))
    assert err < 0.05


def test_custom_lut_kwargs():
    borders = np.array([-100.0, 0.0, 100.0], np.float32)
    values = np.array([0.25, 0.75], np.float32)
    g = jax.grad(lambda x: F.gelu(x, borders=borders, values=values).sum())(XS)
    expected = np.where(np.asarray(XS) > 0, 0.75, 0.25)
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-6)
    with pytest.raises(ValueError):
        F.gelu(XS, bits=3, borders=borders, values=values)


def test_generic_stepwise():
    borders = jnp.asarray([-1.0, 1.0])
    levels = jnp.asarray([0.1, 0.5, 0.9])
    y = F.stepwise(XS, borders, levels)
    np.testing.assert_allclose(np.asarray(y), np.asarray(XS))  # identity fwd
    g = jax.grad(lambda x: F.stepwise(x, borders, levels).sum())(XS)
    x = np.asarray(XS)
    expected = np.where(x > 1.0, 0.9, np.where(x > -1.0, 0.5, 0.1))
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-6)


def test_generic_stepwise_parity_odd_derivative():
    # Odd derivative (parity=True): right-half LUT, sign flips below origin.
    borders = jnp.asarray([1.0])
    levels = jnp.asarray([0.25, 1.0])
    g = jax.grad(
        lambda x: F.stepwise(x, borders, levels, parity=True).sum())(XS)
    x = np.asarray(XS)
    mag = np.where(np.abs(x) > 1.0, 1.0, 0.25)
    expected = np.where(x < 0, -mag, mag)
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-6)


def test_generic_stepwise_parity_even_derivative():
    # Even derivative (parity=False): |x| quantisation, no sign flip.
    borders = jnp.asarray([1.0])
    levels = jnp.asarray([0.25, 1.0])
    g = jax.grad(
        lambda x: F.stepwise(x, borders, levels, parity=False).sum())(XS)
    x = np.asarray(XS)
    expected = np.where(np.abs(x) > 1.0, 1.0, 0.25)
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-6)


def test_residual_is_bitpacked():
    """The VJP residual must hold packed codes, not the fp32 input."""
    x = jnp.zeros((1 << 16,), jnp.float32)
    _, vjp = jax.vjp(lambda t: F.gelu(t, bits=3), x)
    leaves = jax.tree_util.tree_leaves(vjp)
    total = sum(l.size * l.dtype.itemsize for l in leaves)
    packed_expected = 3 * (1 << 16) // 8  # 3 bits/elem
    assert total < packed_expected + 256  # + LUT tables
    assert any(l.dtype == jnp.uint32 for l in leaves)


def test_works_under_jit_and_bf16():
    @jax.jit
    def step(x):
        return jax.value_and_grad(lambda t: F.silu(t, bits=2).sum())(x)

    x = jnp.asarray(np.random.RandomState(0).randn(4096), jnp.bfloat16)
    y, g = step(x)
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(float(y))


def test_2layer_mlp_parity():
    """North-star config 1: 3-bit GELU 2-layer MLP fwd/bwd parity (CPU)."""
    rng = np.random.RandomState(7)
    w1 = jnp.asarray(rng.randn(64, 128) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.randn(128, 8) * 0.05, jnp.float32)
    x = jnp.asarray(rng.randn(32, 64), jnp.float32)

    def mlp(params, act):
        a, b = params
        return jnp.sum(act(x @ a) @ b)

    exact_val, exact_grads = jax.value_and_grad(mlp)(
        (w1, w2), lambda t: jax.nn.gelu(t, approximate=False))
    few_val, few_grads = jax.value_and_grad(mlp)(
        (w1, w2), lambda t: F.gelu(t, bits=3))

    # Forward identical.
    np.testing.assert_allclose(float(few_val), float(exact_val), rtol=1e-6)
    # Gradients close (3-bit derivative approximation).
    for ge, gf in zip(exact_grads, few_grads):
        cos = np.sum(np.asarray(ge) * np.asarray(gf)) / (
            np.linalg.norm(ge) * np.linalg.norm(gf))
        assert cos > 0.99


def test_generic_stepwise_parity_nonpow2_lut():
    """Odd-parity LUT with a non-power-of-two level count: the negative
    half-table offset must be the padded half size (1 << bits), not
    len(levels)."""
    borders = jnp.asarray([0.5, 1.5])
    levels = jnp.asarray([0.1, 0.5, 0.9])
    g = jax.grad(
        lambda x: F.stepwise(x, borders, levels, parity=True).sum())(XS)
    x = np.asarray(XS)
    mag = np.where(np.abs(x) > 1.5, 0.9, np.where(np.abs(x) > 0.5, 0.5, 0.1))
    expected = np.where(x < 0, -mag, mag)
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-6)
