"""Fused Pallas kernel semantics, validated in interpreter mode on CPU.

The real-hardware path is exercised by bench.py and the verify flow; these
tests pin the kernel's *semantics* against the pure-jnp engine: identical
forward values and identical gradients (codes are equal element-wise even
though the two paths use different packed layouts).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import fewbit_tpu.functional as F
from fewbit_tpu.ops import pallas_kernels
from fewbit_tpu.ops.activations import ActivationSpec, compare_codes


@pytest.fixture
def interpret_mode(monkeypatch):
    monkeypatch.setenv("FEWBIT_TPU_NATIVE", "interpret")
    yield
    monkeypatch.delenv("FEWBIT_TPU_NATIVE", raising=False)


def run_fwd_bwd(fn, x, **kwargs):
    y, vjp = jax.vjp(lambda t: fn(t, **kwargs), x)
    (dx,) = vjp(jnp.ones_like(y))
    return np.asarray(y), np.asarray(dx)


SHAPES = [(64, 256), (32, 128), (8, 16, 128), (96, 384)]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("bits", [1, 3, 4])
def test_gelu_pallas_matches_jnp(interpret_mode, shape, bits, monkeypatch):
    x = jnp.asarray(
        np.random.RandomState(bits).randn(*shape), jnp.float32)
    y_pal, dx_pal = run_fwd_bwd(F.gelu, x, bits=bits)
    monkeypatch.setenv("FEWBIT_TPU_NATIVE", "0")
    y_jnp, dx_jnp = run_fwd_bwd(F.gelu, x, bits=bits)
    np.testing.assert_allclose(y_pal, y_jnp, atol=1e-6)
    np.testing.assert_array_equal(dx_pal, dx_jnp)


@pytest.mark.parametrize("name,kwargs", [
    ("relu", {}),
    ("hardtanh", {}),
    ("leaky_relu", {"negative_slope": 0.2}),
    ("hardshrink", {}),
])
def test_binary_family_pallas(interpret_mode, name, kwargs, monkeypatch):
    fn = getattr(F, name)
    x = jnp.asarray(np.random.RandomState(0).randn(64, 128), jnp.float32)
    y_pal, dx_pal = run_fwd_bwd(fn, x, **kwargs)
    monkeypatch.setenv("FEWBIT_TPU_NATIVE", "0")
    y_jnp, dx_jnp = run_fwd_bwd(fn, x, **kwargs)
    np.testing.assert_allclose(y_pal, y_jnp, atol=1e-6)
    np.testing.assert_array_equal(dx_pal, dx_jnp)


def test_bf16(interpret_mode, monkeypatch):
    x = jnp.asarray(np.random.RandomState(1).randn(64, 256), jnp.bfloat16)
    y_pal, dx_pal = run_fwd_bwd(F.silu, x, bits=2)
    monkeypatch.setenv("FEWBIT_TPU_NATIVE", "0")
    y_jnp, dx_jnp = run_fwd_bwd(F.silu, x, bits=2)
    np.testing.assert_array_equal(y_pal, y_jnp)
    np.testing.assert_array_equal(dx_pal, dx_jnp)


def test_ineligible_shapes_fall_back(interpret_mode):
    # C not a multiple of 128 -> silently uses the jnp path, still correct.
    x = jnp.asarray(np.random.RandomState(2).randn(64, 100), jnp.float32)
    y, dx = run_fwd_bwd(F.gelu, x, bits=3)
    g_true = np.asarray(
        jax.grad(lambda t: jax.nn.gelu(t, approximate=False).sum())(x))
    assert np.sqrt(np.mean((dx - g_true) ** 2)) < 0.1


def test_ragged_rows(interpret_mode, monkeypatch):
    # R = 72 is not a multiple of 32: edge-block masking must drop garbage.
    x = jnp.asarray(np.random.RandomState(3).randn(72, 128), jnp.float32)
    y_pal, dx_pal = run_fwd_bwd(F.tanh, x, bits=3)
    monkeypatch.setenv("FEWBIT_TPU_NATIVE", "0")
    y_jnp, dx_jnp = run_fwd_bwd(F.tanh, x, bits=3)
    np.testing.assert_allclose(y_pal, y_jnp, atol=1e-6)
    np.testing.assert_array_equal(dx_pal, dx_jnp)


def test_unpack_block_layout_mirror(interpret_mode):
    spec = ActivationSpec(name="gelu", bits=3,
                          fwd=lambda x, a: jax.nn.gelu(x, approximate=False),
                          codes=compare_codes, n_borders=7)
    from fewbit_tpu.lut import store

    borders, levels = store.get_interior("gelu", 3)
    x = jnp.asarray(np.random.RandomState(4).randn(64, 128), jnp.float32)
    out = pallas_kernels.fused_forward(spec, x, jnp.asarray(borders))
    assert out is not None
    _, packed = out
    codes = pallas_kernels.unpack_block_layout(packed, 3, x.shape)
    expected = np.sum(
        np.asarray(x)[..., None] > np.asarray(borders), axis=-1)
    np.testing.assert_array_equal(np.asarray(codes), expected)


@pytest.mark.parametrize("parity,shift", [
    (None, None),
    (None, (0.5, 0.1)),
    (False, None),
    (True, None),
    (True, (0.25, 0.0)),
], ids=["plain", "shifted", "even", "odd", "odd-shifted"])
def test_generic_stepwise_pallas(interpret_mode, parity, shift, monkeypatch):
    """The generic user-LUT stepwise op must lower to the fused kernels
    (shift/parity recovered from static spec args) with gradients identical
    to the jnp path."""
    borders = jnp.asarray([-0.5, 0.8] if parity is None else [0.4, 0.9])
    levels = jnp.asarray([0.1, 0.5, 0.9])  # non-power-of-two on purpose
    x = jnp.asarray(np.random.RandomState(7).randn(64, 256), jnp.float32)

    def fn(t):
        return F.stepwise(t, borders, levels, parity=parity, shift=shift)

    y_pal, dx_pal = run_fwd_bwd(fn, x)
    monkeypatch.setenv("FEWBIT_TPU_NATIVE", "0")
    y_jnp, dx_jnp = run_fwd_bwd(fn, x)
    np.testing.assert_array_equal(y_pal, y_jnp)
    np.testing.assert_array_equal(dx_pal, dx_jnp)
