"""Fully-fused FFN block: forward exactness, LUT gradient semantics,
Pallas(interpret)-vs-jnp parity including the in-kernel countsketches,
Monte-Carlo unbiasedness of both weight-gradient estimators, residual
accounting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import fewbit_tpu.functional as F
from fewbit_tpu.lut import store

RNG = np.random.RandomState(7)
N, K, M, H = 64, 128, 256, 128
X = jnp.asarray(RNG.randn(N, K), jnp.float32)
WU = jnp.asarray(RNG.randn(K, M) * 0.05, jnp.float32)
BU = jnp.asarray(RNG.randn(M) * 0.05, jnp.float32)
WD = jnp.asarray(RNG.randn(M, H) * 0.05, jnp.float32)
BD = jnp.asarray(RNG.randn(H) * 0.05, jnp.float32)
KEY = jax.random.key(11)


def ffn(x, wu, bu, wd, bd, key=KEY, **kw):
    kw.setdefault("bits", 3)
    kw.setdefault("proj_dim_ratio", 0.25)
    return F.fewbit_ffn(x, wu, bu, wd, bd, key, **kw)


def exact(x, wu, bu, wd, bd):
    return jax.nn.gelu(x @ wu + bu, approximate=False) @ wd + bd


class TestForward:

    def test_forward_exact(self):
        y = ffn(X, WU, BU, WD, BD)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(exact(X, WU, BU, WD, BD)),
                                   atol=1e-4, rtol=1e-5)

    def test_forward_leading_dims(self):
        x3 = X.reshape(4, 16, K)
        y = ffn(x3, WU, BU, WD, BD)
        assert y.shape == (4, 16, H)
        np.testing.assert_allclose(np.asarray(y.reshape(N, H)),
                                   np.asarray(ffn(X, WU, BU, WD, BD)),
                                   atol=1e-5)


class TestGradients:

    def test_lut_gradient_semantics(self):
        """dx must flow through levels[codes] * (g @ wd^T), exactly."""
        borders, levels = store.get_interior("gelu", 3)
        y, vjp = jax.vjp(lambda x: ffn(x, WU, BU, WD, BD), X)
        (dx,) = vjp(jnp.ones_like(y))

        z = np.asarray(X @ WU + BU)
        mult = levels[np.sum(z[..., None] > borders, axis=-1)]
        dz = mult * (np.ones((N, H)) @ np.asarray(WD).T)
        np.testing.assert_allclose(np.asarray(dx), dz @ np.asarray(WU).T,
                                   rtol=1e-4, atol=1e-4)

    def test_bias_grads_exact(self):
        borders, levels = store.get_interior("gelu", 3)
        grads = jax.grad(lambda bu, bd: ffn(X, WU, bu, WD, bd).sum(),
                         argnums=(0, 1))(BU, BD)
        z = np.asarray(X @ WU + BU)
        mult = levels[np.sum(z[..., None] > borders, axis=-1)]
        dz = mult * (np.ones((N, H)) @ np.asarray(WD).T)
        np.testing.assert_allclose(np.asarray(grads[0]), dz.sum(0),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(grads[1]),
                                   np.full((H,), float(N)), rtol=1e-5)

    @pytest.mark.parametrize("which", ["up", "down"])
    def test_sketched_weight_grads_unbiased(self, which):
        def grad_w(key):
            if which == "up":
                f = lambda w, k: ffn(X, w, BU, WD, BD, key=k).sum()  # noqa
                wa = WU
            else:
                f = lambda w, k: ffn(X, WU, BU, w, BD, key=k).sum()  # noqa
                wa = WD
            return jax.grad(f)(wa, key)

        keys = jax.random.split(jax.random.key(5), 4096)
        acc, _ = jax.lax.scan(lambda a, k: (a + grad_w(k), None),
                              jnp.zeros(WU.shape if which == "up"
                                        else WD.shape), keys)
        gw_mc = np.asarray(acc / 4096)

        # Exact counterpart with the same LUT backward (dz via codes).
        borders, levels = store.get_interior("gelu", 3)
        z = np.asarray(X @ WU + BU)
        y = np.asarray(jax.nn.gelu(jnp.asarray(z), approximate=False))
        mult = levels[np.sum(z[..., None] > borders, axis=-1)]
        dz = mult * (np.ones((N, H)) @ np.asarray(WD).T)
        gw_exact = (np.asarray(X).T @ dz if which == "up"
                    else y.T @ np.ones((N, H)))
        rel = (np.linalg.norm(gw_mc - gw_exact)
               / np.linalg.norm(gw_exact))
        assert rel < 0.15, rel


class TestResiduals:

    def test_no_full_tensor_saved(self):
        n = 4096
        x = jnp.zeros((n, K), jnp.float32)
        _, vjp = jax.vjp(
            lambda x, wu, wd: F.fewbit_ffn(x, wu, None, wd, None, KEY,
                                           bits=3, proj_dim_ratio=0.1),
            x, WU, WD)
        leaves = jax.tree_util.tree_leaves(vjp)
        biggest = max(l.size * l.dtype.itemsize for l in leaves)
        # Largest residual: the packed codes (3/8 B per pre-activation
        # element) or a (k, M) sketch — never an (n, M) or (n, K) tensor.
        k = max(410, 512)  # kernel path may round buckets up to 512
        cap = max(3 * n * M // 8, k * M * 4) + 4096
        assert biggest <= cap, biggest


class TestPallasParity:

    def test_interpret_matches_jnp(self, monkeypatch):
        # Shapes inside the kernel envelope: n % 512 == 0, dims % 128 == 0.
        n = 1024
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(n, 256), jnp.float32)
        wu = jnp.asarray(rng.randn(256, 512) * 0.05, jnp.float32)
        bu = jnp.asarray(rng.randn(512) * 0.05, jnp.float32)
        wd = jnp.asarray(rng.randn(512, 256) * 0.05, jnp.float32)
        bd = jnp.asarray(rng.randn(256) * 0.05, jnp.float32)
        g = jnp.asarray(rng.randn(n, 256), jnp.float32)

        def run():
            y, vjp = jax.vjp(
                lambda *a: F.fewbit_ffn(*a, KEY, bits=3,
                                        proj_dim_ratio=0.25),
                x, wu, bu, wd, bd)
            return (y, *vjp(g))

        monkeypatch.setenv("FEWBIT_TPU_NATIVE", "interpret")
        pallas = run()
        monkeypatch.setenv("FEWBIT_TPU_NATIVE", "0")
        ref = run()
        names = ["y", "dx", "dwu", "dbu", "dwd", "dbd"]
        for name, a, b in zip(names, pallas, ref):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=5e-2, rtol=2e-2, err_msg=name)

    def test_interpret_sketches_match_jnp_exactly(self, monkeypatch):
        """The in-kernel countsketch must equal the jnp signed bucket sum
        bit-for-... well, to f32 accumulation order."""
        from fewbit_tpu.functional.ffn import (_countsketch_signed, _signs)
        from fewbit_tpu.ops import pallas_kernels as pk
        from fewbit_tpu.functional.activations import resolve_activation

        monkeypatch.setenv("FEWBIT_TPU_NATIVE", "interpret")
        n, kdim, m = 1024, 256, 512
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(n, kdim), jnp.float32)
        wu = jnp.asarray(rng.randn(kdim, m) * 0.05, jnp.float32)
        spec, b_arr, v_arr = resolve_activation("gelu", bits=3)
        sigma = _signs(jax.random.key(3), n)
        k_eff = pk.countsketch_aligned_keff(n, 256)
        assert k_eff == 512
        out = pk.fused_dense_act_sketch(spec, x, wu, None, b_arr, sigma,
                                        k_eff, y_dtype=jnp.float32)
        assert out is not None
        y, packed, sk = out
        ref = _countsketch_signed(y, sigma, k_eff)
        np.testing.assert_allclose(np.asarray(sk), np.asarray(ref),
                                   atol=1e-3, rtol=1e-4)

        # With sigma_x, the kernel also emits the input countsketch (riding
        # its own read of x) — must equal the jnp bucket sum of x.
        sigma_x = _signs(jax.random.key(5), n)
        out2 = pk.fused_dense_act_sketch(spec, x, wu, None, b_arr, sigma,
                                         k_eff, y_dtype=jnp.float32,
                                         sigma_x=sigma_x)
        assert out2 is not None and len(out2) == 4
        y2, packed2, sk2, skx = out2
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y))
        np.testing.assert_allclose(np.asarray(sk2), np.asarray(sk))
        ref_x = _countsketch_signed(x, sigma_x, k_eff)
        np.testing.assert_allclose(np.asarray(skx), np.asarray(ref_x),
                                   atol=1e-3, rtol=1e-4)


    def test_bf16_model_stores_bf16_sketches(self, monkeypatch):
        """Round-5 sketch-dtype policy through the kernels (interpret mode):
        bf16 inputs -> bf16 sketch outputs from fused_dense_act_sketch,
        fused_matmul_lut_backward, and fused_matmul_input_sketch; f32
        inputs keep f32 sketches."""
        from fewbit_tpu.functional.ffn import _signs
        from fewbit_tpu.functional.activations import resolve_activation
        from fewbit_tpu.ops import pallas_kernels as pk

        monkeypatch.setenv("FEWBIT_TPU_NATIVE", "interpret")
        n, kdim, m = 1024, 256, 512
        rng = np.random.RandomState(7)
        spec, b_arr, v_arr = resolve_activation("gelu", bits=3)
        sigma = _signs(jax.random.key(1), n)
        k_eff = pk.countsketch_aligned_keff(n, 256)
        for dt in (jnp.float32, jnp.bfloat16):
            want = pk.sketch_dtype(dt)
            x = jnp.asarray(rng.randn(n, kdim), dt)
            wu = jnp.asarray(rng.randn(kdim, m) * 0.05, dt)
            y, packed, sk = pk.fused_dense_act_sketch(
                spec, x, wu, None, b_arr, sigma, k_eff)
            assert sk.dtype == want, dt
            g = jnp.asarray(rng.randn(n, kdim), dt)
            wt = jnp.asarray(rng.randn(kdim, m) * 0.05, dt)
            dz, sk2, db = pk.fused_matmul_lut_backward(
                spec, packed, v_arr, g, wt, sigma, k_eff,
                sk_dtype=pk.sketch_dtype(dt))
            assert sk2.dtype == want and db.dtype == jnp.float32
            out = pk.fused_matmul_input_sketch(
                x, jnp.asarray(rng.randn(kdim, 512) * 0.05, dt), None,
                sigma, 512)
            assert out is not None and out[1].dtype == want


class TestModule:

    def test_module(self):
        from fewbit_tpu.modules import FewBitFFN

        mod = FewBitFFN(inner_features=M, out_features=H, bits=3,
                        proj_dim_ratio=0.2)
        params = mod.init({"params": jax.random.key(0),
                           "sketch": jax.random.key(1)}, X)
        y = mod.apply(params, X, rngs={"sketch": jax.random.key(2)})
        assert y.shape == (N, H)
        g = jax.grad(lambda p: mod.apply(
            p, X, rngs={"sketch": jax.random.key(2)}).sum())(params)
        for leaf in jax.tree_util.tree_leaves(g):
            assert bool(jnp.all(jnp.isfinite(leaf)))
