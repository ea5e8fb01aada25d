"""The fused Pallas kernels under shard_map — the flagship combination.

Every other multi-device test runs at kernel-ineligible tiny shapes, so the
product combination the headline sells (megakernel/FFN/input-sketch Pallas
paths + dp shard_map with per-shard folded sketch keys) needs its own
coverage: interpret-mode kernels at Pallas-eligible *per-shard* shapes
(rows % 512, cols % 128) over the 8-device CPU mesh, asserting

(a) the Pallas path actually engaged (call-counting monkeypatch probes —
    the envelope functions returning non-None);
(b) numeric parity of the dp step against a hand-computed mean of
    per-shard gradients using the same folded keys;
(c) shards draw DISTINCT sketches through the fused path (per-shard weight
    gradients differ before the pmean).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from fewbit_tpu.parallel import fold_shard_key, make_mesh

DP = 8
SHARD_ROWS = 1024       # per-shard flattened rows: % FFN_BN (512)
KDIM = 128              # hidden: % 128
INNER = 512             # FFN inner: % FFN_BM (512)
RATIO = 0.25            # k = 256 -> k_eff = 512 (aligned, within 2x budget)


def _mesh():
    mesh = make_mesh()
    if mesh.devices.size != DP:
        pytest.skip(f"needs {DP} devices")
    return mesh


@pytest.fixture
def interpret(monkeypatch):
    monkeypatch.setenv("FEWBIT_TPU_NATIVE", "interpret")


def _probe(monkeypatch, module, name):
    """Wrap ``module.name`` with a counter of non-None returns."""
    calls = {"engaged": 0}
    orig = getattr(module, name)

    def wrapper(*args, **kwargs):
        out = orig(*args, **kwargs)
        if out is not None:
            calls["engaged"] += 1
        return out

    monkeypatch.setattr(module, name, wrapper)
    return calls


class TestFFNUnderMesh:

    def _data(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(DP * SHARD_ROWS, KDIM) * 0.5, jnp.float32)
        w_up = jnp.asarray(rng.randn(KDIM, INNER) * 0.05, jnp.float32)
        b_up = jnp.asarray(rng.randn(INNER) * 0.01, jnp.float32)
        w_down = jnp.asarray(rng.randn(INNER, KDIM) * 0.05, jnp.float32)
        b_down = jnp.asarray(rng.randn(KDIM) * 0.01, jnp.float32)
        return x, w_up, b_up, w_down, b_down

    @staticmethod
    def _shard_loss(x, wu, bu, wd, bd, key):
        from fewbit_tpu.functional.ffn import fewbit_ffn

        out = fewbit_ffn(x, wu, bu, wd, bd, key, activation="gelu",
                         bits=3, proj_dim_ratio=RATIO)
        return (out.astype(jnp.float32) ** 2).mean()

    def _dp_value_and_grads(self, mesh, x, wu, bu, wd, bd, key):
        def fn(xs, wu, bu, wd, bd, key):
            k = fold_shard_key(key)
            loss, grads = jax.value_and_grad(
                lambda wu_, wd_: self._shard_loss(xs, wu_, bu, wd_, bd, k),
                argnums=(0, 1))(wu, wd)
            return lax.pmean((loss,) + grads, "dp")

        sharded = shard_map(
            fn, mesh=mesh,
            in_specs=(P("dp"), P(), P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False)
        return sharded(x, wu, bu, wd, bd, key)

    def test_pallas_engages_and_dp_parity(self, interpret, monkeypatch):
        """(a) + (b): the fused FFN kernels trace in under shard_map at
        eligible per-shard shapes, and the dp gradients equal the mean of
        hand-computed per-shard gradients with the same folded keys."""
        from fewbit_tpu.ops import pallas_kernels as pk

        mesh = _mesh()
        x, wu, bu, wd, bd = self._data()
        key = jax.random.key(7)

        fwd_probe = _probe(monkeypatch, pk, "fused_dense_act_sketch")
        bwd_probe = _probe(monkeypatch, pk, "fused_matmul_lut_backward")
        loss, gu, gd = self._dp_value_and_grads(mesh, x, wu, bu, wd, bd, key)
        assert fwd_probe["engaged"] >= 1, \
            "forward FFN megakernel did not engage under shard_map"
        assert bwd_probe["engaged"] >= 1, \
            "backward FFN kernel did not engage under shard_map"

        # Hand reference: same per-shard computation with fold_in(key, i).
        losses, gus, gds = [], [], []
        for i in range(DP):
            xs = x[i * SHARD_ROWS:(i + 1) * SHARD_ROWS]
            ki = jax.random.fold_in(key, i)
            li, (gui, gdi) = jax.value_and_grad(
                lambda wu_, wd_: self._shard_loss(xs, wu_, bu, wd_, bd, ki),
                argnums=(0, 1))(wu, wd)
            losses.append(li)
            gus.append(gui)
            gds.append(gdi)
        np.testing.assert_allclose(float(loss), float(np.mean(losses)),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gu),
                                   np.mean([np.asarray(g) for g in gus], 0),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gd),
                                   np.mean([np.asarray(g) for g in gds], 0),
                                   atol=2e-4, rtol=1e-3)

        # (c) distinct per-shard sketches: the sketched weight grads of two
        # shards fed IDENTICAL data must still differ (different folded key
        # -> different signs), while an identical key must reproduce.
        xs = x[:SHARD_ROWS]
        g0 = jax.grad(lambda wu_: self._shard_loss(
            xs, wu_, bu, wd, bd, jax.random.fold_in(key, 0)))(wu)
        g1 = jax.grad(lambda wu_: self._shard_loss(
            xs, wu_, bu, wd, bd, jax.random.fold_in(key, 1)))(wu)
        g0b = jax.grad(lambda wu_: self._shard_loss(
            xs, wu_, bu, wd, bd, jax.random.fold_in(key, 0)))(wu)
        assert float(jnp.abs(g0 - g1).max()) > 1e-6, \
            "shards drew identical sketches through the fused path"
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g0b),
                                   atol=1e-6)

    def test_interpret_matches_jnp_under_mesh(self, monkeypatch):
        """Same dp step, Pallas-interpret vs pure-jnp path: identical
        partition + signs, so gradients agree to f32 tolerance."""
        mesh = _mesh()
        x, wu, bu, wd, bd = self._data()
        key = jax.random.key(3)

        monkeypatch.setenv("FEWBIT_TPU_NATIVE", "interpret")
        l_p, gu_p, gd_p = self._dp_value_and_grads(mesh, x, wu, bu, wd, bd,
                                                   key)
        monkeypatch.setenv("FEWBIT_TPU_NATIVE", "0")
        l_j, gu_j, gd_j = self._dp_value_and_grads(mesh, x, wu, bu, wd, bd,
                                                   key)
        np.testing.assert_allclose(float(l_p), float(l_j), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gu_p), np.asarray(gu_j),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gd_p), np.asarray(gd_j),
                                   atol=2e-4, rtol=1e-3)


class TestInputSketchUnderMesh:

    def test_linear_grp_fused_engages_and_parity(self, interpret,
                                                 monkeypatch):
        """The attention-linear input-sketch kernel under shard_map: engaged
        per-shard, dp grads match the hand-computed per-shard mean, and the
        per-shard sketches are distinct."""
        from fewbit_tpu.functional.linear import linear_grp_native
        from fewbit_tpu.ops import pallas_kernels as pk

        mesh = _mesh()
        rng = np.random.RandomState(1)
        m = 128
        x = jnp.asarray(rng.randn(DP * SHARD_ROWS, KDIM) * 0.5, jnp.float32)
        kernel = jnp.asarray(rng.randn(KDIM, m) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.randn(m) * 0.01, jnp.float32)
        key = jax.random.key(11)

        def shard_loss(xs, kern, b, k):
            y = linear_grp_native(xs, kern, b, k, proj_dim_ratio=RATIO,
                                  matmul="countsketch")
            return (y.astype(jnp.float32) ** 2).mean()

        probe = _probe(monkeypatch, pk, "fused_matmul_input_sketch")

        def fn(xs, kern, b, key):
            k = fold_shard_key(key)
            loss, gk = jax.value_and_grad(
                lambda kern_: shard_loss(xs, kern_, b, k))(kern)
            return lax.pmean((loss, gk), "dp")

        sharded = shard_map(fn, mesh=mesh,
                            in_specs=(P("dp"), P(), P(), P()),
                            out_specs=P(), check_vma=False)
        loss, gk = sharded(x, kernel, bias, key)
        # Engages in BOTH directions (forward x-sketch, backward dy-sketch).
        assert probe["engaged"] >= 2, \
            "fused_matmul_input_sketch did not engage under shard_map"

        losses, gks = [], []
        for i in range(DP):
            xs = x[i * SHARD_ROWS:(i + 1) * SHARD_ROWS]
            ki = jax.random.fold_in(key, i)
            li, gki = jax.value_and_grad(
                lambda kern_: shard_loss(xs, kern_, bias, ki))(kernel)
            losses.append(li)
            gks.append(np.asarray(gki))
        np.testing.assert_allclose(float(loss), float(np.mean(losses)),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gk), np.mean(gks, 0),
                                   atol=2e-4, rtol=1e-3)
        # Distinct sketches across shards: same data, different folded keys.
        xs = x[:SHARD_ROWS]
        g0 = jax.grad(lambda kern_: shard_loss(
            xs, kern_, bias, jax.random.fold_in(key, 0)))(kernel)
        g1 = jax.grad(lambda kern_: shard_loss(
            xs, kern_, bias, jax.random.fold_in(key, 1)))(kernel)
        assert float(jnp.abs(g0 - g1).max()) > 1e-6
