"""Class-level patching of third-party flax models."""

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from fewbit_tpu.patch import use_fewbit_activation, use_fewbit_dense


class ThirdPartyModel(nn.Module):
    """Compact-style model we cannot rewrite with map_module."""

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(64)(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(4)(x)


X = jnp.asarray(np.random.RandomState(0).randn(512, 32), jnp.float32)


def test_dense_patch_preserves_forward_and_params():
    model = ThirdPartyModel()
    params = model.init(jax.random.key(0), X)
    y_ref = model.apply(params, X)

    def residual_bytes(apply):
        _, vjp = jax.vjp(apply, params)
        return sum(l.size * l.dtype.itemsize
                   for l in jax.tree_util.tree_leaves(vjp))

    base_bytes = residual_bytes(lambda p: model.apply(p, X).sum())
    with use_fewbit_dense(proj_dim_ratio=0.1):
        y_patch = model.apply(params, X,
                              rngs={"sketch": jax.random.key(1)})
        patched_bytes = residual_bytes(
            lambda p: model.apply(p, X,
                                  rngs={"sketch": jax.random.key(1)}).sum())

    np.testing.assert_allclose(np.asarray(y_patch), np.asarray(y_ref),
                               atol=1e-5)
    # Dense inputs are sketched at 10%; the remaining gelu residual stays.
    assert patched_bytes < base_bytes * 0.8, (patched_bytes, base_bytes)
    # Patch is reverted outside the scope.
    y_after = model.apply(params, X)
    np.testing.assert_allclose(np.asarray(y_after), np.asarray(y_ref),
                               atol=1e-7)


def test_activation_patch():
    model = ThirdPartyModel()
    params = model.init(jax.random.key(0), X)
    y_ref = model.apply(params, X)

    with use_fewbit_activation("gelu", bits=3):
        y_patch = model.apply(params, X)
        g = jax.grad(lambda p: model.apply(p, X).sum())(params)

    np.testing.assert_allclose(np.asarray(y_patch), np.asarray(y_ref),
                               atol=1e-5)
    norm = sum(float(jnp.sum(v * v))
               for v in jax.tree_util.tree_leaves(g))
    assert np.isfinite(norm) and norm > 0
    assert jax.nn.gelu.__module__.startswith("jax")  # restored


def test_patches_compose():
    model = ThirdPartyModel()
    params = model.init(jax.random.key(0), X)
    y_ref = model.apply(params, X)
    with use_fewbit_dense(proj_dim_ratio=0.2), \
            use_fewbit_activation("gelu", bits=2):
        y = model.apply(params, X, rngs={"sketch": jax.random.key(5)})
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
