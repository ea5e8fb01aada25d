"""Gradient-variance estimation for choosing sketch compression ratios.

Functional equivalents of the reference's variance toolkit
(``/root/reference/fewbit/functional/variance.py``,
``modules/variance.py:16-44``): given a layer input ``x`` (flattened to
``(N, d_in)``) and its output gradient ``g`` (``(N, d_out)``), estimate

* the input/gradient correlation,
* the SGD (mini-batch sampling) variance of the weight gradient,
* the RMM (randomized matmul / sketching) variance,

so users can pick ``proj_dim_ratio`` where sketch noise stays below the
inherent SGD noise (the criterion from arXiv 2201.13195).

Gradient capture: JAX has no autograd hooks, so :func:`catch_gradients` is a
``custom_vjp`` identity whose backward ships the cotangent to the host via
``jax.debug.callback`` into a :class:`GradientStorage` — the functional
replacement for the reference's stateful ``GradientCatcher``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ("GradientStorage", "catch_gradients", "estimate_correlation",
           "estimate_variance_sgd", "estimate_variance_rmm")


def estimate_correlation(x: jax.Array, g: jax.Array) -> jax.Array:
    """Squared normalised correlation ``(|x^T g| / (|x| |g|))^2``."""
    xn = jnp.linalg.norm(x)
    gn = jnp.linalg.norm(g)
    xg = jnp.linalg.norm(x.T @ g)
    return (xg / (xn * gn)) ** 2


def estimate_variance_sgd(x: jax.Array, g: jax.Array,
                          batch_size: Optional[int] = None) -> jax.Array:
    """Variance of the SGD weight-gradient estimator over row subsampling."""
    bs = batch_size if batch_size else x.shape[0]
    if bs < 2:
        raise ValueError(
            f"estimate_variance_sgd needs a batch of at least 2 rows "
            f"(got {bs}); the unbiased variance divides by batch_size - 1")
    fst = bs / (bs - 1)
    snd = 1.0 / (bs - 1)
    xs = jnp.sum(x * x, axis=1)
    gs = jnp.sum(g * g, axis=1)
    xg = jnp.linalg.norm(x.T @ g) ** 2
    return fst * (xs @ gs) - snd * xg


def estimate_variance_rmm(x: jax.Array, g: jax.Array,
                          proj_dim: Optional[int] = None) -> jax.Array:
    """Variance of the randomized-matmul (sketched) gradient estimator."""
    k = proj_dim if proj_dim else x.shape[0]
    xs = jnp.linalg.norm(x) ** 2
    gs = jnp.linalg.norm(g) ** 2
    xg = jnp.linalg.norm(x.T @ g) ** 2
    return (xs * gs - xg) / k


class GradientStorage:
    """Host-side accumulator for layer inputs and output gradients."""

    def __init__(self) -> None:
        self.input = None
        self.grad_output = None

    def record_input(self, value) -> None:
        self.input = value

    def record_grad(self, value) -> None:
        self.grad_output = value
        self.postprocess()

    def postprocess(self) -> None:
        """Overridden by subclasses to react once both sides are present."""


def _make_catcher(storage: GradientStorage):

    @jax.custom_vjp
    def catcher(x):
        return x

    def fwd(x):
        return x, None

    def bwd(_, g):
        jax.debug.callback(lambda v: storage.record_grad(v), g)
        return (g,)

    catcher.defvjp(fwd, bwd)
    return catcher


def catch_gradients(x: jax.Array, storage: GradientStorage) -> jax.Array:
    """Identity whose backward records the cotangent into ``storage``.

    Also records ``x`` itself on the forward pass.  Works under ``jit``
    (values arrive on the host via debug callback after the step executes).
    """
    jax.debug.callback(lambda v: storage.record_input(v), x)
    return _make_catcher(storage)(x)
