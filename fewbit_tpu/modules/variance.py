"""Variance-estimator wrapper module.

Wraps a sketched linear layer and reports, per training step, the
input/gradient correlation and the SGD-vs-RMM gradient variances so users
can pick a compression ratio where sketch noise is dominated by mini-batch
noise (reference: ``/root/reference/fewbit/modules/variance.py:90-115``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import numpy as np

from fewbit_tpu.functional.linear import calc_proj_dim
from fewbit_tpu.functional.variance import (GradientStorage, catch_gradients,
                                            estimate_correlation,
                                            estimate_variance_rmm,
                                            estimate_variance_sgd)

__all__ = ("VarianceEstimatorState", "VarianceEstimator")


class VarianceEstimatorState(GradientStorage):
    """Host-side state computing variance statistics once both the layer
    input and its output gradient have been captured."""

    def __init__(self, callback: Optional[Callable] = None):
        super().__init__()
        self.callback = callback
        self.step = 0
        self.variance = None
        self.batch_size = None
        self.proj_dim = None

    def set_batch_size(self, batch_size: int, proj_dim: int) -> None:
        self.batch_size = batch_size
        self.proj_dim = proj_dim

    def postprocess(self) -> None:
        if self.input is None or self.grad_output is None:
            return
        x = np.asarray(self.input).reshape(-1, self.input.shape[-1])
        g = np.asarray(self.grad_output).reshape(
            -1, self.grad_output.shape[-1])
        import jax.numpy as jnp

        corr = float(estimate_correlation(jnp.asarray(x), jnp.asarray(g)))
        var_sgd = float(estimate_variance_sgd(jnp.asarray(x), jnp.asarray(g),
                                              self.batch_size))
        var_rmm = float(estimate_variance_rmm(jnp.asarray(x), jnp.asarray(g),
                                              self.proj_dim))
        if callable(self.callback):
            self.callback(corr, var_sgd, var_rmm, self.step)
        self.step += 1
        self.variance = (corr, var_sgd, var_rmm)


class VarianceEstimator(nn.Module):
    """Wraps a sketched layer; captures its input and output gradient.

    The wrapped ``layer`` must expose the ``proj_dim*`` fields of
    :class:`fewbit_tpu.modules.RandomizedDense`.  Statistics arrive on the
    host asynchronously (after the step's backward executes); read them from
    ``state.variance`` or via the ``callback``.
    """
    layer: nn.Module
    state: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *args, **kwargs):
        state = self.state
        if state is not None:
            bs = int(np.prod(x.shape[:-1]))
            proj = calc_proj_dim(bs, self.layer.proj_dim_ratio,
                                 self.layer.proj_dim,
                                 self.layer.proj_dim_max,
                                 self.layer.proj_dim_min)
            state.set_batch_size(bs, proj)
            jax.debug.callback(lambda v: state.record_input(v), x)
        out = self.layer(x, *args, **kwargs)
        if state is not None:
            if isinstance(out, tuple):
                return (catch_gradients(out[0], state), *out[1:])
            return catch_gradients(out, state)
        return out
