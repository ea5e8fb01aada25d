"""Configurable MLP — the minimal end-to-end model (north-star config 1:
3-bit GELU 2-layer MLP forward/backward parity)."""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from fewbit_tpu import functional as F
from fewbit_tpu.modules.linear import RandomizedDense

__all__ = ("MLP",)


class MLP(nn.Module):
    """``features[-1]``-way MLP with few-bit switches matching RobertaConfig.

    :param features: output width of each layer.
    :param gelu_bits: few-bit GELU backward (None = exact).
    :param proj_dim_ratio: RandomizedDense sketch ratio (None = exact Dense).
    """
    features: Sequence[int]
    gelu_bits: Optional[int] = None
    proj_dim_ratio: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, width in enumerate(self.features):
            if self.proj_dim_ratio:
                x = RandomizedDense(features=width, dtype=self.dtype,
                                    proj_dim_ratio=self.proj_dim_ratio,
                                    name=f"dense_{i}")(x)
            else:
                x = nn.Dense(features=width, dtype=self.dtype,
                             name=f"dense_{i}")(x)
            if i + 1 < len(self.features):
                if self.gelu_bits:
                    x = F.gelu(x, bits=self.gelu_bits)
                else:
                    x = jax.nn.gelu(x, approximate=False)
        return x
