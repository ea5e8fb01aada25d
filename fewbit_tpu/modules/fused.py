"""Flax module for the fused dense + few-bit activation block."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fewbit_tpu.functional.fused import fewbit_dense_act
from fewbit_tpu.modules._rng import sketch_key

__all__ = ("FusedDenseActivation",)


class FusedDenseActivation(nn.Module):
    """``act(x @ kernel + bias)`` with few-bit residuals in one fused op.

    Parameter names match ``nn.Dense`` (``kernel``/``bias``), so swapping a
    Dense+activation pair for this module keeps checkpoints loadable.
    """
    features: int
    activation: str = "gelu"
    bits: Optional[int] = None
    act_args: tuple = ()
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()
    # Weight-gradient sketch (None disables).
    proj_dim_ratio: Optional[float] = None
    proj_dim: Optional[int] = None
    proj_dim_min: Optional[int] = None
    proj_dim_max: Optional[int] = None
    matmul: str = "countsketch"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        bias = bias.astype(dtype) if bias is not None else None
        sketched = self.proj_dim_ratio is not None or self.proj_dim is not None
        key = sketch_key(self) if sketched else None
        return fewbit_dense_act(
            x, kernel, bias, key,
            activation=self.activation, bits=self.bits,
            act_args=self.act_args,
            proj_dim_ratio=self.proj_dim_ratio, proj_dim=self.proj_dim,
            proj_dim_min=self.proj_dim_min, proj_dim_max=self.proj_dim_max,
            matmul=self.matmul)
