"""fewbit-tpu: TPU-native few-bit backward-pass engine.

Memory-efficient training primitives for JAX on TPU, re-designed from scratch
with the capabilities of the reference CUDA/PyTorch library (skolai/fewbit):

* **Few-bit activations** — every activation function is a ``jax.custom_vjp``
  whose backward residual is a dense bitpacked code tensor (``bits`` bits per
  element instead of 32), with fused Pallas quantize+pack forward kernels and
  unpack+LUT-dequant backward kernels on TPU and a pure-``jnp`` reference path
  everywhere else.
* **Randomized linear layers** — ``x @ W^T + b`` whose VJP saves only a random
  sketch of the input (projection along the batch axis) plus the PRNG key
  needed to re-materialise the matching sketch of the output gradient.
* **Offline quantizer** — Lloyd-style and DP-exact solvers producing the
  stepwise derivative LUTs, with a CLI.
* **Model surgery, memory introspection, flax modules, data-parallel training
  over TPU meshes.**
"""

from fewbit_tpu import functional  # noqa: F401
from fewbit_tpu.approx import Stepwise, approximate, dp_quantize  # noqa: F401
from fewbit_tpu.lut import StepwiseStore, store  # noqa: F401
from fewbit_tpu.modules import *  # noqa: F401,F403
from fewbit_tpu.util import (  # noqa: F401
    convert_linear, estimate_memory_usage, map_module, memory_delta_bytes,
    peak_memory_bytes, residual_shapes)

__version__ = "0.1.0"
