"""Functional API: few-bit activations, sketched linear layers, gradient taps.

Mirrors the reference surface ``/root/reference/fewbit/functional/__init__.py``.
"""

# Piecewise (1-bit) activation functions.
from fewbit_tpu.functional.activations import (  # noqa: F401
    hardshrink, hardsigmoid, hardtanh, leaky_relu, relu, relu6, softshrink,
    stepwise, threshold)

# Continuous (multi-bit) activation functions.
from fewbit_tpu.functional.activations import (  # noqa: F401
    celu, elu, gelu, hardswish, logsigmoid, mish, selu, sigmoid, silu,
    softplus, softsign, tanh, tanhshrink)

from fewbit_tpu.functional.activations import store  # noqa: F401

# Linear layers with sketched weight gradients.
from fewbit_tpu.functional.linear import (  # noqa: F401
    calc_proj_dim, linear, linear_crs, linear_grp, linear_grp_native,
    linear_randomized)

# Gradient capture and variance estimation.
from fewbit_tpu.functional.variance import (  # noqa: F401
    GradientStorage, catch_gradients, estimate_correlation,
    estimate_variance_rmm, estimate_variance_sgd)

# Fused dense + activation block.
from fewbit_tpu.functional.fused import fewbit_dense_act  # noqa: F401
from fewbit_tpu.functional.ffn import fewbit_ffn  # noqa: F401
