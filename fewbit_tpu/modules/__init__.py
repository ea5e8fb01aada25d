"""Flax linen module API (reference surface: fewbit/modules/__init__.py)."""

# Piecewise activation modules.
from fewbit_tpu.modules.activations import (  # noqa: F401
    Hardshrink, Hardsigmoid, Hardtanh, LeakyReLU, ReLU, ReLU6, Softshrink,
    Stepwise, Threshold)

# Continuous activation modules.
from fewbit_tpu.modules.activations import (  # noqa: F401
    CELU, ELU, GELU, Hardswish, LogSigmoid, Mish, SELU, Sigmoid, SiLU,
    Softplus, Softsign, Tanh, Tanhshrink)

# Linear layers with sketched weight gradients.  (The reference forgets to
# re-export the RandomizedLinear alias, modules/__init__.py:15 — fixed.)
from fewbit_tpu.modules.linear import (  # noqa: F401
    DenseCRS, LinearCRS, LinearGRP, RandomizedDense, RandomizedLinear)

from fewbit_tpu.modules.fused import FusedDenseActivation  # noqa: F401

from fewbit_tpu.modules.ffn import FewBitFFN  # noqa: F401

from fewbit_tpu.modules.variance import (  # noqa: F401
    VarianceEstimator, VarianceEstimatorState)
