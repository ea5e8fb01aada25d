"""Flax linen modules for every few-bit activation.

Drop-in layer equivalents of the functional API — 9 stepwise + 13 continuous
classes plus the user-LUT :class:`Stepwise` (reference surface:
``/root/reference/fewbit/modules/activations.py``).  Where the reference
clones and regex-edits torch docstrings at import time
(``modules/activations.py:40-94``), these are plain dataclass modules; the
continuous ones take the ``bits`` hyper-parameter (default 3) or explicit
``borders``/``values`` arrays.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax

from fewbit_tpu import functional as F

STEPWISE = ("Hardshrink", "Hardsigmoid", "Hardtanh", "LeakyReLU", "ReLU",
            "ReLU6", "Softshrink", "Stepwise", "Threshold")
CONTINUOUS = ("CELU", "ELU", "GELU", "Hardswish", "LogSigmoid", "Mish",
              "SELU", "Sigmoid", "SiLU", "Softplus", "Softsign", "Tanh",
              "Tanhshrink")

__all__ = STEPWISE + CONTINUOUS


class Hardshrink(nn.Module):
    lambd: float = 0.5

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.hardshrink(x, self.lambd)


class Hardsigmoid(nn.Module):

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.hardsigmoid(x)


class Hardtanh(nn.Module):
    min_val: float = -1.0
    max_val: float = 1.0

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.hardtanh(x, self.min_val, self.max_val)


class LeakyReLU(nn.Module):
    negative_slope: float = 0.01

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.leaky_relu(x, self.negative_slope)


class ReLU(nn.Module):

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.relu(x)


class ReLU6(nn.Module):

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.relu6(x)


class Softshrink(nn.Module):
    lambd: float = 0.5

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.softshrink(x, self.lambd)


class Threshold(nn.Module):
    threshold: float = 0.0
    value: float = 0.0

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.threshold(x, self.threshold, self.value)


class Stepwise(nn.Module):
    """User-defined stepwise derivative (identity forward).

    :param borders: interior interval borders (outer edges stripped if given).
    :param levels: constant derivative value per interval (at most 256).
    :param parity: ``None`` for a full-domain LUT; ``False``/``True`` for a
        half-domain LUT of an even/odd derivative.
    :param shift: optional ``(s, t)`` recentring of the derivative.
    """
    borders: Any = None
    levels: Any = None
    parity: Optional[bool] = None
    shift: Optional[Tuple[float, float]] = None

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.stepwise(x, self.borders, self.levels, self.parity,
                          self.shift)


class _ContinuousBase(nn.Module):
    """Shared fields of the continuous family."""
    bits: Optional[int] = None
    borders: Any = None
    values: Any = None

    def _lut_kwargs(self):
        return dict(bits=self.bits, borders=self.borders, values=self.values)


class CELU(_ContinuousBase):
    alpha: float = 1.0

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.celu(x, self.alpha, **self._lut_kwargs())


class ELU(_ContinuousBase):
    alpha: float = 1.0

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.elu(x, self.alpha, **self._lut_kwargs())


class GELU(_ContinuousBase):

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.gelu(x, **self._lut_kwargs())


class Hardswish(_ContinuousBase):

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.hardswish(x, **self._lut_kwargs())


class LogSigmoid(_ContinuousBase):

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.logsigmoid(x, **self._lut_kwargs())


class Mish(_ContinuousBase):

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.mish(x, **self._lut_kwargs())


class SELU(_ContinuousBase):

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.selu(x, **self._lut_kwargs())


class Sigmoid(_ContinuousBase):

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.sigmoid(x, **self._lut_kwargs())


class SiLU(_ContinuousBase):

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.silu(x, **self._lut_kwargs())


class Softplus(_ContinuousBase):
    beta: float = 1.0
    threshold: float = 20.0

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.softplus(x, self.beta, self.threshold, **self._lut_kwargs())


class Softsign(_ContinuousBase):

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.softsign(x, **self._lut_kwargs())


class Tanh(_ContinuousBase):

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.tanh(x, **self._lut_kwargs())


class Tanhshrink(_ContinuousBase):

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.tanhshrink(x, **self._lut_kwargs())
