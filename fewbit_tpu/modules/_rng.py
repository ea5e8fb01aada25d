"""Shared sketch-RNG plumbing for the sketched modules.

The sketched weight-gradient estimators are unbiased only over fresh random
signs; a constant key makes every training step reuse the SAME sketch, so
the gradient noise never averages out.  The reference hides the equivalent
hazard inside an optional ``generator`` argument
(``/root/reference/fewbit/modules/linear.py:58-76``); here the fallback is
kept (inference without RNGs must still work — the sketch only affects
gradients) but it warns loudly.
"""

from __future__ import annotations

import os
import warnings

import jax

__all__ = ("sketch_key",)

_WARNING = (
    "{cls}: no 'sketch' RNG collection was provided to .apply(); falling "
    "back to a constant key.  Every training step will reuse the SAME "
    "random sketch signs, so the weight-gradient noise is perfectly "
    "correlated across steps and will not average out.  Pass "
    "rngs={{'sketch': key}} (fresh per step) when training; this fallback "
    "is only safe for inference.  Set FEWBIT_TPU_STRICT_SKETCH=1 to make "
    "this an error.")


def sketch_key(module) -> jax.Array:
    """Resolve the sketch PRNG key for a linen module: the ``'sketch'``
    collection when provided, the ``'params'`` key under ``init`` (gradients
    are never taken during init), else a constant key with a warning — or,
    under ``FEWBIT_TPU_STRICT_SKETCH=1``, an error (training code should
    never rely on the constant-key fallback)."""
    if module.has_rng("sketch"):
        return module.make_rng("sketch")
    if module.has_rng("params"):
        return module.make_rng("params")
    msg = _WARNING.format(cls=type(module).__name__)
    if os.environ.get("FEWBIT_TPU_STRICT_SKETCH") == "1":
        raise RuntimeError(msg)
    warnings.warn(msg, stacklevel=3)
    return jax.random.key(0)
