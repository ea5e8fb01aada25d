"""Whole-model few-bit conversion for third-party flax models.

:func:`fewbit_tpu.util.map_module` rewrites field-declared module trees, but
third-party models (e.g. HF Flax transformers) build their submodules inside
``setup``/``@nn.compact`` bodies where no tree walk can reach them.  These
context managers patch at the *class* level instead — the same move the
reference benchmark makes when it monkey-patches
``transformers.activations.ACT2FN['gelu']``
(``benchmark/bench-roberta.py:126-147``) and rewrites Linears
(``bench-linear.py:136-144``) — except scoped and reversible.

Inside ``use_fewbit_dense``, every ``flax.linen.Dense.__call__`` computes
through :func:`fewbit_tpu.functional.linear_grp` (sketched weight gradient);
inside ``use_fewbit_activation``, ``jax.nn.gelu`` (and friends) route through
the few-bit engine.  Both patches must be active during *trace* time (init /
apply / jit-lowering), not execution time.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

import jax

__all__ = ("use_fewbit_dense", "use_fewbit_activation")


@contextmanager
def use_fewbit_dense(proj_dim_ratio: Optional[float] = None,
                     proj_dim: Optional[int] = None,
                     proj_dim_min: Optional[int] = None,
                     proj_dim_max: Optional[int] = None,
                     matmul: str = "gaussian"):
    """Scope in which every ``flax.linen.Dense`` uses a sketched backward.

    Parameter names and shapes are unchanged (``kernel``/``bias``), so
    existing checkpoints keep loading.  Layers pull sketch randomness from
    the ``'sketch'`` RNG collection when provided, else fall back to a fixed
    key (gradient randomness only — forward is exact either way).
    """
    import flax.linen as nn

    from fewbit_tpu.functional.linear import linear_grp_native

    original = nn.Dense.__call__

    def patched(self, inputs):
        kernel = self.param("kernel", self.kernel_init,
                            (inputs.shape[-1], self.features),
                            self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        dtype = self.dtype or inputs.dtype
        x = inputs.astype(dtype)
        kernel = kernel.astype(dtype)
        bias = bias.astype(dtype) if bias is not None else None
        if self.has_rng("sketch"):
            key = self.make_rng("sketch")
        else:
            key = jax.random.key(0)
        return linear_grp_native(x, kernel, bias, key,
                                 proj_dim_ratio=proj_dim_ratio,
                                 proj_dim=proj_dim,
                                 proj_dim_min=proj_dim_min,
                                 proj_dim_max=proj_dim_max, matmul=matmul)

    # Replicate what linen's metaclass does at class creation: mark the
    # method compact and wrap it for scope management.
    from flax.linen.module import wrap_method_once

    nn.Dense.__call__ = wrap_method_once(nn.compact(patched))
    try:
        yield
    finally:
        nn.Dense.__call__ = original


_ACT_TARGETS = ("gelu", "silu", "relu", "sigmoid", "tanh")


@contextmanager
def use_fewbit_activation(name: str = "gelu", bits: int = 3):
    """Scope in which ``jax.nn.<name>`` (and ``flax.linen.<name>``) runs
    through the few-bit backward engine at ``bits`` bits."""
    if name not in _ACT_TARGETS:
        raise ValueError(f"unsupported activation {name!r}; "
                         f"one of {_ACT_TARGETS}")
    import flax.linen as nn
    import jax.nn

    import fewbit_tpu.functional as F

    few = getattr(F, name)

    def patched(x, *args, **kwargs):
        # Swallow torch/jax-specific kwargs like approximate=.
        return few(x, bits=bits) if name != "relu" else few(x)

    saved_jax = getattr(jax.nn, name)
    setattr(jax.nn, name, patched)
    saved_nn = getattr(nn, name, None)
    if saved_nn is not None:
        setattr(nn, name, patched)
    try:
        yield
    finally:
        setattr(jax.nn, name, saved_jax)
        if saved_nn is not None:
            setattr(nn, name, saved_nn)
