"""Fused Pallas TPU kernels for the few-bit activation engine.

Forward: activation + border-compare quantise + bit-plane pack in one pass
over HBM (the reference pays an extra kernel and achieves only 2.18x vanilla
gelu forward time, ``memory-usage-operation-only.py:80-85`` — fusing the pack
into the activation is the point of this module).

Backward: bit-plane unpack + LUT select + cotangent multiply, one pass.

Both must produce buffers bit-identical to the ``jnp`` reference path in
:mod:`fewbit_tpu.ops.bitpack` so forward/backward can mix paths freely.

``fused_forward``/``fused_backward`` return ``None`` when the input shape
does not meet the kernel's alignment requirements; the caller then falls
back to the ``jnp`` path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

# Placeholder implementations — the jnp path handles everything until the
# fused kernels land.


def fused_forward(spec, x: jax.Array,
                  borders: jax.Array) -> Optional[Tuple[jax.Array, jax.Array]]:
    return None


def fused_backward(spec, packed: jax.Array, levels: jax.Array,
                   g: jax.Array) -> Optional[jax.Array]:
    return None
