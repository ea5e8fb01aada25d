"""The shared on-device timing protocol for every micro-benchmark.

One implementation serves ``tools/roofline.py``, ``tools/tune_flash.py``,
``tools/exp_megakernel.py`` and ``bench.py``'s clock-state probe, so a
protocol fix lands everywhere at once.  Two hazards of this environment
are worked around here (measured, docs/BENCHMARKS.md):

* the fori_loop trip count is passed as a TRACED scalar — with a static
  bound XLA unrolls the loop and fuses elementwise bodies across
  iterations (20 chained gelus collapse into one read-once kernel),
  faking a 20x bandwidth win;
* ``block_until_ready`` is a no-op on the axon relay (a 537 MB x
  200-iteration gelu loop "completes" in 0.06 ms) — only a literal data
  READBACK synchronises, so each round ends with a scalar fetch whose
  ~1-5 ms relay round-trip amortises over ``iters`` iterations.

Reference: none — the reference times ops with
``torch.utils.benchmark.Timer``
(``notebooks/few-bit-backward/benchmark-quantisation.py:59-71``); this is
the TPU-relay-safe equivalent.
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ("timed_loop", "touch")


def timed_loop(body, carry, iters=50, rounds=3):
    """Best per-iteration time of ``iters`` fori_loop steps of ``body``
    (a ``(i, carry) -> carry`` function), one dispatch per round."""

    @jax.jit
    def run(c, n):
        return lax.fori_loop(0, n, body, c)

    def sync(c):
        return float(jnp.asarray(c[(0,) * c.ndim]))

    n = jnp.int32(iters)
    out = run(carry, n)
    sync(out)  # compile + warm
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = run(out, n)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def touch(carry, val):
    """One-element update of the carry from ``val`` — a data dependence
    that defeats XLA's loop-invariant code motion at no measurable
    traffic."""
    patch = (val[:1, :1] * 1e-6).astype(carry.dtype)
    return lax.dynamic_update_slice(carry, patch, (0, 0))
