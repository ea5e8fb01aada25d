"""Kernel micro-benchmarks on the attached TPU.

Times vanilla vs few-bit activations (forward, forward+backward) at the
reference op-benchmark size (128 * 1024^2 elements,
``/root/reference/notebooks/few-bit-backward/memory-usage-operation-only.py``).

Timing protocol: everything (including the reduction used to force
materialisation) is warmed up first; iterations are chained (y = f(y)) so a
lazy/async dispatch path cannot fake completion; reported number is the best
of 3 rounds.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

import fewbit_tpu.functional as F


def bench(f, x, iters=30, rounds=3):
    y = f(x)
    jax.block_until_ready(y)
    float(jnp.sum(y))  # warm the sum kernel too
    best = float("inf")
    for _ in range(rounds):
        y = x
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f(y)
        float(jnp.sum(y))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    print("backend:", jax.default_backend())
    R, C = 131072, 1024
    x = jax.random.normal(jax.random.key(0), (R, C), jnp.float32)
    nbytes = R * C * 4

    cases = {
        "vanilla gelu fwd": jax.jit(
            lambda t: jax.nn.gelu(t, approximate=False)),
        "fewbit3 gelu fwd": jax.jit(lambda t: F.gelu(t, bits=3)),
        "fewbit1 relu fwd": jax.jit(F.relu),
        "vanilla gelu f+b": jax.jit(
            jax.grad(lambda t: jax.nn.gelu(t, approximate=False).sum())),
        "fewbit3 gelu f+b": jax.jit(
            jax.grad(lambda t: F.gelu(t, bits=3).sum())),
        "fewbit1 relu f+b": jax.jit(jax.grad(lambda t: F.relu(t).sum())),
        "vanilla relu f+b": jax.jit(
            jax.grad(lambda t: jax.nn.relu(t).sum())),
    }
    results = {}
    for name, f in cases.items():
        ms = bench(f, x)
        gbps = nbytes / ms / 1e6
        results[name] = ms
        print(f"{name}: {ms:7.3f} ms   ({gbps:6.1f} GB/s input-read rate)")

    r_fwd = results["fewbit3 gelu fwd"] / results["vanilla gelu fwd"]
    r_fb = results["fewbit3 gelu f+b"] / results["vanilla gelu f+b"]
    print(f"\nfwd ratio quantized/vanilla : {r_fwd:.2f}  (reference: 2.18)")
    print(f"f+b ratio quantized/vanilla : {r_fb:.2f}  (reference: 1.37)")


if __name__ == "__main__":
    main()
