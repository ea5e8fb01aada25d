"""Micro-benchmark of the fused dense+activation megakernel vs XLA.

Measures, at the RoBERTa FFN-up shape (N=batch*seq, 768 -> 3072):
  * XLA dense + exact gelu (fwd, and fwd+bwd)
  * fewbit_dense_act megakernel (fwd, and fwd+bwd)
and cross-checks the megakernel output against the jnp reference on the
same device (bf16-MXU tolerance).

    python tools/bench_ffn_micro.py [--n 8192] [--kdim 768] [--m 3072]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def bench(f, args, iters=20, rounds=3):
    out = f(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--kdim", type=int, default=768)
    ap.add_argument("--m", type=int, default=3072)
    args = ap.parse_args()

    import fewbit_tpu.functional as F

    print("backend:", jax.default_backend(), file=sys.stderr)
    key = jax.random.key(0)
    kx, kw, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (args.n, args.kdim), jnp.float32)
    w = jax.random.normal(kw, (args.kdim, args.m), jnp.float32) * 0.03
    b = jax.random.normal(kb, (args.m,), jnp.float32) * 0.03

    exact_fwd = jax.jit(lambda x, w, b: jax.nn.gelu(x @ w + b,
                                                    approximate=False))
    fused_fwd = jax.jit(lambda x, w, b: F.fewbit_dense_act(x, w, b, bits=3))
    exact_fb = jax.jit(jax.grad(
        lambda x, w, b: jax.nn.gelu(x @ w + b, approximate=False).sum(),
        argnums=(0, 1)))
    fused_fb = jax.jit(jax.grad(
        lambda x, w, b: F.fewbit_dense_act(x, w, b, bits=3).sum(),
        argnums=(0, 1)))

    # Correctness vs the device's own exact path (XLA also runs bf16 MXU
    # passes for f32 by default, so tolerances are bf16-scale).
    y_f = fused_fwd(x, w, b)
    y_e = exact_fwd(x, w, b)
    err = float(jnp.max(jnp.abs(y_f - y_e)))
    scale = float(jnp.max(jnp.abs(y_e)))
    print(f"forward max|diff| = {err:.4f} (scale {scale:.2f})",
          file=sys.stderr)
    assert err < 0.05 * scale + 0.05, "megakernel forward mismatch"

    res = {}
    for name, f, a in [
        ("exact fwd", exact_fwd, (x, w, b)),
        ("fused fwd", fused_fwd, (x, w, b)),
        ("exact f+b", exact_fb, (x, w, b)),
        ("fused f+b", fused_fb, (x, w, b)),
    ]:
        t = bench(f, a)
        res[name] = round(t, 3)
        print(f"{name}: {t:.3f} ms", file=sys.stderr)
    import json
    print(json.dumps(res))


if __name__ == "__main__":
    main()
