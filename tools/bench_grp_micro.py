"""Microbench: where does the RandomizedLinear step overhead come from?

All cases are amortised inside an on-device ``lax.fori_loop`` (the relay's
per-dispatch latency is ~1.3 ms, larger than most of these ops).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_grp_micro.py
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


ITERS = 50


def amortise(step, carry, rounds=3):
    """step(i, carry) -> carry, run ITERS times on device; ms per iter."""

    @jax.jit
    def run(c):
        return lax.fori_loop(0, ITERS, step, c)

    out = run(carry)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = run(carry)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3


def main():
    from fewbit_tpu.functional.linear import (_GRPConfig, _sketch,
                                              linear_grp_native)

    log("backend:", jax.default_backend())
    N = 8192
    key = jax.random.key(0)

    for d_in, d_out in ((768, 768), (768, 3072)):
        x = jax.random.normal(jax.random.key(1), (N, d_in), jnp.float32)
        w0 = jax.random.normal(jax.random.key(2), (d_in, d_out),
                               jnp.float32) * 0.02
        b = jnp.zeros((d_out,))

        def exact_step(i, w):
            def f(w):
                return ((x @ w + b) ** 2).sum()
            return w - 1e-9 * jax.grad(f)(w)

        def grp_step(i, w):
            def f(w):
                y = linear_grp_native(x, w, b, jax.random.fold_in(key, i),
                                      proj_dim_ratio=0.2,
                                      matmul="countsketch")
                return (y ** 2).sum()
            return w - 1e-9 * jax.grad(f)(w)

        t_exact = amortise(exact_step, w0)
        t_grp = amortise(grp_step, w0)
        log(f"{d_in}->{d_out}: exact fwd+bwd {t_exact:.3f} ms, "
            f"grp {t_grp:.3f} ms ({100*(t_grp/t_exact-1):+.0f}%)")

        cfg = _GRPConfig(proj_features=int(0.2 * N), matmul="countsketch",
                         has_bias=False)
        # The sketch's bucket count comes from the tile-friendly partition
        # (which may round k up); derive the accumulator shape from it so the
        # two can never drift apart.
        k_eff = jax.eval_shape(
            lambda a: _sketch(cfg, key, a, normalise=True), x).shape[0]
        acc0 = jnp.zeros((k_eff, d_in), jnp.float32)

        def sk_step(i, acc, arr):
            s = _sketch(cfg, jax.random.fold_in(key, i), arr,
                        normalise=True)
            return acc + s.astype(jnp.float32)

        t_sk = amortise(partial(sk_step, arr=x), acc0)
        xb = x.astype(jnp.bfloat16)
        t_skb = amortise(partial(sk_step, arr=xb), acc0)
        log(f"  countsketch (N,{d_in})->k: f32 {t_sk:.3f} ms, "
            f"bf16 {t_skb:.3f} ms")

        g = jax.random.normal(jax.random.key(3), (N, d_out), jnp.float32)

        def gw_step_full(i, acc):
            return acc * 0.5 + x.T @ (g + acc[0, 0])

        def gw_step_sk(i, acc):
            return acc * 0.5 + x[:k_eff].T @ (g[:k_eff] + acc[0, 0])

        gw0 = jnp.zeros((d_in, d_out), jnp.float32)
        t_gw_exact = amortise(gw_step_full, gw0)
        t_gw_sk = amortise(gw_step_sk, gw0)
        log(f"  grad_W matmul: exact(N={N}) {t_gw_exact:.3f} ms, "
            f"sketched(k={k_eff}) {t_gw_sk:.3f} ms")

        def rng_step(i, acc):
            bits = jax.random.bernoulli(jax.random.fold_in(key, i), 0.5,
                                        (N,))
            return acc + bits.sum(dtype=jnp.float32)

        t_rng = amortise(rng_step, jnp.float32(0))
        log(f"  bernoulli({N}) draw+sum: {t_rng:.3f} ms")


if __name__ == "__main__":
    main()
