"""Roofline + MFU accounting for the fused Pallas kernels on the real TPU.

For each hot kernel (SURVEY.md §7 stage 3: "benchmark vs speed-of-light
memory bandwidth"; BASELINE.md: "pack/unpack kernels at speed-of-light"),
measures achieved HBM bytes/s against the chip's peak bandwidth, and — for
the matmul kernels — achieved FLOP/s against MXU peak.  Also computes the
headline training-step MFU from the compiled step's own FLOP count
(``compiled.cost_analysis()``).

Timing protocol: every measurement wraps ITERS kernel invocations in ONE
jitted ``lax.fori_loop`` so a single dispatch (one relay round-trip) covers
the whole batch of iterations — per-dispatch latency and the environment's
sporadic relay stalls are amortised away.  Loop-carried dependencies (chain
``y = f(y)`` where shapes allow, else a one-element dynamic-update-slice of
the carry from the previous output) defeat XLA's loop-invariant code motion
without adding measurable traffic.

Peaks are the published TPU v5e (v5 lite) per-chip numbers: 819 GB/s HBM
bandwidth, 197 TFLOP/s bf16 MXU.  Bytes models count actual HBM traffic of
each kernel's operands/results at their stored dtypes.

    python tools/roofline.py [--bits 1 3 4] [--markdown] [--headline]
    python tools/roofline.py --memcheck   # temp_size vs peak_bytes_in_use
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

HBM_PEAK = 819e9          # TPU v5e: 819 GB/s per chip
MXU_PEAK = 197e12         # TPU v5e: 197 TFLOP/s bf16

ITERS = 20
ROUNDS = 3

# Shapes: elementwise at the reference op-benchmark size (128*1024^2
# elements, memory-usage-operation-only.py); matmul at the headline FFN
# up-projection shape (bs=64 x seq=128 tokens, 768 -> 3072).
EW_R, EW_C = 131072, 1024
N, K, M = 8192, 768, 3072


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_loop(body, carry, iters=ITERS, rounds=ROUNDS):
    """Best per-iteration time of ``iters`` fori_loop steps, one dispatch."""

    @jax.jit
    def run(c):
        return lax.fori_loop(0, iters, body, c)

    out = run(carry)
    jax.block_until_ready(out)  # compile + warm
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = run(out)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def touch(carry, val):
    """One-element update of the carry from ``val`` — a data dependence that
    blocks loop-invariant code motion at no measurable traffic."""
    patch = (val[:1, :1] * 1e-6).astype(carry.dtype)
    return lax.dynamic_update_slice(carry, patch, (0, 0))


def measure_elementwise(spec, borders, levels, bits):
    from fewbit_tpu.ops import pallas_kernels as pk

    x = jax.random.normal(jax.random.key(0), (EW_R, EW_C), jnp.float32)
    n = EW_R * EW_C

    def fwd_body(i, y):
        y2, _packed = pk.fused_forward(spec, y, borders)
        return y2

    t_fwd = timed_loop(fwd_body, x)

    _, packed = jax.jit(lambda t: pk.fused_forward(spec, t, borders))(x)

    def bwd_body(i, g):
        return pk.fused_backward(spec, packed, levels, g)

    t_bwd = timed_loop(bwd_body, x)

    byt = n * (8 + bits / 8)  # 4B in + 4B out + bits/8 code (each pass)
    return [
        (f"fused_forward (act+quant+pack, {bits}-bit)", t_fwd, byt, None),
        (f"fused_backward (unpack+LUT+mul, {bits}-bit)", t_bwd, byt, None),
    ]


def measure_matmul(spec, borders, levels, bits):
    from fewbit_tpu.functional.ffn import _signs
    from fewbit_tpu.ops import pallas_kernels as pk

    x = jax.random.normal(jax.random.key(1), (N, K), jnp.float32)
    w = jax.random.normal(jax.random.key(2), (K, M), jnp.float32) * 0.02
    k_eff = pk.countsketch_aligned_keff(N, int(0.2 * N))
    sigma = _signs(jax.random.key(3), N)
    flops = 2.0 * N * K * M

    def da_body(i, c):
        y, _p = pk.fused_dense_act(spec, c, w, None, borders)
        return touch(c, y)

    t_da = timed_loop(da_body, x)
    by_da = 4 * N * K + 4 * K * M + 4 * N * M + bits / 8 * N * M

    def das_body(i, c):
        y, _p, _sk = pk.fused_dense_act_sketch(spec, c, w, None, borders,
                                               sigma, k_eff,
                                               y_dtype=jnp.bfloat16)
        return touch(c, y)

    t_das = timed_loop(das_body, x)
    by_das = (4 * N * K + 4 * K * M + 2 * N * M + bits / 8 * N * M
              + 4 * k_eff * M)

    # Backward: residual from the real forward so the layouts line up.
    _, packed, _ = jax.jit(
        lambda t: pk.fused_dense_act_sketch(spec, t, w, None, borders,
                                            sigma, k_eff,
                                            y_dtype=jnp.bfloat16))(x)
    g = jax.random.normal(jax.random.key(4), (N, K), jnp.bfloat16)
    wt = jnp.asarray(w.T[:K], jnp.bfloat16)  # (H=K, M): down-proj transposed

    def mlb_body(i, c):
        dz, _sk, _db = pk.fused_matmul_lut_backward(
            spec, packed, levels, c, wt, sigma, k_eff,
            dz_dtype=jnp.bfloat16)
        return touch(c, dz)

    t_mlb = timed_loop(mlb_body, g)
    by_mlb = (2 * N * K + 2 * K * M + bits / 8 * N * M + 2 * N * M
              + 4 * k_eff * M)

    return [
        (f"fused_dense_act (megakernel, {bits}-bit)", t_da, by_da, flops),
        (f"fused_dense_act_sketch ({bits}-bit)", t_das, by_das, flops),
        (f"fused_matmul_lut_backward ({bits}-bit)", t_mlb, by_mlb, flops),
    ]


def headline_mfu():
    """Compile the bench.py headline steps; MFU from cost_analysis FLOPs and
    the same on-device fori_loop timing bench.py uses."""
    import bench

    rows = []
    for name, (gb, pr) in (("vanilla", (None, None)),
                           ("fewbit", (3, 0.2))):
        log(f"compiling headline step ({name})...")
        state, batch, step, compiled = bench.build(gb, pr, 64)
        ca = compiled.cost_analysis()
        flops = float(ca.get("flops", 0.0))
        del compiled
        looped = bench.build_loop(step, state, batch)
        t = bench.measure_time(looped, state, batch)
        rows.append((name, t, flops, flops / t / MXU_PEAK))
        log(f"{name}: {t*1e3:.1f} ms, {flops/1e12:.2f} TFLOP "
            f"-> MFU {100*flops/t/MXU_PEAK:.1f}%")
    return rows


def memcheck():
    """One-time cross-check of the bench memory metric: XLA's static
    ``temp_size_in_bytes`` vs the runtime allocator's ``peak_bytes_in_use``
    delta for the same compiled step."""
    import bench

    dev = jax.local_devices()[0]
    state, batch, step, compiled = bench.build(3, 0.2, 64)
    ma = compiled.memory_analysis()
    stats0 = dev.memory_stats()
    base = stats0["bytes_in_use"]
    out, m = compiled(state, batch, jax.random.key(0))
    jax.block_until_ready(m["loss"])
    peak = dev.memory_stats()["peak_bytes_in_use"]
    print(json.dumps({
        "temp_size_in_bytes": int(ma.temp_size_in_bytes),
        "argument_size_in_bytes": int(ma.argument_size_in_bytes),
        "output_size_in_bytes": int(ma.output_size_in_bytes),
        "alias_size_in_bytes": int(ma.alias_size_in_bytes),
        "bytes_in_use_before": int(base),
        "peak_bytes_in_use": int(peak),
        "runtime_peak_delta": int(peak - base),
    }))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bits", type=int, nargs="+", default=[1, 3, 4])
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument("--headline", action="store_true",
                    help="also compile+time the full training steps for MFU")
    ap.add_argument("--memcheck", action="store_true")
    args = ap.parse_args()

    if args.memcheck:
        memcheck()
        return

    from fewbit_tpu.functional.activations import resolve_activation

    log("backend:", jax.default_backend(),
        jax.local_devices()[0].device_kind)
    rows = []
    for bits in args.bits:
        spec, borders, levels = resolve_activation("gelu", bits=bits)
        log(f"measuring {bits}-bit kernels...")
        rows += measure_elementwise(spec, borders, levels, bits)
        rows += measure_matmul(spec, borders, levels, bits)

    out = []
    for name, t, byt, flops in rows:
        bw = byt / t
        row = {"kernel": name, "ms": round(t * 1e3, 3),
               "GB_s": round(bw / 1e9, 1),
               "hbm_peak_pct": round(100 * bw / HBM_PEAK, 1)}
        if flops:
            row["TFLOP_s"] = round(flops / t / 1e12, 1)
            row["mxu_peak_pct"] = round(100 * flops / t / MXU_PEAK, 1)
        out.append(row)

    if args.markdown:
        print("| kernel | time | HBM GB/s | % HBM peak | TFLOP/s |"
              " % MXU peak |")
        print("|---|---|---|---|---|---|")
        for r in out:
            tf = f"{r['TFLOP_s']}" if "TFLOP_s" in r else "—"
            mx = f"{r['mxu_peak_pct']}%" if "mxu_peak_pct" in r else "—"
            print(f"| {r['kernel']} | {r['ms']} ms | {r['GB_s']} |"
                  f" {r['hbm_peak_pct']}% | {tf} | {mx} |")
    else:
        for r in out:
            print(json.dumps(r))

    if args.headline:
        for name, t, flops, mfu in headline_mfu():
            print(json.dumps({"step": name, "ms": round(t * 1e3, 2),
                              "TFLOP_per_step": round(flops / 1e12, 2),
                              "mfu_pct": round(100 * mfu, 1)}))


if __name__ == "__main__":
    main()
