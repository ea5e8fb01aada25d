"""Roofline + MFU accounting for the fused Pallas kernels on the real TPU.

For each hot kernel (SURVEY.md §7 stage 3: "benchmark vs speed-of-light
memory bandwidth"; BASELINE.md: "pack/unpack kernels at speed-of-light"),
measures achieved HBM bytes/s against the chip's peak bandwidth, and — for
the matmul kernels — achieved FLOP/s against MXU peak.  Also computes the
headline training-step MFU from the compiled step's own FLOP count
(``compiled.cost_analysis()``).

Timing protocol (tools/timing.py): every measurement wraps 50 kernel
invocations in ONE
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
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

HBM_PEAK = 819e9          # TPU v5e: 819 GB/s per chip
MXU_PEAK = 197e12         # TPU v5e: 197 TFLOP/s bf16

# Shapes: elementwise at the reference op-benchmark size (128*1024^2
# elements, memory-usage-operation-only.py); matmul at the headline FFN
# up-projection shape (bs=64 x seq=128 tokens, 768 -> 3072).
EW_R, EW_C = 131072, 1024
N, K, M = 8192, 768, 3072
SEQ_HEADLINE = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Shared traced-trip-count + readback-sync protocol (see tools/timing.py
# for the two environment hazards it works around).
from tools.timing import timed_loop, touch  # noqa: E402


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
    """Matmul-family kernels, each BRACKETED by adjacent timings of the
    same-shape XLA bf16 matmul.  The chip's throughput drifts by tens of
    percent within a session (docs/BENCHMARKS.md), so a kernel's honest
    figure of merit is the ratio to an XLA baseline measured seconds — not
    minutes — away; the raw times are kept for the bandwidth/MXU columns."""
    from fewbit_tpu.functional.ffn import _signs
    from fewbit_tpu.ops import pallas_kernels as pk

    x = jax.random.normal(jax.random.key(1), (N, K), jnp.float32)
    w = jax.random.normal(jax.random.key(2), (K, M), jnp.float32) * 0.02
    wb = w.astype(jnp.bfloat16)
    k_eff = pk.countsketch_aligned_keff(N, int(0.2 * N))
    sigma = _signs(jax.random.key(3), N)
    flops = 2.0 * N * K * M

    def xla_body(i, c):
        y = c.astype(jnp.bfloat16) @ wb
        return touch(c, y)

    def bracketed(body, carry):
        t0 = timed_loop(xla_body, x)
        t = timed_loop(body, carry)
        t1 = timed_loop(xla_body, x)
        return t, t / ((t0 + t1) / 2)

    def da_body(i, c):
        y, _p = pk.fused_dense_act(spec, c, w, None, borders)
        return touch(c, y)

    t_da, r_da = bracketed(da_body, x)
    by_da = 4 * N * K + 4 * K * M + 4 * N * M + bits / 8 * N * M

    def das_body(i, c):
        y, _p, _sk = pk.fused_dense_act_sketch(spec, c, w, None, borders,
                                               sigma, k_eff,
                                               y_dtype=jnp.bfloat16)
        return touch(c, y)

    t_das, r_das = bracketed(das_body, x)
    by_das = (4 * N * K + 4 * K * M + 2 * N * M + bits / 8 * N * M
              + 4 * k_eff * M)

    # Backward: residual from the real forward so the layouts line up.
    _, packed, _ = jax.jit(
        lambda t: pk.fused_dense_act_sketch(spec, t, w, None, borders,
                                            sigma, k_eff,
                                            y_dtype=jnp.bfloat16))(x)
    g = jax.random.normal(jax.random.key(4), (N, K), jnp.bfloat16)
    # (H=K, M): the down projection (M, H) pre-transposed by the caller —
    # same shape as the up kernel, so reuse it.
    wt = w.astype(jnp.bfloat16)

    def mlb_body(i, c):
        dz, _sk, _db = pk.fused_matmul_lut_backward(
            spec, packed, levels, c, wt, sigma, k_eff,
            dz_dtype=jnp.bfloat16)
        return touch(c, dz)

    t_mlb, r_mlb = bracketed(mlb_body, g)
    # dz sketch stores at sketch_dtype(g.dtype) = bf16 here (2 B/elem).
    by_mlb = (2 * N * K + 2 * K * M + bits / 8 * N * M + 2 * N * M
              + 2 * k_eff * M)

    return [
        (f"fused_dense_act (megakernel, {bits}-bit)", t_da, by_da, flops,
         r_da),
        (f"fused_dense_act_sketch ({bits}-bit)", t_das, by_das, flops,
         r_das),
        (f"fused_matmul_lut_backward ({bits}-bit)", t_mlb, by_mlb, flops,
         r_mlb),
    ]


def measure_input_sketch():
    """fused_matmul_input_sketch (the attention sketched-linear kernel) vs
    the unfused XLA pair (matmul + separate signed bucket-sum sketch) at
    the attention-projection shape."""
    from fewbit_tpu.ops import pallas_kernels as pk

    n, kdim, m = N, K, 768
    k = int(0.2 * n)
    k_eff = pk.matmul_sketch_keff(n, kdim, m, k, jnp.float32.dtype)
    if k_eff is None:  # shape fell outside the kernel envelope
        return []
    x = jax.random.normal(jax.random.key(5), (n, kdim), jnp.float32)
    w = jax.random.normal(jax.random.key(6), (kdim, m), jnp.float32) * 0.02
    sigma = (jax.random.bernoulli(jax.random.key(7), 0.5, (n,))
             .astype(jnp.float32) * 2.0 - 1.0)
    flops = 2.0 * n * kdim * m

    def fused_body(i, c):
        y, sk, cs = pk.fused_matmul_input_sketch(c, w, None, sigma, k_eff,
                                                 want_colsum=True)
        return touch(c, y + 1e-9 * sk[:1, :1] + 1e-9 * cs[:1])

    t_f = timed_loop(fused_body, x)

    def unfused_body(i, c):
        y = c @ w
        sk = (c * sigma[:, None]).reshape(n // k_eff, k_eff, kdim).sum(0)
        cs = c.sum(0)
        return touch(c, y + 1e-9 * sk[:1, :1] + 1e-9 * cs[:1])

    t_u = timed_loop(unfused_body, x)
    # fused: one pass over x (bf16 after cast); w is fetched ONCE and stays
    # VMEM-resident (its block index never changes across the grid)
    by_f = (2 * n * kdim + 2 * kdim * m
            + 4 * n * m + 4 * k_eff * kdim)
    # unfused: x read twice more (sketch + colsum fuse into one pass)
    by_u = 4 * n * kdim * 2 + 4 * kdim * m + 4 * n * m + 4 * k_eff * kdim
    return [
        ("fused_matmul_input_sketch (attn linear)", t_f, by_f, flops),
        ("XLA matmul+sketch+colsum (unfused)", t_u, by_u, flops),
    ]


def measure_xla_baselines():
    """What plain XLA achieves on this chip at the same shapes — the
    *attainable* roofline the fused kernels are judged against (theoretical
    peaks are never reached by either side at these shapes)."""
    x = jax.random.normal(jax.random.key(0), (EW_R, EW_C), jnp.float32)
    n = EW_R * EW_C

    def gelu_body(i, y):
        return jax.nn.gelu(y, approximate=False)

    t_gelu = timed_loop(gelu_body, x)

    xb = jax.random.normal(jax.random.key(1), (N, K), jnp.bfloat16)
    wb = jax.random.normal(jax.random.key(2), (K, M), jnp.bfloat16) * 0.02

    def mm_body(i, c):
        y = c @ wb
        return touch(c, y)

    t_mm = timed_loop(mm_body, xb)
    flops = 2.0 * N * K * M
    return [
        ("XLA gelu fwd (f32, baseline)", t_gelu, 8 * n, None),
        ("XLA matmul (bf16, baseline)", t_mm,
         2 * N * K + 2 * K * M + 2 * N * M, flops),
    ]


def roberta_step_flops(batch=64, seq=128, hidden=768, layers=12,
                       inter=3072, sketch_ratio=None):
    """Analytic matmul FLOPs of one RoBERTa-base training step.

    (XLA's ``cost_analysis()['flops']`` undercounts ~10x on this backend, so
    MFU is computed from first principles.)  Per layer: QKV+out 4h² + FFN
    2·h·inter matmul params; training = 6x (2 fwd + 2 dx + 2 dW); attention
    scores/values add 4s²h fwd (x3 for training).  A sketched linear
    replaces the dW term 2·N·d·m with 2·k·d·m, k = ratio-aligned bucket
    count (k_eff/N = 0.25 at the headline 20% ratio, see
    ``countsketch_aligned_keff``)."""
    tokens = batch * seq
    matmul_params = layers * (4 * hidden * hidden + 2 * hidden * inter)
    dW_scale = 1.0
    if sketch_ratio is not None:
        from fewbit_tpu.ops.pallas_kernels import countsketch_aligned_keff
        k_eff = countsketch_aligned_keff(tokens, int(sketch_ratio * tokens))
        dW_scale = (k_eff / tokens) if k_eff else sketch_ratio
    fwd = 2 * matmul_params * tokens
    dx = 2 * matmul_params * tokens
    dW = 2 * matmul_params * tokens * dW_scale
    attn = 3 * (4 * seq * seq * hidden) * layers * batch
    return fwd + dx + dW + attn


def headline_mfu():
    """Compile the bench.py headline steps; MFU from analytic FLOPs and the
    same on-device fori_loop timing bench.py uses."""
    import bench

    rows = []
    for name, (gb, pr) in (("vanilla", (None, None)),
                           ("fewbit", (3, 0.2))):
        log(f"compiling headline step ({name})...")
        state, batch, step, compiled = bench.build(gb, pr, 64)
        flops = roberta_step_flops(batch=64, seq=SEQ_HEADLINE,
                                   sketch_ratio=pr)
        ca_flops = float(compiled.cost_analysis().get("flops", 0.0))
        del compiled
        looped = bench.build_loop(step, state, batch)
        t = bench.measure_time(looped, state, batch)
        rows.append((name, t, flops, flops / t / MXU_PEAK))
        log(f"{name}: {t*1e3:.1f} ms, {flops/1e12:.2f} TFLOP analytic "
            f"(cost_analysis says {ca_flops/1e12:.2f}) "
            f"-> MFU {100*flops/t/MXU_PEAK:.1f}%")
    return rows


def memcheck():
    """One-time validation of the bench memory metric.

    The relay device exposes no runtime allocator stats
    (``Device.memory_stats()`` is None), so XLA's static
    ``temp_size_in_bytes`` is validated by OOM-bracketing against the
    chip's real 16 GiB HBM: configs whose predicted peak
    (args + temp, aliasing discounted) lands under the budget must RUN,
    configs predicted over it must OOM.  Any inversion would falsify the
    static metric."""
    import bench

    HBM = 16 * 2**30
    results = []
    for name, (gb, pr, bs) in (
        ("vanilla_bs64", (None, None, 64)),     # ~10.8 GiB -> runs
        ("fewbit_bs128", (3, 0.2, 128)),        # ~11.8 GiB -> runs
        ("vanilla_bs128", (None, None, 128)),   # ~20.8 GiB -> OOM
    ):
        try:
            state, batch, step, compiled = bench.build(gb, pr, bs)
            ma = compiled.memory_analysis()
            predicted = int(ma.argument_size_in_bytes
                            + ma.temp_size_in_bytes
                            - ma.alias_size_in_bytes
                            + ma.output_size_in_bytes)
            try:
                out, m = compiled(state, batch, jax.random.key(0))
                loss = float(m["loss"])  # readback = real sync
                ran = True
            except Exception as exc:  # noqa: BLE001 — runtime OOM
                ran = False
            del state, batch, compiled
        except Exception as exc:  # noqa: BLE001 — compile-time OOM
            predicted, ran = None, False
        consistent = (predicted is None or
                      (predicted < HBM) == ran)
        results.append({"config": name, "predicted_bytes": predicted,
                        "ran": ran, "consistent_with_16GiB": consistent})
        log(results[-1])
    print(json.dumps(results))


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
    log("measuring XLA baselines...")
    rows = measure_xla_baselines()
    log("measuring input-sketch kernel...")
    rows += measure_input_sketch()
    for bits in args.bits:
        spec, borders, levels = resolve_activation("gelu", bits=bits)
        log(f"measuring {bits}-bit kernels...")
        rows += measure_elementwise(spec, borders, levels, bits)
        rows += measure_matmul(spec, borders, levels, bits)

    out = []
    for row_t in rows:
        name, t, byt, flops = row_t[:4]
        vs_xla = row_t[4] if len(row_t) > 4 else None
        bw = byt / t
        row = {"kernel": name, "ms": round(t * 1e3, 3),
               "GB_s": round(bw / 1e9, 1),
               "hbm_peak_pct": round(100 * bw / HBM_PEAK, 1)}
        if flops:
            row["TFLOP_s"] = round(flops / t / 1e12, 1)
            row["mxu_peak_pct"] = round(100 * flops / t / MXU_PEAK, 1)
        if vs_xla is not None:
            # time ratio to the ADJACENT (drift-immune) XLA same-shape
            # bf16 matmul; <1 means faster than the bare matmul.
            row["vs_xla_matmul"] = round(vs_xla, 3)
            row["pct_of_xla_matmul"] = round(100 / vs_xla, 1)
        out.append(row)

    if args.markdown:
        print("| kernel | time | HBM GB/s | % HBM peak | TFLOP/s |"
              " % MXU peak | % of XLA matmul |")
        print("|---|---|---|---|---|---|---|")
        for r in out:
            tf = f"{r['TFLOP_s']}" if "TFLOP_s" in r else "—"
            mx = f"{r['mxu_peak_pct']}%" if "mxu_peak_pct" in r else "—"
            vx = (f"{r['pct_of_xla_matmul']}%"
                  if "pct_of_xla_matmul" in r else "—")
            print(f"| {r['kernel']} | {r['ms']} ms | {r['GB_s']} |"
                  f" {r['hbm_peak_pct']}% | {tf} | {mx} | {vx} |")
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
