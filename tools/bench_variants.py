"""Per-component overhead decomposition of the RoBERTa training step.

Times the compiled step for each few-bit configuration variant so the
step-time overhead can be attributed (megakernel vs elementwise FFN path,
sketched linears, etc.).  Run on real TPU hardware.

Timing protocol matches bench.py: the train step is wrapped in a jitted
``lax.fori_loop`` so ONE dispatch measures LOOP_ITERS steps — the
execution relay's per-dispatch latency and sporadic multi-second stalls
divide out.

    python tools/bench_variants.py [--batch 64] [--seq 128] [--filter re]
"""

import argparse
import json
import signal
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

LOOP_ITERS = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class _Timeout(Exception):
    pass


def _with_deadline(seconds, fn, *args, default=None):
    def handler(signum, frame):
        raise _Timeout()

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(int(seconds))
    try:
        return fn(*args)
    except _Timeout:
        log(f"deadline of {seconds}s expired")
        return default
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def build(batch_size, seq, dtype=jnp.float32, **cfg_kw):
    from fewbit_tpu.models import (RobertaConfig,
                                   RobertaForSequenceClassification)
    from fewbit_tpu.train import (TrainConfig, create_train_state,
                                  make_train_step, synthetic_glue)
    from fewbit_tpu.util import tpu_compile_options

    cfg = RobertaConfig(dtype=dtype, **cfg_kw)
    model = RobertaForSequenceClassification(cfg)
    batch_np = next(synthetic_glue(batch_size, seq_len=seq,
                                   vocab_size=cfg.vocab_size))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state = create_train_state(
        model, TrainConfig(total_steps=100, learning_rate=1e-5), batch)
    step = make_train_step(model)

    def loop(st, bt, key):
        def body(i, carry):
            s, _ = carry
            s2, m = step(s, bt, jax.random.fold_in(key, i))
            return s2, m["loss"].astype(jnp.float32)

        return jax.lax.fori_loop(0, LOOP_ITERS, body,
                                 (st, jnp.zeros((), jnp.float32)))

    looped = jax.jit(loop, donate_argnums=(0,)).lower(
        state, batch, jax.random.key(1)).compile(
        compiler_options=tpu_compile_options())
    # Loop temp ~= per-step temp: the fori_loop body reuses one step's
    # scratch, so memory_analysis of the looped executable reports the
    # steady-state per-step footprint (plus the loop carry).
    mem = int(looped.memory_analysis().temp_size_in_bytes)
    return state, batch, looped, mem


def measure(looped, state, batch, rounds=3, budget_s=120.0):
    """Per-step time from single-dispatch fori_loop rounds (best of N)."""
    key = jax.random.key(1)
    out_state, loss = looped(state, batch, key)
    _ = float(loss)  # warm-up dispatch + sync
    best = float("inf")
    start = time.perf_counter()
    for r in range(rounds):
        t0 = time.perf_counter()
        out_state, loss = looped(out_state, batch, key)
        _ = float(loss)
        best = min(best, (time.perf_counter() - t0) / LOOP_ITERS)
        if time.perf_counter() - start > budget_s:
            log(f"timing budget reached after round {r + 1}")
            break
    return best


VARIANTS = {
    "vanilla": {},
    "gelu3_fused": dict(gelu_bits=3, fused_ffn=True),
    "gelu3_elem": dict(gelu_bits=3, fused_ffn=False),
    "grp_only": dict(proj_dim_ratio=0.2, sketch="countsketch"),
    "both_fused": dict(gelu_bits=3, proj_dim_ratio=0.2,
                       sketch="countsketch", fused_ffn=True),
    "both_elem": dict(gelu_bits=3, proj_dim_ratio=0.2,
                      sketch="countsketch", fused_ffn=False),
    # bf16 activations: halves the matmul time, so the quantise/pack/sketch
    # epilogues are relatively twice as expensive — the overhead claim at
    # its hardest (VERDICT r3 #3).
    "vanilla_bf16": dict(dtype=jnp.bfloat16),
    "both_fused_bf16": dict(gelu_bits=3, proj_dim_ratio=0.2,
                            sketch="countsketch", fused_ffn=True,
                            dtype=jnp.bfloat16),
    # Flash attention on top of the full few-bit config (attention scores
    # never materialise in HBM; needs attention_dropout=0).
    "both_fused_flash": dict(gelu_bits=3, proj_dim_ratio=0.2,
                             sketch="countsketch", fused_ffn=True,
                             flash_attention=True, attention_dropout=0.0),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--filter", default="")
    args = ap.parse_args()

    log("backend:", jax.default_backend())
    results = {}
    base = {}  # per-dtype baseline step time (vanilla / vanilla_bf16)
    for name, kw in VARIANTS.items():
        if args.filter and args.filter not in name:
            continue
        log(f"compiling {name} ...")
        try:
            state, batch, looped, mem = build(args.batch, args.seq, **kw)
        except Exception as exc:  # noqa: BLE001 — OOM / lowering failure
            log(f"{name} failed: {type(exc).__name__}: {exc}")
            results[name] = {"error": type(exc).__name__}
            continue
        t = _with_deadline(240, measure, looped, state, batch)
        del state, batch, looped
        results[name] = {"temp_gib": round(mem / 2**30, 3)}
        if t is not None:
            results[name]["ms"] = round(t * 1e3, 2)
            dt = "bf16" if name.endswith("_bf16") else "f32"
            if name.startswith("vanilla"):
                base[dt] = t
            elif base.get(dt):
                results[name]["overhead_pct"] = round(
                    100 * (t / base[dt] - 1), 1)
        log(name, results[name])
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
