"""Per-component overhead decomposition of the RoBERTa training step.

Times the compiled step for each few-bit configuration variant so the
step-time overhead can be attributed (megakernel vs elementwise FFN path,
sketched linears, etc.).  Run on real TPU hardware.

    python tools/bench_variants.py [--batch 64] [--seq 128] [--filter re]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(batch_size, seq, **cfg_kw):
    from fewbit_tpu.models import (RobertaConfig,
                                   RobertaForSequenceClassification)
    from fewbit_tpu.train import (TrainConfig, create_train_state,
                                  make_train_step, synthetic_glue)

    cfg = RobertaConfig(dtype=jnp.float32, **cfg_kw)
    model = RobertaForSequenceClassification(cfg)
    batch_np = next(synthetic_glue(batch_size, seq_len=seq,
                                   vocab_size=cfg.vocab_size))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state = create_train_state(
        model, TrainConfig(total_steps=100, learning_rate=1e-5), batch)
    step = make_train_step(model)
    compiled = jax.jit(step, donate_argnums=(0,)).lower(
        state, batch, jax.random.key(0)).compile()
    return state, batch, compiled


def measure(compiled, state, batch, iters=5, rounds=4, budget_s=90.0):
    key = jax.random.key(1)
    out_state, m = compiled(state, batch, key)
    _ = float(m["loss"])
    best = float("inf")
    start = time.perf_counter()
    for r in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out_state, m = compiled(out_state, batch, key)
        _ = float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
        if r >= 1 and time.perf_counter() - start > budget_s:
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
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--filter", default="")
    args = ap.parse_args()

    log("backend:", jax.default_backend())
    results = {}
    base = None
    for name, kw in VARIANTS.items():
        if args.filter and args.filter not in name:
            continue
        log(f"compiling {name} ...")
        state, batch, compiled = build(args.batch, args.seq, **kw)
        mem = int(compiled.memory_analysis().temp_size_in_bytes)
        t = measure(compiled, state, batch)
        del state, batch, compiled
        results[name] = {"ms": round(t * 1e3, 2),
                         "temp_gib": round(mem / 2**30, 3)}
        if name == "vanilla":
            base = t
        if base:
            results[name]["overhead_pct"] = round(100 * (t / base - 1), 1)
        log(name, results[name])
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
