"""Attribute RoBERTa step time to XLA ops via a jax.profiler device trace.

Captures a profiler trace of the compiled training step for a given config,
parses the ``.trace.json.gz`` chrome trace, aggregates device-kernel wall
time by fusion name, and prints the top-N ops.  Run with two configs to diff
where the few-bit overhead goes (the reference attributes op overhead with
``torch.profiler``, ``notebooks/few-bit-backward/memory-usage-operation-only.py:47-73``).

    python tools/profile_step.py --variant both_fused --top 30
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

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


def aggregate_trace(trace_dir):
    """Sum device-lane event durations by op name from the chrome trace."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    # The leaf kernel lane is the device-side thread named "XLA Ops"
    # (other lanes — "Steps", "XLA Modules", host python — nest/duplicate).
    device_pids, op_lanes = set(), set()
    for ev in events:
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pname = ev.get("args", {}).get("name", "")
            if "TPU" in pname or "/device:" in pname:
                device_pids.add(ev.get("pid"))
        if ev.get("name") == "thread_name" \
                and ev.get("args", {}).get("name") == "XLA Ops":
            op_lanes.add((ev.get("pid"), ev.get("tid")))
    per_op = defaultdict(float)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        key = (ev.get("pid"), ev.get("tid"))
        if key not in op_lanes or ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "")
        dur = float(ev.get("dur", 0.0))  # microseconds
        per_op[name] += dur
        total += dur
    return per_op, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="both_fused",
                    choices=sorted(VARIANTS))
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    log("backend:", jax.default_backend())
    state, batch, compiled = build(args.batch, args.seq,
                                   **VARIANTS[args.variant])
    key = jax.random.key(1)
    state, m = compiled(state, batch, key)
    _ = float(m["loss"])  # warm up

    trace_dir = tempfile.mkdtemp(prefix=f"trace_{args.variant}_")
    log("tracing into", trace_dir)
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            state, m = compiled(state, batch, key)
        _ = float(m["loss"])

    per_op, total = aggregate_trace(trace_dir)
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]
    out = {
        "variant": args.variant,
        "total_device_us_per_step": round(total / args.steps, 1),
        "top_ops": [
            {"name": n, "us_per_step": round(d / args.steps, 1),
             "pct": round(100 * d / total, 2)} for n, d in rows
        ],
        "trace_dir": trace_dir,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
