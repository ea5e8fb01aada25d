"""Long-sequence capability/benchmark rows on the real chip.

Reproduces the docs/BENCHMARKS.md long-sequence tables: for a model
family at a long sequence length, measures compiled step scratch
(``memory_analysis().temp_size_in_bytes``) and fori-loop step time for
the four configurations

    vanilla            exact activations + exact linears, standard attention
    fewbit             gelu3 + sketch 20%, standard attention
    vanilla_flash      exact, flash_attention="auto" (tuned/auto blocks)
    fewbit_flash       gelu3 + sketch 20% + flash "auto"

A configuration that cannot compile on the 16 GiB chip is reported as
compile-OOM with the error head — at seq=2048/bs=4 (RoBERTa, f32) that
is the *point*: only the flash rows fit, and fewbit+flash is both the
smallest and the fastest (docs/BENCHMARKS.md "capability" table).

Reference: none — the reference library has no attention code at all
(SURVEY §1); these rows are beat-the-reference territory.

    python tools/bench_longseq.py --family gpt --batch 2 --seq 2048
    python tools/bench_longseq.py --family roberta --batch 4 --seq 2048
    python tools/bench_longseq.py --family gpt --batch 1 --seq 4096
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

LOOP_ITERS = 10

CONFIGS = {
    "vanilla": dict(bits=None, ratio=None, flash=False),
    "fewbit": dict(bits=3, ratio=0.2, flash=False),
    "vanilla_flash": dict(bits=None, ratio=None, flash="auto"),
    "fewbit_flash": dict(bits=3, ratio=0.2, flash="auto"),
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(family, batch, seq, bits, ratio, flash, dtype):
    from fewbit_tpu.train import (TrainConfig, causal_lm_loss,
                                  create_train_state, make_train_step,
                                  synthetic_glue, synthetic_lm)
    from fewbit_tpu.util import tpu_compile_options

    common = dict(gelu_bits=bits, proj_dim_ratio=ratio, sketch="countsketch",
                  dtype=dtype, flash_attention=flash)
    if flash:  # the flash kernel applies no dropout; "auto" needs 0 to engage
        common.update(attention_dropout=0.0)
    if family == "gpt":
        from fewbit_tpu.models import GPTConfig, GPTForCausalLM

        cfg = GPTConfig(max_position_embeddings=seq, **common)
        model = GPTForCausalLM(cfg)
        batch_np = next(synthetic_lm(batch, seq_len=seq,
                                     vocab_size=cfg.vocab_size))
        loss_fn = causal_lm_loss
    else:
        from fewbit_tpu.models import (RobertaConfig,
                                       RobertaForSequenceClassification)

        cfg = RobertaConfig(max_position_embeddings=seq + 2, **common)
        model = RobertaForSequenceClassification(cfg)
        batch_np = next(synthetic_glue(batch, seq_len=seq,
                                       vocab_size=cfg.vocab_size))
        loss_fn = None
    data = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state = create_train_state(
        model, TrainConfig(total_steps=100, learning_rate=1e-5), data)
    step = (make_train_step(model, loss_fn=loss_fn) if loss_fn
            else make_train_step(model))
    jitted = jax.jit(step, donate_argnums=(0,))
    compiled = jitted.lower(state, data, jax.random.key(0)).compile(
        compiler_options=tpu_compile_options())
    return state, data, step, compiled


def time_steps(step, state, data):
    """One jitted fori_loop of LOOP_ITERS train steps (bench.py protocol:
    traced trip count, readback sync)."""
    import time

    from fewbit_tpu.util import tpu_compile_options

    def loop(state, data, key):
        def body(i, carry):
            st, _ = carry
            st2, m = step(st, data, jax.random.fold_in(key, i))
            return st2, m["loss"].astype(jnp.float32)

        return jax.lax.fori_loop(0, LOOP_ITERS, body,
                                 (state, jnp.zeros((), jnp.float32)))

    compiled = jax.jit(loop, donate_argnums=(0,)).lower(
        state, data, jax.random.key(1)).compile(
        compiler_options=tpu_compile_options())
    st, ls = compiled(state, data, jax.random.key(1))
    _ = float(ls)  # warm + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        st, ls = compiled(st, data, jax.random.key(1))
        _ = float(ls)
        best = min(best, (time.perf_counter() - t0) / LOOP_ITERS)
    return best


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--family", choices=("roberta", "gpt"), default="gpt")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--dtype", choices=("f32", "bf16"), default="f32")
    ap.add_argument("--configs", default=",".join(CONFIGS),
                    help="comma list from: " + ",".join(CONFIGS))
    ap.add_argument("--no-time", action="store_true",
                    help="memory rows only (skip the timing loops)")
    args = ap.parse_args()
    dtype = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    log("backend:", jax.default_backend())

    rows = []
    for name in args.configs.split(","):
        c = CONFIGS[name]
        try:
            state, data, step, compiled = build(
                args.family, args.batch, args.seq, c["bits"], c["ratio"],
                c["flash"], dtype)
            temp = int(compiled.memory_analysis().temp_size_in_bytes)
            del compiled
            row = {"config": name, "temp_bytes": temp}
            msg = f"{name:<16} temp {temp / 2**30:.2f} GiB"
            if not args.no_time:
                t = time_steps(step, state, data)
                row["step_ms"] = round(t * 1e3, 1)
                msg += f"  step {row['step_ms']} ms"
            log(msg)
        except Exception as exc:  # noqa: BLE001 — compile-OOM is a result
            head = f"{type(exc).__name__}: {exc}".splitlines()[0][:160]
            row = {"config": name, "error": head}
            log(f"{name:<16} FAILED {head}")
        rows.append(row)
    print(json.dumps({"family": args.family, "batch": args.batch,
                      "seq": args.seq, "dtype": args.dtype, "rows": rows}))


if __name__ == "__main__":
    main()
