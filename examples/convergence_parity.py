"""Convergence parity: exact vs few-bit training on a learnable task.

The reference's accuracy claim ("negligible loss in performance",
README.md:6) is backed by GLUE fine-tunes; this environment has no network,
so the equivalent evidence is a controlled A/B: identical model, data,
init, and schedule — only the backward compression differs.  Writes a
markdown report with final losses/accuracies per configuration.

    python examples/convergence_parity.py --steps 300 --out docs/ACCURACY.md
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def run(config_name, gelu_bits, proj_dim_ratio, steps, eval_batches=8):
    import jax
    import jax.numpy as jnp

    from fewbit_tpu.models import (RobertaConfig,
                                   RobertaForSequenceClassification)
    from fewbit_tpu.train import (TrainConfig, create_train_state,
                                  make_eval_step, make_train_step,
                                  synthetic_glue)

    cfg = RobertaConfig(vocab_size=1024, hidden_size=128, num_layers=4,
                        num_heads=4, intermediate_size=512,
                        max_position_embeddings=130,
                        gelu_bits=gelu_bits, proj_dim_ratio=proj_dim_ratio,
                        sketch="countsketch")
    model = RobertaForSequenceClassification(cfg)
    data = synthetic_glue(32, seq_len=64, vocab_size=cfg.vocab_size, seed=1)
    eval_data = [
        {k: jnp.asarray(v) for k, v in next(
            synthetic_glue(32, seq_len=64, vocab_size=cfg.vocab_size,
                           seed=999 + i)).items()}
        for i in range(eval_batches)]

    batch0 = {k: jnp.asarray(v) for k, v in next(data).items()}
    state = create_train_state(
        model, TrainConfig(learning_rate=3e-4, total_steps=steps), batch0)
    step = jax.jit(make_train_step(model), donate_argnums=(0,))
    evaluate = make_eval_step(model)

    losses = []
    key = jax.random.key(0)
    t0 = time.time()
    for i in range(steps):
        batch = {k: jnp.asarray(v) for k, v in next(data).items()}
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        if (i + 1) % 50 == 0:
            losses.append(float(metrics["loss"]))
    accs = [float(evaluate(state, b)["accuracy"]) for b in eval_data]
    acc = sum(accs) / len(accs)
    print(f"{config_name:24s} final-loss {losses[-1]:.4f} "
          f"holdout-acc {acc:.3f}  ({time.time()-t0:.0f}s)", flush=True)
    return losses, acc


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--out", type=Path, default=None)
    args = parser.parse_args()

    configs = [
        ("exact", None, None),
        ("gelu 3-bit", 3, None),
        ("gelu 1-bit", 1, None),
        ("randomized 20%", None, 0.2),
        ("gelu 3-bit + rand 20%", 3, 0.2),
    ]
    rows = []
    for name, gb, pr in configs:
        losses, acc = run(name, gb, pr, args.steps)
        rows.append((name, losses[-1], acc))

    if args.out:
        lines = [
            "# Convergence parity (exact vs few-bit backward)",
            "",
            f"4-layer/128-hidden RoBERTa on a learnable synthetic GLUE-style "
            f"task, {args.steps} steps, identical init/data/schedule; only "
            "the backward compression differs (see "
            "examples/convergence_parity.py).",
            "",
            "| config | final train loss | holdout accuracy |",
            "|---|---|---|",
        ]
        for name, loss, acc in rows:
            lines.append(f"| {name} | {loss:.4f} | {acc:.3f} |")
        args.out.write_text("\n".join(lines) + "\n")
        print("wrote", args.out)


if __name__ == "__main__":
    main()
