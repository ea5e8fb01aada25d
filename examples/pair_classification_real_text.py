"""Real-prose CLASSIFICATION parity: MRPC-shaped sentence-pair task.

The reference's headline accuracy table is RoBERTa fine-tuned on MRPC —
binary classification over real sentence pairs
(``/root/reference/README.md:10-30``).  This environment has zero network
egress, so real MRPC cannot be fetched; the byte-LM experiment
(lm_parity_real_text.py) covers real data but exercises the causal-LM head.
This experiment closes the remaining gap INSIDE the environment: the same
classification path MRPC uses (sequence-pair encoding, <s>-token pooled
head, cross-entropy over 2 labels) on real English prose — deciding whether
two genuine text segments are consecutive in the corpus or randomly paired
(``fewbit_tpu.train.real_pair_arrays``).  Identical model/init/data/schedule
across configurations; only the backward compression differs.

    python examples/pair_classification_real_text.py --steps 400

Writes a markdown table on stdout; paste into docs/ACCURACY.md.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def run(config_name, gelu_bits, proj_dim_ratio, sketch, steps, data,
        seq=128, batch=32):
    import jax
    import jax.numpy as jnp

    from fewbit_tpu.models import (RobertaConfig,
                                   RobertaForSequenceClassification)
    from fewbit_tpu.train import (TrainConfig, batches_from_arrays,
                                  create_train_state, make_eval_step,
                                  make_train_step)

    train_arrays, val_arrays = data
    cfg = RobertaConfig(vocab_size=259, hidden_size=128, num_layers=4,
                        num_heads=4, intermediate_size=512,
                        max_position_embeddings=seq + 2, num_labels=2,
                        pad_token_id=1,
                        gelu_bits=gelu_bits, proj_dim_ratio=proj_dim_ratio,
                        sketch=sketch or "countsketch")
    model = RobertaForSequenceClassification(cfg)

    stream = batches_from_arrays(train_arrays, batch, seed=7)
    batch0 = {k: jnp.asarray(v) for k, v in next(stream).items()}
    state = create_train_state(
        model, TrainConfig(learning_rate=3e-4, total_steps=steps), batch0)
    step = jax.jit(make_train_step(model), donate_argnums=(0,))
    eval_step = make_eval_step(model)

    n_val = (len(val_arrays["labels"]) // batch) * batch
    eval_batches = [
        {k: jnp.asarray(v[i:i + batch]) for k, v in val_arrays.items()}
        for i in range(0, n_val, batch)]

    key = jax.random.key(0)
    t0 = time.time()
    final_train = float("nan")
    for i in range(steps):
        batch_i = {k: jnp.asarray(v) for k, v in next(stream).items()}
        state, metrics = step(state, batch_i, jax.random.fold_in(key, i))
        final_train = float(metrics["loss"])
    accs = [float(eval_step(state, b)["accuracy"]) for b in eval_batches]
    acc = sum(accs) / len(accs)
    print(f"{config_name:28s} train-loss {final_train:.4f} "
          f"val-accuracy {acc:.4f}  ({time.time()-t0:.0f}s)", flush=True)
    return final_train, acc


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    from fewbit_tpu.train import real_pair_arrays

    data = real_pair_arrays()
    print(f"real-pair dataset: train {len(data[0]['labels'])}, "
          f"val {len(data[1]['labels'])} "
          f"(balance {data[0]['labels'].mean():.2f})", flush=True)

    configs = [
        ("exact", None, None, None),
        ("gelu 3-bit", 3, None, None),
        ("randomized 20% (countsketch)", None, 0.2, "countsketch"),
        ("gelu 3-bit + rand 20%", 3, 0.2, "countsketch"),
    ]
    rows = []
    for name, bits, ratio, sketch in configs:
        rows.append((name,) + run(name, bits, ratio, sketch, args.steps,
                                  data, batch=args.batch))

    print("\n| config | final train loss | val accuracy |")
    print("|---|---|---|")
    for name, loss, acc in rows:
        print(f"| {name} | {loss:.4f} | {acc:.3f} |")


if __name__ == "__main__":
    main()
