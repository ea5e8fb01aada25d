"""Real-prose CLASSIFICATION parity: exact vs few-bit/sketched fine-tuning.

The reference's headline accuracy table is RoBERTa fine-tuned on MRPC
(``/root/reference/README.md:10-30``) — real-text classification through a
pooled head.  This environment has zero network egress (no MRPC, no
pretrained checkpoints), so the in-environment classification parity runs
on the real English prose that ships with the OS image (the
common-licenses corpus, the same source as the byte-LM parity experiment):

* ``--task doc`` (default): single-segment DOCUMENT classification — which
  license text did this genuine English segment come from (14 classes)?
  Byte-level topic/style classification that a small from-scratch model
  demonstrably learns, exercising exactly the path MRPC exercises (pooled
  <s> head + cross-entropy fine-tune), with the compression applied where
  the reference applies it (during training).
* ``--task pair``: the MRPC-shaped segment-pair variant
  (``fewbit_tpu.train.real_pair_arrays``).  Recorded finding: at this
  model scale WITHOUT a pretrained encoder the relational pair task sits
  at chance for every configuration (from-scratch post-LN logit collapse;
  a byte-histogram cosine baseline gets ~58%), so it is not a useful
  parity instrument here — kept for completeness and for environments
  where a pretrained encoder is available.

Identical model/init/data/schedule across configurations; only the
backward-pass compression differs, so validation-accuracy deltas isolate
the few-bit/sketched gradients.

    python examples/classification_parity_real_text.py --steps 1200

Writes a markdown table on stdout; paste into docs/ACCURACY.md.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

SEQ = 128
VOCAB = 259  # <s>=0 pad=1 </s>=2, byte b -> b + 3


def model_config(num_labels, gelu_bits=None, proj_dim_ratio=None,
                 sketch="countsketch"):
    from fewbit_tpu.models import RobertaConfig

    # fused_ffn=False keeps one parameter tree across ALL configurations
    # (Dense names `intermediate`/`ffn_output`); the elementwise few-bit
    # path is numerically the same algorithm as the fused kernels.
    return RobertaConfig(vocab_size=VOCAB, hidden_size=128, num_layers=4,
                         num_heads=4, intermediate_size=512,
                         max_position_embeddings=SEQ + 2,
                         num_labels=num_labels, pad_token_id=1,
                         gelu_bits=gelu_bits,
                         proj_dim_ratio=proj_dim_ratio, sketch=sketch,
                         fused_ffn=False)


def train_one(config_name, data, num_labels, gelu_bits, proj_dim_ratio,
              sketch, steps, batch=32, lr=3e-4):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fewbit_tpu.models import RobertaForSequenceClassification
    from fewbit_tpu.train import (TrainConfig, batches_from_arrays,
                                  create_train_state, make_eval_step,
                                  make_train_step)

    train_arrays, val_arrays = data
    cfg = model_config(num_labels, gelu_bits, proj_dim_ratio,
                       sketch or "countsketch")
    model = RobertaForSequenceClassification(cfg)
    stream = batches_from_arrays(train_arrays, batch, seed=7)
    batch0 = {k: jnp.asarray(v) for k, v in next(stream).items()}
    state = create_train_state(
        model, TrainConfig(learning_rate=lr, total_steps=steps), batch0)
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
    acc = float(np.mean(accs))
    print(f"{config_name:32s} train-loss {final_train:.4f} "
          f"val-accuracy {acc:.4f}  ({time.time()-t0:.0f}s)", flush=True)
    return final_train, acc


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--task", choices=("doc", "pair"), default="doc")
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    from fewbit_tpu.train import real_doc_arrays, real_pair_arrays

    if args.task == "doc":
        train_arrays, val_arrays, n_cls = real_doc_arrays()
    else:
        train_arrays, val_arrays = real_pair_arrays(min_segment=64)
        n_cls = 2
    data = (train_arrays, val_arrays)
    print(f"{args.task} dataset: train {len(train_arrays['labels'])}, "
          f"val {len(val_arrays['labels'])}, {n_cls} classes "
          f"(chance {1.0 / n_cls:.3f})", flush=True)

    configs = [
        ("exact", None, None, None),
        ("gelu 3-bit", 3, None, None),
        ("randomized 20% (countsketch)", None, 0.2, "countsketch"),
        ("gelu 3-bit + rand 20%", 3, 0.2, "countsketch"),
    ]
    rows = []
    for name, bits, ratio, sketch in configs:
        rows.append((name,) + train_one(name, data, n_cls, bits, ratio,
                                        sketch, args.steps,
                                        batch=args.batch))

    print(f"\n| config | final train loss | val accuracy "
          f"(chance {1.0 / n_cls:.3f}) |")
    print("|---|---|---|")
    for name, loss, acc in rows:
        print(f"| {name} | {loss:.4f} | {acc:.3f} |")


if __name__ == "__main__":
    main()
