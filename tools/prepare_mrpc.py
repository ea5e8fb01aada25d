"""Tokenize GLUE MRPC into the one-file npz schema of
``fewbit_tpu.train.load_tokenized_npz``.

**Requires network access** (HF datasets + roberta-base tokenizer) — run it
on a connected machine and copy the output next to the repo; the build/CI
environment here has zero egress, which is why the tokenized file is an
external input rather than generated in-tree.

    python tools/prepare_mrpc.py --out data/mrpc_tokenized.npz \
        [--max-length 128] [--subset 1024]

Then:

    python examples/finetune_glue.py --glue data/mrpc_tokenized.npz \
        --num-bits 3 --proj-dim-ratio 0.2

Reference experiment being reproduced: RoBERTa-base MRPC fine-tune
(``/root/reference/notebooks/few-bit-backward/exp-fine-tuning-glue.py:272-303``,
headline accuracy table ``/root/reference/README.md:10-30``).
"""

import argparse
from pathlib import Path

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", type=Path,
                        default=Path("data/mrpc_tokenized.npz"))
    parser.add_argument("--max-length", type=int, default=128)
    parser.add_argument("--subset", type=int, default=None,
                        help="keep only the first N training examples "
                             "(smaller checked-in artifact)")
    args = parser.parse_args()

    import datasets
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained("roberta-base")
    payload = {}
    for split in ("train", "validation"):
        ds = datasets.load_dataset("glue", "mrpc", split=split)
        enc = tok([e["sentence1"] for e in ds],
                  [e["sentence2"] for e in ds],
                  truncation=True, padding="max_length",
                  max_length=args.max_length)
        ids = np.asarray(enc["input_ids"], np.int32)
        mask = np.asarray(enc["attention_mask"], np.int32)
        labels = np.asarray([e["label"] for e in ds], np.int32)
        if split == "train" and args.subset:
            ids, mask, labels = (ids[:args.subset], mask[:args.subset],
                                 labels[:args.subset])
        payload[f"{split}_input_ids"] = ids
        payload[f"{split}_attention_mask"] = mask
        payload[f"{split}_labels"] = labels
        print(f"{split}: {len(labels)} examples, seq {args.max_length}")

    args.out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(args.out, **payload)
    print(f"wrote {args.out} ({args.out.stat().st_size / 2**20:.1f} MiB)")


if __name__ == "__main__":
    main()
