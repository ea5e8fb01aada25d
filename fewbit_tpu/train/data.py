"""Batch sources for training and benchmarking.

This build environment has zero network egress, so GLUE cannot be fetched;
:func:`synthetic_glue` generates MRPC-shaped batches whose labels are a
deterministic (learnable) function of the tokens, which is what the
convergence-parity tests train on.  :func:`load_glue` uses a local/cached HF
dataset when one is available.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

__all__ = ("synthetic_glue", "load_glue", "load_tokenized_npz",
           "batches_from_arrays", "real_text_corpus", "byte_lm_arrays",
           "byte_lm_batches")


def synthetic_glue(batch_size: int,
                   seq_len: int = 128,
                   vocab_size: int = 50265,
                   pad_token_id: int = 1,
                   num_labels: int = 2,
                   seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """Endless MRPC-shaped batches with learnable labels.

    The label is derived from a parity of a few token buckets, so models can
    actually fit the data and exact-vs-fewbit convergence can be compared.
    """
    rng = np.random.RandomState(seed)
    while True:
        lengths = rng.randint(seq_len // 2, seq_len + 1, size=batch_size)
        ids = rng.randint(10, vocab_size, size=(batch_size, seq_len))
        mask = np.zeros((batch_size, seq_len), np.int32)
        for i, n in enumerate(lengths):
            mask[i, :n] = 1
            ids[i, n:] = pad_token_id
        ids[:, 0] = 0  # <s>
        signal = (ids[:, 1:8].sum(axis=1) // 7) % num_labels
        yield {"input_ids": ids.astype(np.int32),
               "attention_mask": mask,
               "labels": signal.astype(np.int32)}


def synthetic_lm(batch_size: int,
                 seq_len: int = 128,
                 vocab_size: int = 50257,
                 seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """Endless causal-LM batches with learnable structure (each token is a
    noisy function of its predecessor), labels pre-shifted for
    :func:`fewbit_tpu.train.causal_lm_loss` (-100 = ignored)."""
    rng = np.random.RandomState(seed)
    while True:
        ids = np.empty((batch_size, seq_len), np.int64)
        ids[:, 0] = rng.randint(0, vocab_size, size=batch_size)
        for t in range(1, seq_len):
            follow = (ids[:, t - 1] * 31 + 7) % vocab_size
            noise = rng.randint(0, vocab_size, size=batch_size)
            take = rng.rand(batch_size) < 0.75
            ids[:, t] = np.where(take, follow, noise)
        labels = np.full_like(ids, -100)
        labels[:, :-1] = ids[:, 1:]
        yield {"input_ids": ids.astype(np.int32),
               "attention_mask": np.ones_like(ids, np.int32),
               "labels": labels.astype(np.int32)}


def load_glue(task: str = "mrpc", split: str = "train",
              tokenizer_name: str = "roberta-base",
              max_length: int = 128,
              cache_dir: Optional[str] = None):
    """Tokenized GLUE split via HF datasets/transformers (requires a local
    cache — this environment cannot download)."""
    import datasets
    from transformers import AutoTokenizer

    ds = datasets.load_dataset("glue", task, split=split,
                               cache_dir=cache_dir)
    tok = AutoTokenizer.from_pretrained(tokenizer_name)
    keys = {"mrpc": ("sentence1", "sentence2")}[task]

    def encode(ex):
        return tok(ex[keys[0]], ex[keys[1]], truncation=True,
                   padding="max_length", max_length=max_length)

    return ds.map(encode, batched=True)
