"""Data sources: tokenized-npz schema, epoch batching, real-text byte LM."""

import numpy as np
import pytest

from fewbit_tpu.train import (batches_from_arrays, byte_lm_arrays,
                              byte_lm_batches, load_tokenized_npz,
                              real_text_corpus)


def _fake_npz(tmp_path, n_train=10, n_val=4, seq=16):
    path = tmp_path / "mrpc.npz"
    rng = np.random.RandomState(0)
    np.savez(
        path,
        train_input_ids=rng.randint(0, 100, (n_train, seq)).astype(np.int32),
        train_attention_mask=np.ones((n_train, seq), np.int32),
        train_labels=rng.randint(0, 2, (n_train,)).astype(np.int32),
        validation_input_ids=rng.randint(0, 100, (n_val, seq)).astype(
            np.int32),
        validation_attention_mask=np.ones((n_val, seq), np.int32),
        validation_labels=rng.randint(0, 2, (n_val,)).astype(np.int32))
    return path


def test_load_tokenized_npz_schema(tmp_path):
    splits = load_tokenized_npz(_fake_npz(tmp_path))
    assert sorted(splits) == ["train", "validation"]
    assert splits["train"]["input_ids"].shape == (10, 16)
    assert splits["validation"]["labels"].shape == (4,)


def test_load_tokenized_npz_rejects_missing_field(tmp_path):
    path = tmp_path / "bad.npz"
    np.savez(path, train_input_ids=np.ones((2, 4), np.int32))
    with pytest.raises(ValueError):
        load_tokenized_npz(path)


def test_batches_from_arrays_covers_epoch(tmp_path):
    splits = load_tokenized_npz(_fake_npz(tmp_path))
    stream = batches_from_arrays(splits["train"], 4, seed=1)
    batches = [next(stream) for _ in range(4)]
    assert all(b["input_ids"].shape == (4, 16) for b in batches)
    # Two epochs of 10 examples at batch 4 drop the remainder: 2+2 batches.
    seen = np.concatenate([b["labels"] for b in batches])
    assert len(seen) == 16


def test_real_text_corpus_is_real_prose():
    text = real_text_corpus()
    assert len(text) > 100_000
    # Genuine English, not binary junk.
    assert b"License" in text or b"LICENSE" in text
    printable = sum(32 <= c < 127 or c in (9, 10, 13) for c in text[:20000])
    assert printable / 20000 > 0.97


def test_byte_lm_arrays_and_batches():
    text = real_text_corpus(max_bytes=64 * 1024)
    train, val = byte_lm_arrays(text, seq_len=32, val_fraction=0.25)
    assert train.shape[1] == 33 and val.shape[1] == 33
    assert len(val) == pytest.approx(0.25 * (len(val) + len(train)), rel=0.05)
    batch = next(byte_lm_batches(train, 8))
    assert batch["input_ids"].shape == (8, 32)
    np.testing.assert_array_equal(batch["labels"][:, :-1],
                                  batch["input_ids"][:, 1:])
    assert batch["labels"].min() >= 0  # bytes, all valid targets


def test_real_pair_arrays_shapes_and_semantics():
    from fewbit_tpu.train import real_pair_arrays, real_text_documents

    docs = real_text_documents()
    assert len(docs) >= 2
    train, val = real_pair_arrays(docs, seq_len=64)
    for split in (train, val):
        n, s = split["input_ids"].shape
        assert s == 64
        assert split["attention_mask"].shape == (n, 64)
        assert split["labels"].shape == (n,)
        assert set(np.unique(split["labels"])) <= {0, 1}
        # RoBERTa conventions: <s> first, tokens in [0, 259).
        assert (split["input_ids"][:, 0] == 0).all()
        assert split["input_ids"].min() >= 0
        assert split["input_ids"].max() < 259
        # padding carries mask 0 and token 1
        pad = split["attention_mask"] == 0
        assert (split["input_ids"][pad] == 1).all()
    # roughly balanced classes in both splits
    assert 0.35 < train["labels"].mean() < 0.65
    assert 0.35 < val["labels"].mean() < 0.65
    # deterministic under the same seed
    train2, _ = real_pair_arrays(docs, seq_len=64)
    np.testing.assert_array_equal(train["input_ids"], train2["input_ids"])


def test_real_doc_arrays():
    from fewbit_tpu.train import real_doc_arrays

    train, val, n_cls = real_doc_arrays(seq_len=64)
    assert n_cls >= 2
    for split in (train, val):
        n, s = split["input_ids"].shape
        assert s == 64
        assert split["labels"].min() >= 0
        assert split["labels"].max() < n_cls
        assert (split["input_ids"][:, 0] == 0).all()
        pad = split["attention_mask"] == 0
        assert (split["input_ids"][pad] == 1).all()
    # every class that appears is a real document index
    assert len(set(train["labels"].tolist())) >= 2


def test_pair_split_has_no_segment_leakage():
    """No encoded text segment may appear in both the train and val pairs
    (the by-range split's whole point).  Compare the segment-1 byte slices
    and segment-2 slices across splits."""
    from fewbit_tpu.train import real_pair_arrays, real_text_documents

    train, val = real_pair_arrays(real_text_documents(), seq_len=64)

    def segments(split):
        segs = set()
        for row, mask in zip(split["input_ids"], split["attention_mask"]):
            toks = row[mask.astype(bool)].tolist()
            # layout: <s> seg1 </s> </s> seg2 </s>
            try:
                first_sep = toks.index(2)
            except ValueError:
                continue
            segs.add(tuple(toks[1:first_sep]))
            tail = toks[first_sep + 2:]
            if tail and tail[-1] == 2:
                tail = tail[:-1]
            segs.add(tuple(tail))
        segs.discard(())
        return segs

    overlap = segments(train) & segments(val)
    # The only admissible overlap is encoded text that occurs in MORE THAN
    # ONE distinct source segment (license boilerplate repeated verbatim,
    # or two different segments colliding on the same truncated byte
    # prefix) — corpus duplication, not split leakage.  A segment whose
    # encoded form is unique in the corpus must stay on one side.
    import re

    half = (64 - 4) // 2
    seg_count = {}
    for doc in real_text_documents():
        for p in re.split(rb"(?<=[.!?:;])\s+|\n\n+", doc):
            p = p.strip()
            if len(p) >= 20:
                key = p[:half]
                seg_count[key] = seg_count.get(key, 0) + 1
    for seg in overlap:
        text = bytes(t - 3 for t in seg if t >= 3)
        assert seg_count.get(text, 0) >= 2, (
            f"corpus-unique segment leaks across the split: {text[:60]!r}")


def test_token_archive_roundtrip_through_train_step(tmp_path):
    """save_token_archive/load_token_archive (the native stream codec's
    storage consumer) must be lossless, smaller than raw int32 storage,
    and feed a real train step identically to the unpacked arrays."""
    import jax

    from fewbit_tpu.train import (TrainConfig, batches_from_arrays,
                                  create_train_state, load_token_archive,
                                  make_train_step, real_doc_arrays,
                                  save_token_archive)

    train, val, n_cls = real_doc_arrays(seq_len=32)
    path = tmp_path / "docs.npz"
    save_token_archive(path, {"train": train, "validation": val})
    loaded = load_token_archive(path)

    for split, ref in (("train", train), ("validation", val)):
        for field, arr in ref.items():
            np.testing.assert_array_equal(loaded[split][field], arr)

    raw_bytes = sum(a.size * 4 for s in (train, val) for a in s.values())
    assert path.stat().st_size < raw_bytes / 2  # 9-bit vocab ≪ int32

    # Signed fields (LM -100 masks) survive too.
    lm = {"labels": np.asarray([[-100, 5, 7], [3, -100, 2]], np.int32)}
    save_token_archive(tmp_path / "lm.npz", {"train": lm})
    np.testing.assert_array_equal(
        load_token_archive(tmp_path / "lm.npz")["train"]["labels"],
        lm["labels"])

    # A lossless-claimed codec must refuse rather than silently wrap:
    # values outside the int32 range the archive reloads as...
    import pytest

    with pytest.raises(ValueError, match="int32"):
        save_token_archive(tmp_path / "bad.npz",
                           {"train": {"h": np.asarray([2 ** 31], np.int64)}})
    with pytest.raises(ValueError, match="int32"):
        save_token_archive(
            tmp_path / "bad.npz",
            {"train": {"h": np.asarray([-1, 2 ** 31 - 1], np.int64)}})
    # ...and names that would collide with the "." key separator.
    with pytest.raises(ValueError, match="split name"):
        save_token_archive(tmp_path / "bad.npz",
                           {"val.small": {"h": np.asarray([1], np.int32)}})
    with pytest.raises(ValueError, match="field name"):
        save_token_archive(tmp_path / "bad.npz",
                           {"train": {"h.x": np.asarray([1], np.int32)}})
    # The full int32 range itself is fine.
    edge = {"h": np.asarray([-(2 ** 31) + 1, 0], np.int64)}
    save_token_archive(tmp_path / "edge.npz", {"train": edge})
    np.testing.assert_array_equal(
        load_token_archive(tmp_path / "edge.npz")["train"]["h"],
        edge["h"])

    # Identical first train step from packed vs unpacked source.
    from fewbit_tpu.models import (RobertaConfig,
                                   RobertaForSequenceClassification)

    cfg = RobertaConfig(vocab_size=259, hidden_size=32, num_layers=1,
                        num_heads=2, intermediate_size=64,
                        max_position_embeddings=34, num_labels=n_cls,
                        hidden_dropout=0.0, attention_dropout=0.0,
                        gelu_bits=3, proj_dim_ratio=0.5)
    model = RobertaForSequenceClassification(cfg)
    losses = []
    for source in (train, loaded["train"]):
        batch = next(batches_from_arrays(source, 8))
        state = create_train_state(
            model, TrainConfig(total_steps=2, learning_rate=1e-4), batch)
        step = jax.jit(make_train_step(model))
        _, metrics = step(state, batch, jax.random.key(0))
        losses.append(float(metrics["loss"]))
    assert losses[0] == losses[1]


def test_pair_split_short_documents():
    """Cut policy: >=4-segment docs feed both splits; a 3-segment doc keeps
    its train pair; an all-short corpus raises instead of returning a
    malformed empty array."""
    from fewbit_tpu.train import real_pair_arrays

    # Two docs of 5 segments each: both splits non-empty.
    seg = [b"Alpha bravo charlie delta echo foxtrot golf.",
           b"Hotel india juliet kilo lima mike november.",
           b"Oscar papa quebec romeo sierra tango uniform.",
           b"Victor whiskey xray yankee zulu alpha bravo.",
           b"Charlie delta echo foxtrot golf hotel india."]
    docs = [b" ".join(seg), b" ".join(reversed(seg))]
    train, val = real_pair_arrays(docs, seq_len=64, min_segment=20)
    assert len(train["labels"]) > 0 and len(val["labels"]) > 0
    assert train["input_ids"].ndim == 2 and val["input_ids"].ndim == 2

    # 3-segment docs: train pairs exist (regression: the r5 len-2 cap must
    # not starve the train side), val raises (no doc can give a val pair).
    short = [b" ".join(seg[:3]), b" ".join(seg[2:])]
    with pytest.raises(ValueError, match="val split came out empty"):
        real_pair_arrays(short, seq_len=64, min_segment=20)
