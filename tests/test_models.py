"""Model + training-loop tests (tiny configs, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fewbit_tpu.models import (MLP, RobertaConfig,
                               RobertaForSequenceClassification)
from fewbit_tpu.train import (TrainConfig, create_train_state, make_eval_step,
                              make_schedule, make_train_step,
                              restore_checkpoint, save_checkpoint,
                              synthetic_glue)

TINY = RobertaConfig(vocab_size=128, hidden_size=32, num_layers=2,
                     num_heads=2, intermediate_size=64,
                     max_position_embeddings=66, num_labels=2)


def tiny_batch(bs=4, seq=16):
    return next(synthetic_glue(bs, seq_len=seq, vocab_size=TINY.vocab_size))


class TestRoberta:

    @pytest.mark.parametrize("cfg", [
        TINY,
        RobertaConfig(**{**TINY.__dict__, "gelu_bits": 3}),
        RobertaConfig(**{**TINY.__dict__, "gelu_bits": 3,
                         "proj_dim_ratio": 0.25}),
    ], ids=["exact", "gelu3", "gelu3+grp"])
    def test_forward_and_grad(self, cfg):
        model = RobertaForSequenceClassification(cfg)
        batch = tiny_batch()
        keys = {"params": jax.random.key(0), "dropout": jax.random.key(1),
                "sketch": jax.random.key(2)}
        params = model.init(keys, batch["input_ids"],
                            batch["attention_mask"], deterministic=True)
        logits = model.apply(params, batch["input_ids"],
                             batch["attention_mask"], deterministic=True,
                             rngs={"sketch": jax.random.key(9)})
        assert logits.shape == (4, 2)
        assert bool(jnp.isfinite(logits).all())

        def loss(p):
            out = model.apply(p, batch["input_ids"],
                              batch["attention_mask"], deterministic=False,
                              rngs={"dropout": jax.random.key(3),
                                    "sketch": jax.random.key(4)})
            return out.sum()

        g = jax.grad(loss)(params)
        norm = jnp.sqrt(sum(jnp.sum(x * x)
                            for x in jax.tree_util.tree_leaves(g)))
        assert bool(jnp.isfinite(norm)) and float(norm) > 0

    def test_fewbit_forward_matches_exact(self):
        """gelu_bits only changes the backward; forward must be identical."""
        model_a = RobertaForSequenceClassification(TINY)
        model_b = RobertaForSequenceClassification(
            RobertaConfig(**{**TINY.__dict__, "gelu_bits": 3}))
        batch = tiny_batch()
        params = model_a.init(jax.random.key(0), batch["input_ids"],
                              batch["attention_mask"])
        la = model_a.apply(params, batch["input_ids"],
                           batch["attention_mask"])
        lb = model_b.apply(params, batch["input_ids"],
                           batch["attention_mask"])
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)

    def test_flash_attention_flag_falls_back_off_tpu(self):
        # On CPU the flag must silently use the standard path with
        # identical numerics.
        cfg = RobertaConfig(**{**TINY.__dict__, "flash_attention": True,
                               "attention_dropout": 0.0})
        model = RobertaForSequenceClassification(cfg)
        ref = RobertaForSequenceClassification(TINY)
        batch = tiny_batch()
        params = ref.init(jax.random.key(0), batch["input_ids"],
                          batch["attention_mask"])
        a = model.apply(params, batch["input_ids"], batch["attention_mask"])
        b = ref.apply(params, batch["input_ids"], batch["attention_mask"])
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bf16_activations(self):
        cfg = RobertaConfig(**{**TINY.__dict__, "gelu_bits": 3,
                               "proj_dim_ratio": 0.25,
                               "dtype": jnp.bfloat16})
        model = RobertaForSequenceClassification(cfg)
        batch = tiny_batch()
        params = model.init(
            {"params": jax.random.key(0), "sketch": jax.random.key(1)},
            batch["input_ids"], batch["attention_mask"])
        logits = model.apply(params, batch["input_ids"],
                             batch["attention_mask"],
                             rngs={"sketch": jax.random.key(9)})
        assert logits.dtype == jnp.bfloat16
        g = jax.grad(lambda p: model.apply(
            p, batch["input_ids"], batch["attention_mask"],
            deterministic=False,
            rngs={"dropout": jax.random.key(2),
                  "sketch": jax.random.key(3)}).astype(jnp.float32).sum())(
            params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)

    def test_position_ids_skip_padding(self):
        cfg = TINY
        model = RobertaForSequenceClassification(cfg)
        ids = np.full((1, 8), cfg.pad_token_id, np.int32)
        ids[0, :3] = [0, 5, 6]
        mask = (ids != cfg.pad_token_id).astype(np.int32)
        params = model.init(jax.random.key(0), jnp.asarray(ids),
                            jnp.asarray(mask))
        out = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
        assert bool(jnp.isfinite(out).all())


class TestMLP:

    def test_training_convergence_parity(self):
        """North-star config 1 extended: exact vs 3-bit GELU training."""
        x = jnp.asarray(np.random.RandomState(0).randn(256, 16), jnp.float32)
        y = (np.asarray(x)[:, 0] > 0).astype(np.int32)
        y = jnp.asarray(y)

        def train(gelu_bits, steps=150):
            model = MLP(features=(32, 2), gelu_bits=gelu_bits)
            params = model.init(jax.random.key(0), x)

            import optax
            tx = optax.adam(5e-3)
            opt = tx.init(params)

            @jax.jit
            def step(params, opt):
                def loss(p):
                    logits = model.apply(p, x)
                    return optax.softmax_cross_entropy_with_integer_labels(
                        logits, y).mean()
                l, g = jax.value_and_grad(loss)(params)
                updates, opt = tx.update(g, opt, params)
                return optax.apply_updates(params, updates), opt, l

            for _ in range(steps):
                params, opt, l = step(params, opt)
            return float(l)

        exact = train(None)
        fewbit = train(3)
        assert fewbit < exact + 0.05  # few-bit grads converge comparably


class TestTrainLoop:

    def test_schedule_shape(self):
        cfg = TrainConfig(learning_rate=1e-3, total_steps=100,
                          warmup_ratio=0.1)
        sched = make_schedule(cfg)
        assert float(sched(0)) < 1e-4
        assert abs(float(sched(10)) - 1e-3) < 1e-9
        assert float(sched(100)) < 1e-5

    def test_train_and_eval_step(self):
        model = RobertaForSequenceClassification(
            RobertaConfig(**{**TINY.__dict__, "gelu_bits": 3,
                             "proj_dim_ratio": 0.5}))
        batch = tiny_batch()
        cfg = TrainConfig(total_steps=10, learning_rate=1e-4)
        state = create_train_state(model, cfg, batch)
        step = jax.jit(make_train_step(model))
        new_state, metrics = step(state, batch, jax.random.key(0))
        assert float(metrics["loss"]) > 0
        assert new_state.step == 1
        ev = make_eval_step(model)(new_state, batch)
        assert 0.0 <= float(ev["accuracy"]) <= 1.0

    def test_checkpoint_roundtrip(self, tmp_path):
        model = RobertaForSequenceClassification(TINY)
        batch = tiny_batch()
        cfg = TrainConfig(total_steps=10)
        state = create_train_state(model, cfg, batch)
        step = jax.jit(make_train_step(model))
        state, _ = step(state, batch, jax.random.key(0))
        save_checkpoint(tmp_path / "ckpt", state)

        fresh = create_train_state(model, cfg, batch, seed=123)
        restored = restore_checkpoint(tmp_path / "ckpt", fresh)
        assert int(restored.step) == 1
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flash_attention_requires_zero_attention_dropout():
    with pytest.raises(ValueError, match="attention dropout"):
        RobertaConfig(**{**TINY.__dict__, "flash_attention": True})
    cfg = RobertaConfig(**{**TINY.__dict__, "flash_attention": True,
                           "attention_dropout": 0.0})
    assert cfg.flash_attention


def test_flash_block_size_resolution():
    """resolve_block_sizes: tuned table at measured lengths, the
    generalised auto_blocks rule elsewhere (never the measured-2x-slower
    kernel defaults), explicit override wins, clamped to the sequence
    length."""
    from fewbit_tpu.models.flash import (TUNED_BLOCKS, auto_blocks,
                                         resolve_block_sizes)

    bs = resolve_block_sizes(1024)
    assert bs is not None
    assert (bs.block_q, bs.block_k) == TUNED_BLOCKS[1024]
    assert bs.block_k_major == bs.block_k
    # untabulated lengths use auto_blocks: largest multiple-of-128 block
    # <= 1024 that divides seq, so flash never silently falls back to the
    # untuned 128-wide defaults at a length the table does not list.
    assert auto_blocks(1536) == (768, 768)
    bs3 = resolve_block_sizes(1536)
    assert (bs3.block_q, bs3.block_k) == (768, 768)
    assert auto_blocks(4096) == (1024, 1024)
    assert auto_blocks(128) == (128, 128)
    # no lane-aligned divisor -> None (callers keep the standard path)
    assert auto_blocks(1100) is None
    assert auto_blocks(192) is None
    # explicit override beats the table and clamps to seq
    bs2 = resolve_block_sizes(256, (512, 4096))
    assert bs2.block_q == 256 and bs2.block_k == 256


def test_flash_auto_resolution():
    """flash_attention='auto' enables the kernel exactly where measured to
    win (TPU, long seq, no attention dropout) and never errors on
    dropout>0 configs (it keeps the standard path instead)."""
    from fewbit_tpu.models import GPTConfig, RobertaConfig
    from fewbit_tpu.models.flash import FLASH_AUTO_MIN_SEQ, use_flash

    assert use_flash(True, 128, 0.0, backend="tpu")
    assert not use_flash(True, 4096, 0.0, backend="cpu")
    assert not use_flash(False, 4096, 0.0, backend="tpu")
    assert use_flash("auto", FLASH_AUTO_MIN_SEQ, 0.0, backend="tpu")
    assert not use_flash("auto", FLASH_AUTO_MIN_SEQ - 1, 0.0, backend="tpu")
    assert not use_flash("auto", FLASH_AUTO_MIN_SEQ, 0.1, backend="tpu")
    assert not use_flash("auto", FLASH_AUTO_MIN_SEQ, 0.0, backend="cpu")
    # long but not lane-aligned: no valid block partition exists, so auto
    # keeps the standard path rather than crash (or crawl) in the kernel
    assert not use_flash("auto", 1100, 0.0, backend="tpu")
    # deterministic (eval) traces apply no dropout, so auto engages even
    # with a training dropout configured.
    assert use_flash("auto", FLASH_AUTO_MIN_SEQ, 0.1, backend="tpu",
                     deterministic=True)
    # invalid values fail EVERYWHERE, including off-TPU (a typo must not
    # silently disable flash).
    with pytest.raises(ValueError):
        use_flash("always", 128, 0.0, backend="tpu")
    with pytest.raises(ValueError):
        use_flash("Auto", 4096, 0.0, backend="cpu")

    # auto + dropout is a valid config (standard path in training), True +
    # dropout is an error (it would silently drop the dropout), and typos
    # fail at construction.
    for cls in (RobertaConfig, GPTConfig):
        cls(flash_attention="auto")  # default dropout > 0: fine
        with pytest.raises(ValueError):
            cls(flash_attention=True)
        with pytest.raises(ValueError):
            cls(flash_attention="Auto", attention_dropout=0.0)

    # the auto model still runs (standard path on CPU) end-to-end
    import jax
    import jax.numpy as jnp

    cfg = RobertaConfig(vocab_size=64, hidden_size=32, num_layers=1,
                        num_heads=2, intermediate_size=64,
                        max_position_embeddings=18,
                        flash_attention="auto", hidden_dropout=0.0,
                        attention_dropout=0.0)
    from fewbit_tpu.models import RobertaForSequenceClassification

    model = RobertaForSequenceClassification(cfg)
    ids = jnp.ones((2, 16), jnp.int32)
    params = model.init({"params": jax.random.key(0),
                         "sketch": jax.random.key(0)}, ids)["params"]
    logits = model.apply({"params": params}, ids,
                         rngs={"sketch": jax.random.key(1)})
    assert logits.shape == (2, 2)
