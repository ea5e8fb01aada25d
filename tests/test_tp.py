"""Tensor-parallel (dp x tp) tests on the 8-device virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fewbit_tpu.models import RobertaConfig, RobertaForSequenceClassification
from fewbit_tpu.parallel import (dp_tp_train_step, init_dp_tp_state,
                                 make_dp_tp_mesh, shard_batch)
from fewbit_tpu.train import TrainConfig, make_train_step, synthetic_glue


def tp_config(tp_size, **kw):
    base = dict(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                intermediate_size=64, max_position_embeddings=66,
                num_labels=2, hidden_dropout=0.0, attention_dropout=0.0,
                gelu_bits=3)
    base.update(kw)
    return RobertaConfig(tp_axis="tp" if tp_size > 1 else None,
                         tp_size=tp_size, **base)


def batch_of(bs):
    return {k: jnp.asarray(v) for k, v in
            next(synthetic_glue(bs, seq_len=16, vocab_size=128)).items()}


@pytest.mark.parametrize("dp,tp", [(4, 2), (2, 4)])
def test_dp_tp_step_runs(dp, tp):
    mesh = make_dp_tp_mesh(dp, tp)
    cfg = tp_config(tp)
    model = RobertaForSequenceClassification(cfg)
    batch = batch_of(2 * dp)
    state, specs = init_dp_tp_state(
        model, TrainConfig(total_steps=4, learning_rate=1e-4), batch, mesh)
    step = dp_tp_train_step(make_train_step(model, dp_axis="dp"), mesh,
                            specs)
    new_state, metrics = step(state, shard_batch(batch, mesh),
                              jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(jax.device_get(new_state.step)) == 1

    # Sharded kernels: the global (unsharded) view of the intermediate
    # kernel is (L, hidden, inter_local * tp) == (2, 32, 64); each tp shard
    # holds 1/tp of the last dim.
    inter = new_state.params["roberta"]["layers"]["intermediate"]["kernel"]
    assert inter.shape == (2, 32, 64)


def test_tp_matches_single_device():
    """tp=2 training step equals the single-device step on the gathered
    global parameters (deterministic config: dropout 0, exact linear)."""
    dp, tp = 1, 2
    mesh = make_dp_tp_mesh(dp, tp)
    cfg = tp_config(tp)
    model = RobertaForSequenceClassification(cfg)
    batch = batch_of(2)
    tcfg = TrainConfig(total_steps=4, learning_rate=1e-4)
    state, specs = init_dp_tp_state(model, tcfg, batch, mesh)
    # Fetch params before the step donates the state buffers.
    tparams = jax.device_get(state.params)
    step = dp_tp_train_step(make_train_step(model, dp_axis="dp"), mesh,
                            specs)
    _, metrics = step(state, shard_batch(batch, mesh), jax.random.key(0))
    tp_loss = float(metrics["loss"])

    # Rebuild the global model: same layer dims, no tp, params assembled
    # from the tp shards.
    gcfg = tp_config(1)
    gmodel = RobertaForSequenceClassification(gcfg)
    gparams = gmodel.init(
        {"params": jax.random.key(9)}, batch["input_ids"],
        batch["attention_mask"], deterministic=True)["params"]

    def to_global(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        return np.asarray(jax.device_get(leaf))

    # The tp state's params are already global-shaped arrays (jax assembles
    # shards); translate the separate psum biases back into Dense biases.
    tparams = jax.tree.map(np.asarray, tparams)

    def fix_layer(layer):
        layer = dict(layer)
        attn = dict(layer["attention"])
        attn["output"] = {"kernel": attn["output"]["kernel"],
                          "bias": attn.pop("output_bias")}
        layer["attention"] = attn
        layer["ffn_output"] = {"kernel": layer["ffn_output"]["kernel"],
                               "bias": layer.pop("ffn_bias")}
        return layer

    roberta = dict(tparams["roberta"])
    roberta["layers"] = fix_layer(roberta["layers"])
    gp = dict(tparams)
    gp["roberta"] = roberta

    import optax

    logits = gmodel.apply({"params": gp}, batch["input_ids"],
                          batch["attention_mask"], deterministic=True)
    ref_loss = float(optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), batch["labels"]).mean())

    # make_train_step uses deterministic=False, but dropout rates are 0 and
    # gelu/linear are deterministic, so losses must agree.
    np.testing.assert_allclose(tp_loss, ref_loss, rtol=1e-4)
