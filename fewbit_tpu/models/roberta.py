"""RoBERTa-base in flax with swappable few-bit components — the flagship
model for the north-star benchmark (RoBERTa-base MRPC fine-tune with 3-bit
GELU + RandomizedLinear; reference drives HF RoBERTa through monkey-patching,
``benchmark/bench-roberta.py:118-149`` / ``bench-linear.py:122-152``; here
the compression choices are first-class config).

Architecture follows the published RoBERTa-base (12 layers, hidden 768,
heads 12, FFN 3072, learned positions with the pad-offset quirk).  Two
config switches inject the memory-efficient training path:

* ``gelu_bits`` — FFN activations run through the few-bit engine (packed
  ``bits``/8-byte residuals instead of fp32 saved inputs);
* ``proj_dim_ratio`` — every Dense becomes a RandomizedDense whose VJP
  saves a sketch of its input.

``dtype`` controls activation precision (bf16 recommended on TPU; parameters
stay float32).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fewbit_tpu import functional as F
from fewbit_tpu.modules.linear import RandomizedDense

__all__ = ("RobertaConfig", "RobertaModel", "RobertaForSequenceClassification")


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    num_labels: int = 2
    dtype: Any = jnp.float32
    # Few-bit switches.
    gelu_bits: Optional[int] = None        # None = exact gelu backward
    proj_dim_ratio: Optional[float] = None  # None = exact Dense backward
    sketch: str = "gaussian"
    # Compile the encoder as one scanned layer with stacked parameters
    # (traces/compiles the layer once instead of num_layers times — the
    # idiomatic TPU structure for deep stacks).  Set False for per-layer
    # parameter naming.
    scan_layers: bool = True
    # Tensor parallelism (Megatron-style): when ``tp_axis`` names a mesh axis
    # the model expects to run inside shard_map with attention heads and the
    # FFN inner dimension split ``tp_size`` ways — column-parallel up
    # projections, row-parallel down projections with a psum.  Few-bit GELU
    # residuals then shard over the *feature* dimension on top of the batch
    # sharding.  ``num_heads`` / ``intermediate_size`` stay the GLOBAL sizes.
    tp_axis: Optional[str] = None
    tp_size: int = 1
    # FFN structure with gelu_bits set: True fuses the up projection +
    # activation + quantise + pack into one Pallas megakernel (the
    # pre-activation never reaches HBM); False keeps the XLA matmul and runs
    # only the activation+pack as a Pallas elementwise kernel.  The residual
    # memory is identical; which is faster depends on shape (the XLA MXU
    # matmul is hard to beat, the megakernel saves one HBM round trip).
    fused_ffn: bool = True
    # Pallas TPU flash attention: attention probabilities are never
    # materialised in HBM (another large activation-memory consumer the
    # reference never addresses — it has no attention code at all).  TPU
    # only; other backends silently use the standard path.  The flash kernel
    # has no dropout inside, so flash_attention=True requires
    # attention_dropout == 0 (enforced below — a silent train-time behaviour
    # change would otherwise hide in the kernel choice).  "auto" enables it
    # exactly where the measurements say it wins both axes: TPU, seq >=
    # models.flash.FLASH_AUTO_MIN_SEQ, attention_dropout == 0.
    flash_attention: Any = False  # False | True | "auto"
    # Explicit (block_q, block_kv) for the flash kernel; None consults the
    # per-seq tuned table in models/flash.py (kernel defaults otherwise).
    flash_blocks: Optional[Tuple[int, int]] = None

    def __post_init__(self):
        from fewbit_tpu.models.flash import validate_flash_setting

        validate_flash_setting(self.flash_attention)
        if self.flash_attention is True and self.attention_dropout > 0:
            raise ValueError(
                "flash_attention=True cannot apply attention dropout (the "
                "flash kernel never materialises attention probabilities); "
                "set attention_dropout=0.0 explicitly to opt in, or use "
                "flash_attention='auto' to keep the standard path when "
                "dropout is on")

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _dense(cfg: RobertaConfig, features: int, name: str) -> nn.Module:
    if cfg.proj_dim_ratio:
        return RandomizedDense(features=features, dtype=cfg.dtype,
                               proj_dim_ratio=cfg.proj_dim_ratio,
                               matmul=cfg.sketch, name=name)
    return nn.Dense(features=features, dtype=cfg.dtype, name=name)


def _dense_nobias(cfg: RobertaConfig, features: int, name: str) -> nn.Module:
    if cfg.proj_dim_ratio:
        return RandomizedDense(features=features, dtype=cfg.dtype,
                               use_bias=False,
                               proj_dim_ratio=cfg.proj_dim_ratio,
                               matmul=cfg.sketch, name=name)
    return nn.Dense(features=features, dtype=cfg.dtype, use_bias=False,
                    name=name)


def _activation(cfg: RobertaConfig, x: jax.Array) -> jax.Array:
    if cfg.gelu_bits:
        return F.gelu(x, bits=cfg.gelu_bits)
    return jax.nn.gelu(x, approximate=False)


def _tp_psum(x: jax.Array, axis: str) -> jax.Array:
    """psum over the tp axis; identity when tracing outside shard_map (used
    by abstract template construction — shapes are unaffected)."""
    try:
        return jax.lax.psum(x, axis)
    except NameError:
        return x


class RobertaEmbeddings(nn.Module):
    cfg: RobertaConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, deterministic: bool):
        cfg = self.cfg
        # RoBERTa position quirk: positions count from pad_token_id + 1 and
        # padding tokens keep position pad_token_id.
        mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
        position_ids = jnp.cumsum(mask, axis=-1) * mask + cfg.pad_token_id

        words = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                         dtype=cfg.dtype, name="word_embeddings")(input_ids)
        positions = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                             dtype=cfg.dtype,
                             name="position_embeddings")(position_ids)
        types = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                         dtype=cfg.dtype,
                         name="token_type_embeddings")(token_type_ids)
        x = words + positions + types
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="layer_norm")(x)
        return nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)


class RobertaSelfAttention(nn.Module):
    cfg: RobertaConfig

    @nn.compact
    def __call__(self, x, attention_mask, deterministic: bool):
        cfg = self.cfg
        b, s, h = x.shape
        heads = cfg.num_heads // cfg.tp_size  # local heads under TP
        width = heads * cfg.head_dim
        q = _dense(cfg, width, "query")(x)
        k = _dense(cfg, width, "key")(x)
        v = _dense(cfg, width, "value")(x)

        def split(t):
            return t.reshape(b, s, heads, cfg.head_dim)

        q, k, v = split(q), split(k), split(v)
        scale = cfg.head_dim ** -0.5

        from fewbit_tpu.models.flash import resolve_block_sizes, use_flash

        if use_flash(cfg.flash_attention, s, cfg.attention_dropout,
                     deterministic=deterministic):
            from jax.experimental.pallas.ops.tpu import flash_attention as fa

            seg = None
            if attention_mask is not None:
                ids = attention_mask.astype(jnp.int32)
                seg = fa.SegmentIds(q=ids, kv=ids)
            ctx = fa.flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), segment_ids=seg, causal=False,
                sm_scale=scale,
                block_sizes=resolve_block_sizes(s, cfg.flash_blocks))
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, width)
        else:
            ctx = self._standard_attention(cfg, q, k, v, scale,
                                           attention_mask, deterministic,
                                           b, s, width)
        if cfg.tp_axis is None:
            out = _dense(cfg, h, "output")(ctx)
        else:
            # Row-parallel: partial products summed over the tp axis, bias
            # added exactly once after the reduction.
            out = _dense_nobias(cfg, h, "output")(ctx)
            out = _tp_psum(out, cfg.tp_axis)
            out = out + self.param("output_bias", nn.initializers.zeros,
                                   (h,), cfg.dtype)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        return out

    @nn.nowrap
    def _standard_attention(self, cfg, q, k, v, scale, attention_mask,
                            deterministic, b, s, width):
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        if attention_mask is not None:
            bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                             jnp.finfo(jnp.float32).min).astype(logits.dtype)
            logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1)
        probs = nn.Dropout(cfg.attention_dropout)(
            probs, deterministic=deterministic)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, width)


class RobertaLayer(nn.Module):
    cfg: RobertaConfig

    @nn.compact
    def __call__(self, x, attention_mask, deterministic: bool):
        cfg = self.cfg
        attn = RobertaSelfAttention(cfg, name="attention")(
            x, attention_mask, deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="attention_norm")(x + attn)

        # Column-parallel up projection (local slice of the FFN inner dim
        # under TP), few-bit activation on the local shard — the bitpacked
        # residual inherits the tp feature sharding — then row-parallel down
        # projection with a single psum.  With gelu_bits set, the up
        # projection + activation + quantise + pack run as ONE Pallas kernel
        # (the fp32 pre-activation never reaches HBM).
        inner_features = cfg.intermediate_size // cfg.tp_size
        if (cfg.gelu_bits and cfg.fused_ffn and cfg.proj_dim_ratio
                and cfg.sketch == "countsketch"):
            # Whole-block fusion: up + gelu + quantise + pack + sketch(y) in
            # one kernel, matmul + LUT-dequant + sketch(dz) + db in one
            # backward kernel — no (N, inner) tensor survives the forward.
            from fewbit_tpu.modules.ffn import FewBitFFN

            out = FewBitFFN(
                inner_features=inner_features,
                out_features=cfg.hidden_size, activation="gelu",
                bits=cfg.gelu_bits, dtype=cfg.dtype,
                proj_dim_ratio=cfg.proj_dim_ratio,
                use_down_bias=cfg.tp_axis is None,
                name="ffn")(x)
            if cfg.tp_axis is not None:
                out = _tp_psum(out, cfg.tp_axis)
                out = out + self.param("ffn_bias", nn.initializers.zeros,
                                       (cfg.hidden_size,), cfg.dtype)
            out = nn.Dropout(cfg.hidden_dropout)(
                out, deterministic=deterministic)
            return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                                name="output_norm")(x + out)
        if cfg.gelu_bits and cfg.fused_ffn:
            from fewbit_tpu.modules.fused import FusedDenseActivation

            inner = FusedDenseActivation(
                features=inner_features, activation="gelu",
                bits=cfg.gelu_bits, dtype=cfg.dtype,
                proj_dim_ratio=cfg.proj_dim_ratio, matmul=cfg.sketch,
                name="intermediate")(x)
        else:
            inner = _dense(cfg, inner_features, "intermediate")(x)
            inner = _activation(cfg, inner)
        if cfg.tp_axis is None:
            out = _dense(cfg, cfg.hidden_size, "ffn_output")(inner)
        else:
            out = _dense_nobias(cfg, cfg.hidden_size, "ffn_output")(inner)
            out = _tp_psum(out, cfg.tp_axis)
            out = out + self.param("ffn_bias", nn.initializers.zeros,
                                   (cfg.hidden_size,), cfg.dtype)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                            name="output_norm")(x + out)


class _ScanRobertaLayer(RobertaLayer):
    """RobertaLayer with a scan-compatible (carry, ...) -> (carry, None)
    signature."""

    @nn.compact
    def __call__(self, x, attention_mask, deterministic: bool):
        y = super().__call__(x, attention_mask, deterministic)
        return y, None


class RobertaModel(nn.Module):
    cfg: RobertaConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic: bool = True):
        cfg = self.cfg
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = RobertaEmbeddings(cfg, name="embeddings")(
            input_ids, token_type_ids, deterministic)
        if cfg.scan_layers:
            scanned = nn.scan(
                _ScanRobertaLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True, "sketch": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=cfg.num_layers,
                metadata_params={nn.PARTITION_NAME: None},
            )
            x, _ = scanned(cfg, name="layers")(x, attention_mask,
                                               deterministic)
        else:
            for i in range(cfg.num_layers):
                x = RobertaLayer(cfg, name=f"layer_{i}")(
                    x, attention_mask, deterministic)
        return x


class RobertaForSequenceClassification(nn.Module):
    cfg: RobertaConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic: bool = True):
        cfg = self.cfg
        hidden = RobertaModel(cfg, name="roberta")(
            input_ids, attention_mask, token_type_ids, deterministic)
        # RoBERTa classification head on the <s> token.
        x = hidden[:, 0, :]
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)
        x = _dense(cfg, cfg.hidden_size, "head_dense")(x)
        x = jnp.tanh(x)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)
        return _dense(cfg, cfg.num_labels, "head_out")(x)
