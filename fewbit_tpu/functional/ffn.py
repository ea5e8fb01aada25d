"""Fully-fused memory-efficient FFN block: up projection + few-bit
activation + down projection as ONE ``custom_vjp``.

The transformer FFN pair is where both of the reference's techniques meet
(its experiments patch the FFN GELU *and* convert the FFN linears,
``/root/reference/notebooks/few-bit-backward/exp-fine-tuning-glue.py:272-303``,
``notebooks/randomized-backward/exp-fine-tuning-glue.py:200-210``) — but as
separate ops each extra residual costs a full HBM pass over an (N, M)
tensor, which on a bandwidth-bound TPU step is exactly the overhead the
<3% north star forbids.  This op computes every sketch in the epilogue of a
kernel that already holds the tensor in VMEM:

* **forward** (one Pallas megakernel,
  :func:`fewbit_tpu.ops.pallas_kernels.fused_dense_act_sketch`):
  ``y = act(x @ w_up + b_up)`` with the pre-activation never reaching HBM,
  emitting the packed few-bit codes AND ``countsketch(y)`` — the residual
  the down projection's weight gradient needs; ``y`` itself is written
  bfloat16 (it only feeds the down matmul's MXU pass, which is bf16 anyway).
* **backward** (one Pallas kernel,
  :func:`fewbit_tpu.ops.pallas_kernels.fused_matmul_lut_backward`):
  ``dz = levels[codes] * (g @ w_down^T)`` — the gradient matmul, the LUT
  dequant, ``countsketch(dz)`` (for the up projection's weight gradient) and
  ``db_up = sum dz``, all in one pass; ``dz`` is written bfloat16 (it only
  feeds the two remaining gradient matmuls).

Residuals for the whole block: ``countsketch(x)``, packed codes
(``bits/8`` B per pre-activation element), ``countsketch(y)``, and the two
weights — no (N, M) tensor survives the forward pass.

Weight-gradient estimators (unbiased; see ``tests/test_ffn.py``):
``dW_up = sk(x)^T sk(dz)`` with the up key's signs, ``dW_down =
sk(y)^T sk(g)`` with the down key's signs.  The stride-partition countsketch
``P`` satisfies ``E[P^T P] = I`` exactly (sign independence makes every
cross term vanish), so no normalisation factor is needed.  Both sides of
each estimator share one sign vector derived from the op's PRNG key — the
TPU-idiomatic replacement for the reference's generator-state save/restore
(``/root/reference/fewbit/functional/linear.py:100-105,158-160``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from fewbit_tpu.functional.activations import resolve_activation
from fewbit_tpu.functional.linear import (_countsketch_partition,
                                          _countsketch_signed,
                                          _dot_acc_f32 as _dot_f32,
                                          _int_zero_cot, calc_proj_dim)
from fewbit_tpu.ops.activations import _use_pallas, apply_lut
from fewbit_tpu.ops.bitpack import pack_codes, unpack_codes

__all__ = ("fewbit_ffn",)


@dataclasses.dataclass(frozen=True)
class _FFNConfig:
    spec: object      # ActivationSpec
    k_proj: int       # requested sketch dimension
    has_b_up: bool
    has_b_down: bool


def _signs(key: jax.Array, n: int) -> jax.Array:
    return jax.random.bernoulli(key, 0.5, (n,)).astype(jnp.float32) * 2.0 - 1


def _keff(n: int, k: int) -> int:
    """Bucket count shared by the jnp and Pallas paths: kernel-aligned when
    possible so both paths produce identical sketches."""
    from fewbit_tpu.ops.pallas_kernels import countsketch_aligned_keff

    aligned = countsketch_aligned_keff(n, k)
    if aligned is not None:
        return aligned
    part = _countsketch_partition(n, k)
    return part[1] if part is not None else min(k, n)


def _pallas_ok(cfg, n: int, kdim: int, m: int, h: int, dtype) -> bool:
    from fewbit_tpu.ops import pallas_kernels as pk
    from fewbit_tpu.ops.activations import compare_codes

    if not _use_pallas():
        return False
    if dtype not in (jnp.float32.dtype, jnp.bfloat16.dtype):
        return False
    spec = cfg.spec
    if spec.bits > 6:
        return False
    if (spec.n_borders > 0 and spec.codes is not compare_codes
            and spec.name != "stepwise"):
        return False
    if n % pk.FFN_BN or m % pk.FFN_BM or kdim % 128 or h % 128:
        return False
    if pk._choose_bk(kdim) is None or pk._choose_bk(h) is None:
        return False
    k_eff = pk.countsketch_aligned_keff(n, cfg.k_proj)
    return k_eff is not None


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ffn(cfg: _FFNConfig, x, w_up, b_up, w_down, b_down, key, borders,
         levels):
    x2 = x.reshape(-1, x.shape[-1])
    z = _dot_f32(x2, w_up)
    if b_up is not None:
        z = z + b_up
    y = cfg.spec.fwd(z, cfg.spec.args).astype(x.dtype)
    out = _dot_f32(y, w_down.astype(y.dtype))
    if b_down is not None:
        out = out + b_down
    return out.reshape(*x.shape[:-1], w_down.shape[-1]).astype(x.dtype)


def _ffn_fwd(cfg, x, w_up, b_up, w_down, b_down, key, borders, levels):
    spec = cfg.spec
    x2 = x.reshape(-1, x.shape[-1])
    n, kdim = x2.shape
    m = w_up.shape[-1]
    h = w_down.shape[-1]
    key_up = jax.random.fold_in(key, 0)
    key_down = jax.random.fold_in(key, 1)
    sig_up = _signs(key_up, n)
    sig_down = _signs(key_down, n)
    k_eff = _keff(n, cfg.k_proj)

    outs = None
    if _pallas_ok(cfg, n, kdim, m, h, x.dtype):
        from fewbit_tpu.ops import pallas_kernels as pk

        # Under interpret mode the kernels skip the bf16 MXU cast so the
        # jnp-parity tests compare like against like; mirror that here.
        y_dtype = (jnp.bfloat16 if x.dtype == jnp.float32.dtype
                   and not pk._interpret_mode() else x.dtype)
        # The kernel CAN also emit the x-sketch in the same pass
        # (sigma_x=...), but at headline shapes the (k_eff, kdim)
        # VMEM-resident accumulator costs +4.4% model step time vs the
        # separate jnp pass over the narrow x (A/B-measured on chip,
        # docs/BENCHMARKS.md) — so the x-sketch stays a jnp pass here.
        outs = pk.fused_dense_act_sketch(spec, x2, w_up, b_up, borders,
                                         sig_down, k_eff, y_dtype=y_dtype)
    if outs is None:
        z = _dot_f32(x2, w_up)
        if b_up is not None:
            z = z + b_up
        codes = spec.codes(z, borders, spec.args)
        packed = pack_codes(codes.reshape(-1), spec.bits)
        y2 = spec.fwd(z, spec.args).astype(x.dtype)
        sk_y = _countsketch_signed(y2, sig_down, k_eff)
    else:
        y2, packed, sk_y = outs
    sk_x = _countsketch_signed(x2, sig_up, k_eff)

    out = _dot_f32(y2, w_down.astype(y2.dtype))
    if b_down is not None:
        out = out + b_down
    out = out.reshape(*x.shape[:-1], h).astype(x.dtype)
    return out, (packed, sk_x, sk_y, w_up, w_down, key, levels)


def _ffn_bwd(cfg, residual, g):
    spec = cfg.spec
    packed, sk_x, sk_y, w_up, w_down, key, levels = residual
    h = w_down.shape[-1]
    m = w_up.shape[-1]
    kdim = w_up.shape[0]
    g2 = g.reshape(-1, h)
    n = g2.shape[0]
    key_up = jax.random.fold_in(key, 0)
    key_down = jax.random.fold_in(key, 1)
    sig_up = _signs(key_up, n)
    sig_down = _signs(key_down, n)
    k_eff = sk_x.shape[0]

    db_down = g2.sum(axis=0).astype(g2.dtype) if cfg.has_b_down else None
    sk_g = _countsketch_signed(g2, sig_down, k_eff)
    dw_down = _dot_f32(sk_y.T, sk_g).astype(w_down.dtype)

    out = None
    if packed.ndim == 3 and _pallas_ok(cfg, n, kdim, m, h, g2.dtype):
        from fewbit_tpu.ops import pallas_kernels as pk

        # Same interpret-mode guard as the forward: bf16 is an MXU choice,
        # not part of the op's semantics, so parity tests stay f32.
        to_bf16 = (g2.dtype == jnp.float32.dtype
                   and not pk._interpret_mode())
        gb = g2.astype(jnp.bfloat16) if to_bf16 else g2
        wt = w_down.T.astype(gb.dtype)
        dz_dtype = jnp.bfloat16 if to_bf16 else g2.dtype
        # sk_dtype keys on the MODEL dtype (g2 may be pre-cast to bf16 for
        # the MXU on f32 models) so the dw_up contraction against the
        # residual's sk_x stays dtype-consistent.
        out = pk.fused_matmul_lut_backward(spec, packed, levels, gb, wt,
                                           sig_up, k_eff, dz_dtype=dz_dtype,
                                           sk_dtype=pk.sketch_dtype(g2.dtype))
    if out is None:
        if packed.ndim == 3:
            from fewbit_tpu.ops.pallas_kernels import unpack_block_layout

            codes = unpack_block_layout(packed, spec.bits, (n, m))
        else:
            codes = unpack_codes(packed, spec.bits, n * m).reshape(n, m)
        mult = apply_lut(codes, levels, spec.bits)
        dz32 = mult * _dot_f32(g2, w_down.T.astype(g2.dtype))
        from fewbit_tpu.ops.pallas_kernels import sketch_dtype

        # dz32 is f32 here regardless of model dtype; sketch storage still
        # follows the MODEL-dtype policy so fused/fallback residuals agree.
        sk_dz = _countsketch_signed(dz32, sig_up, k_eff,
                                    out_dtype=sketch_dtype(g2.dtype))
        db_up = dz32.sum(axis=0)
        dz = dz32.astype(g2.dtype)
    else:
        dz, sk_dz, db_up2 = out
        db_up = db_up2[0]

    dw_up = _dot_f32(sk_x.T, sk_dz).astype(w_up.dtype)
    dx = _dot_f32(dz, w_up.T.astype(dz.dtype))
    dx = dx.reshape(*g.shape[:-1], kdim).astype(g.dtype)
    db_up = db_up.astype(w_up.dtype) if cfg.has_b_up else None
    zeros = (jnp.zeros((spec.n_borders,), jnp.float32),
             jnp.zeros_like(levels))
    return (dx, dw_up, db_up, dw_down, db_down,
            _int_zero_cot(key)) + zeros


_ffn.defvjp(_ffn_fwd, _ffn_bwd)


def fewbit_ffn(x: jax.Array,
               w_up: jax.Array,
               b_up: Optional[jax.Array],
               w_down: jax.Array,
               b_down: Optional[jax.Array],
               key: jax.Array,
               activation: str = "gelu",
               bits: Optional[int] = None,
               act_args: tuple = (),
               borders=None,
               values=None,
               proj_dim_ratio: Optional[float] = None,
               proj_dim: Optional[int] = None,
               proj_dim_min: Optional[int] = None,
               proj_dim_max: Optional[int] = None) -> jax.Array:
    """``act(x @ w_up + b_up) @ w_down + b_down`` with few-bit + sketched
    residuals (countsketch) for the whole block.

    :param x: ``(..., K)`` input.
    :param w_up: ``(K, M)`` kernel; :param w_down: ``(M, H)`` kernel (flax
        orientation).
    :param key: PRNG key; both weight-gradient sketches derive their shared
        forward/backward signs from folds of it.
    :param proj_dim_ratio: sketch size as a fraction of the flattened batch
        (the kernel path may round the bucket count UP for tile alignment —
        never down).
    """
    spec, b_arr, v_arr = resolve_activation(activation, bits=bits,
                                            borders=borders, values=values,
                                            args=act_args)
    if proj_dim_ratio is None and proj_dim is None:
        raise ValueError("fewbit_ffn requires proj_dim or proj_dim_ratio; "
                         "use fewbit_dense_act + an exact Dense otherwise")
    ndim = int(np.prod(x.shape[:-1]))
    k = calc_proj_dim(ndim, proj_dim_ratio, proj_dim, proj_dim_max,
                      proj_dim_min)
    cfg = _FFNConfig(spec=spec, k_proj=k, has_b_up=b_up is not None,
                     has_b_down=b_down is not None)
    return _ffn(cfg, x, w_up, b_up, w_down, b_down, key, b_arr, v_arr)
