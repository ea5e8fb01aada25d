"""Megakernel tuning experiments (VERDICT r3 #2: close the Mosaic-vs-XLA
matmul gap).  Measures fused dense+act+quant+pack variants on the real chip:

  baseline   — fused_dense_act as shipped
  dimsem     — + dimension_semantics hints
  geometry   — block-size sweep
  pipelined  — epilogue deferred one grid step (VPU work of block i-1
               scheduled against the MXU matmul of block i)
  noepi      — matmul-only ablation (quantifies the epilogue share)

Usage: python tools/exp_megakernel.py [--iters 50]
"""

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fewbit_tpu.functional.activations import resolve_activation
from fewbit_tpu.ops import pallas_kernels as pk

N, K, M = 8192, 768, 3072
MXU_PEAK = 197e12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, x, iters=50, rounds=3):
    from tools.timing import timed_loop, touch

    return timed_loop(lambda i, c: touch(c, fn(c)), x, iters, rounds)


def variant_kernel(spec, bn, bm, bk, n_k, epilogue, borders_ref, x_ref,
                   w_ref, y_ref, packed_ref, acc_ref):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k_idx == n_k - 1)
    def _epi():
        z = acc_ref[:]
        if epilogue:
            gr = bn // pk.GROUP
            fwd = spec.fwd_kernel or spec.fwd
            y_ref[:] = fwd(z, spec.args).astype(y_ref.dtype)
            codes = pk._compute_codes(spec, z, borders_ref)
            for b in range(spec.bits):
                plane = (codes >> b) & jnp.uint32(1)
                word = jnp.zeros((gr, bm), dtype=jnp.uint32)
                for i in range(pk.GROUP):
                    word |= plane[i * gr:(i + 1) * gr, :] << jnp.uint32(i)
                packed_ref[b, :, :] = word
        else:
            y_ref[:] = z.astype(y_ref.dtype)
            packed_ref[0, :, :] = jnp.zeros_like(packed_ref[0])


def make_variant(spec, borders, bn, bm, bk, dimsem=None, epilogue=True):
    gr = bn // pk.GROUP
    n_k = K // bk
    grid = (N // bn, M // bm, n_k)
    kernel = functools.partial(variant_kernel, spec, bn, bm, bk, n_k,
                               epilogue)
    borders2 = borders.reshape(1, -1).astype(jnp.float32)
    params = dict(vmem_limit_bytes=pk.VMEM_LIMIT)
    if dimsem is not None:
        params["dimension_semantics"] = dimsem

    def run(x):
        xb = x.astype(jnp.bfloat16)
        wb = run.w
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, borders2.shape[1]), lambda i, j, k: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((bn, bk), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bm), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((bn, bm), lambda i, j, k: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((spec.bits, gr, bm), lambda i, j, k: (0, i, j),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((N, M), jnp.float32),
                jax.ShapeDtypeStruct((spec.bits, (N // bn) * gr, M),
                                     jnp.uint32),
            ),
            scratch_shapes=[pltpu.VMEM((bn, bm), jnp.float32)],
            compiler_params=pltpu.CompilerParams(**params),
        )(borders2, xb, wb)[0]

    return run


def direct_kernel(spec, bn, bm, epilogue, out_bf16, borders_ref, x_ref,
                  w_ref, y_ref, packed_ref):
    """No k-split, no accumulator scratch: z lives in registers between the
    dot and the epilogue."""
    z = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    if epilogue:
        gr = bn // pk.GROUP
        fwd = spec.fwd_kernel or spec.fwd
        y_ref[:] = fwd(z, spec.args).astype(y_ref.dtype)
        codes = pk._compute_codes(spec, z, borders_ref)
        for b in range(spec.bits):
            plane = (codes >> b) & jnp.uint32(1)
            word = jnp.zeros((gr, bm), dtype=jnp.uint32)
            for i in range(pk.GROUP):
                word |= plane[i * gr:(i + 1) * gr, :] << jnp.uint32(i)
            packed_ref[b, :, :] = word
    else:
        y_ref[:] = z.astype(y_ref.dtype)
        packed_ref[0, :, :] = jnp.zeros_like(packed_ref[0])


def make_direct(spec, borders, bn, bm, dimsem=None, epilogue=True,
                out_bf16=False, wres=False, cast_back=True):
    """wres=True: bm == M, the whole weight stays VMEM-resident (constant
    block index), grid over rows only."""
    gr = bn // pk.GROUP
    grid = (N // bn,) if wres else (N // bn, M // bm)
    kernel = functools.partial(direct_kernel, spec, bn, bm, epilogue,
                               out_bf16)
    borders2 = borders.reshape(1, -1).astype(jnp.float32)
    params = dict(vmem_limit_bytes=pk.VMEM_LIMIT)
    if dimsem is not None:
        params["dimension_semantics"] = dimsem
    out_dt = jnp.bfloat16 if out_bf16 else jnp.float32

    if wres:
        in_specs = [
            pl.BlockSpec((1, borders2.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bn, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bm), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = (
            pl.BlockSpec((bn, bm), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.bits, gr, bm), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        )
    else:
        in_specs = [
            pl.BlockSpec((1, borders2.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bn, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = (
            pl.BlockSpec((bn, bm), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.bits, gr, bm), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        )

    def run(x):
        xb = x.astype(jnp.bfloat16)
        wb = run.w
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=(
                jax.ShapeDtypeStruct((N, M), out_dt),
                jax.ShapeDtypeStruct((spec.bits, (N // bn) * gr, M),
                                     jnp.uint32),
            ),
            compiler_params=pltpu.CompilerParams(**params),
        )(borders2, xb, wb)[0]
        return out.astype(jnp.float32) if cast_back else out

    return run


def make_emit(spec, borders, bn, dimsem=None, out_bf16=False):
    """Manual pipelining via ``pltpu.emit_pipeline``: the outer kernel holds
    x/w/y/packed in compiler-chosen (HBM) space and the inner pipeline
    streams row blocks with emit_pipeline's own double-buffering — the
    remaining Mosaic lever round 4 did not try.  The weight block has a
    constant index so it is fetched once."""
    gr = bn // pk.GROUP
    n_i = N // bn
    borders2 = borders.reshape(1, -1).astype(jnp.float32)
    out_dt = jnp.bfloat16 if out_bf16 else jnp.float32
    dims = dimsem

    def outer(borders_ref, x_any, w_any, y_any, packed_any):
        def inner(x_ref, w_ref, y_ref, packed_ref):
            z = jnp.dot(x_ref[:], w_ref[:],
                        preferred_element_type=jnp.float32)
            fwd = spec.fwd_kernel or spec.fwd
            y_ref[:] = fwd(z, spec.args).astype(y_ref.dtype)
            codes = pk._compute_codes(spec, z, borders_ref)
            for b in range(spec.bits):
                plane = (codes >> b) & jnp.uint32(1)
                word = jnp.zeros((gr, M), dtype=jnp.uint32)
                for g in range(pk.GROUP):
                    word |= plane[g * gr:(g + 1) * gr, :] << jnp.uint32(g)
                packed_ref[b, :, :] = word

        pltpu.emit_pipeline(
            inner,
            grid=(n_i,),
            in_specs=[
                pl.BlockSpec((bn, K), lambda i: (i, 0)),
                pl.BlockSpec((K, M), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((bn, M), lambda i: (i, 0)),
                pl.BlockSpec((spec.bits, gr, M), lambda i: (0, i, 0)),
            ],
            dimension_semantics=dims,
        )(x_any, w_any, y_any, packed_any)

    def run(x):
        xb = x.astype(jnp.bfloat16)
        wb = run.w
        out = pl.pallas_call(
            outer,
            in_specs=[
                pl.BlockSpec((1, borders2.shape[1]),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((N, M), out_dt),
                jax.ShapeDtypeStruct((spec.bits, n_i * gr, M), jnp.uint32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=pk.VMEM_LIMIT),
        )(borders2, xb, wb)[0]
        return out.astype(jnp.float32) if not out_bf16 else out

    return run


def pipelined_kernel(spec, bn, bm, n_i, borders_ref, x_ref, w_ref, y_ref,
                     packed_ref, z_ref):
    """Epilogue of row block i-1 runs in the same body as the matmul of row
    block i — independent MXU/VPU work the scheduler can overlap.  Grid is
    (j, i) with i = 0..n_i (one flush step); k is unsplit."""
    i = pl.program_id(1)
    gr = bn // pk.GROUP

    @pl.when(i < n_i)
    def _mm():
        slot = lax.rem(i, 2)
        z_ref[slot] = jnp.dot(x_ref[:], w_ref[:],
                              preferred_element_type=jnp.float32)

    @pl.when(i > 0)
    def _epi():
        slot = lax.rem(i - 1, 2)
        z = z_ref[slot]
        fwd = spec.fwd_kernel or spec.fwd
        y_ref[:] = fwd(z, spec.args).astype(y_ref.dtype)
        codes = pk._compute_codes(spec, z, borders_ref)
        for b in range(spec.bits):
            plane = (codes >> b) & jnp.uint32(1)
            word = jnp.zeros((gr, bm), dtype=jnp.uint32)
            for g in range(pk.GROUP):
                word |= plane[g * gr:(g + 1) * gr, :] << jnp.uint32(g)
            packed_ref[b, :, :] = word


def make_pipelined(spec, borders, bn, bm, dimsem=None):
    gr = bn // pk.GROUP
    n_i = N // bn
    grid = (M // bm, n_i + 1)
    kernel = functools.partial(pipelined_kernel, spec, bn, bm, n_i)
    borders2 = borders.reshape(1, -1).astype(jnp.float32)
    params = dict(vmem_limit_bytes=pk.VMEM_LIMIT)
    if dimsem is not None:
        params["dimension_semantics"] = dimsem

    def run(x):
        xb = x.astype(jnp.bfloat16)
        wb = run.w
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, borders2.shape[1]), lambda j, i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((bn, K),
                             lambda j, i: (jnp.minimum(i, n_i - 1), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, bm), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((bn, bm),
                             lambda j, i: (jnp.maximum(i - 1, 0), j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((spec.bits, gr, bm),
                             lambda j, i: (0, jnp.maximum(i - 1, 0), j),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((N, M), jnp.float32),
                jax.ShapeDtypeStruct((spec.bits, (N // bn) * gr, M),
                                     jnp.uint32),
            ),
            scratch_shapes=[pltpu.VMEM((2, bn, bm), jnp.float32)],
            compiler_params=pltpu.CompilerParams(**params),
        )(borders2, xb, wb)[0]

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    spec, borders, levels = resolve_activation("gelu", bits=3)
    x = jax.random.normal(jax.random.key(1), (N, K), jnp.float32)
    w = jax.random.normal(jax.random.key(2), (K, M), jnp.float32) * 0.02
    wb = w.astype(jnp.bfloat16)
    flops = 2.0 * N * K * M

    def report(name, t):
        print(f"{name:40s} {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s "
              f"{100*flops/t/MXU_PEAK:5.1f}% MXU", flush=True)

    # XLA baseline
    def xla_mm(c):
        return (c.astype(jnp.bfloat16) @ wb).astype(jnp.float32)
    report("XLA matmul (bf16)", timed(xla_mm, x, args.iters))

    def shipped(c):
        y, _ = pk.fused_dense_act(spec, c, w, None, borders)
        return y
    report("shipped fused_dense_act", timed(shipped, x, args.iters))

    parallel3 = ("parallel", "parallel", "arbitrary")
    for name, bn, bm, bk, ds, epi in [
        ("v(512,1024,768)", 512, 1024, 768, None, True),
        ("v(512,1024,768)+noepi", 512, 1024, 768, None, False),
    ]:
        try:
            fn = make_variant(spec, borders, bn, bm, bk, ds, epi)
            fn.w = wb
            report(name, timed(fn, x, args.iters))
        except Exception as e:
            print(f"{name:40s} FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)

    for name, bn, bm, ds, epi, obf, wres in [
        ("direct(512,1024)", 512, 1024, None, True, False, False),
        ("direct(512,1024)+noepi", 512, 1024, None, False, False, False),
        ("direct(512,1024)+dimsem", 512, 1024,
         ("parallel", "parallel"), True, False, False),
        ("direct(512,3072) w-resident", 512, 3072, None, True, False, True),
        ("direct(512,3072) w-res+dimsem", 512, 3072,
         ("parallel",), True, False, True),
        ("direct(512,3072) w-res noepi", 512, 3072, None, False, False,
         True),
        ("direct(1024,3072) w-resident", 1024, 3072, None, True, False,
         True),
        ("direct(256,3072) w-resident", 256, 3072, None, True, False, True),
        ("direct(512,3072) w-res bf16out", 512, 3072, None, True, True,
         True),
    ]:
        try:
            fn = make_direct(spec, borders, bn, bm, ds, epi, obf, wres)
            fn.w = wb
            report(name, timed(fn, x, args.iters))
        except Exception as e:
            print(f"{name:40s} FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)

    for name, bn, bm, ds in [
        ("pipelined(512,1024)", 512, 1024, None),
        ("pipelined(512,1024)+dimsem", 512, 1024,
         ("parallel", "arbitrary")),
    ]:
        try:
            fn = make_pipelined(spec, borders, bn, bm, ds)
            fn.w = wb
            report(name, timed(fn, x, args.iters))
        except Exception as e:
            print(f"{name:40s} FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)

    # Round-5 levers (VERDICT r4 #6): emit_pipeline manual pipelining and
    # true bf16-in/bf16-out (no cast-back pass, bf16 loop carry — compare
    # against the bf16-carry XLA matmul, the honest bf16-model baseline).
    for name, bn, obf in [
        ("emit_pipeline(512)", 512, False),
        ("emit_pipeline(256)", 256, False),
        ("emit_pipeline(1024)", 1024, False),
        ("emit_pipeline(512) bf16-out", 512, True),
    ]:
        try:
            fn = make_emit(spec, borders, bn, out_bf16=obf)
            fn.w = wb
            carry = x.astype(jnp.bfloat16) if obf else x
            report(name, timed(fn, carry, args.iters))
        except Exception as e:
            print(f"{name:40s} FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)

    xbf = x.astype(jnp.bfloat16)

    def xla_mm_bf16(c):
        return c @ wb

    report("XLA matmul (bf16 carry)", timed(xla_mm_bf16, xbf, args.iters))
    for name, bn, bm, wres in [
        ("direct(512,3072) w-res bf16 e2e", 512, 3072, True),
        ("direct(512,1024) bf16 e2e", 512, 1024, False),
    ]:
        try:
            fn = make_direct(spec, borders, bn, bm, None, True, True, wres,
                             cast_back=False)
            fn.w = wb
            report(name, timed(fn, xbf, args.iters))
        except Exception as e:
            print(f"{name:40s} FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
