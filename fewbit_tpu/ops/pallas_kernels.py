"""Fused Pallas TPU kernels for the few-bit activation engine.

Forward: activation + border-compare quantise + bit-plane pack in **one pass
over HBM**.  The reference library's forward costs 2.18x a vanilla GELU
because quantise+pack runs as extra kernel work over global memory
(``memory-usage-operation-only.py:80-85``); here the pack rides the same
VMEM-resident block as the activation, so the op stays memory-bound at
~(read x + write y + write codes) bytes.

Backward: bit-plane unpack + LUT select + cotangent multiply, one pass.

Layout.  The kernel views ``x`` as ``(R, C)`` (leading dims collapsed — a
free reshape, XLA tiling lives on the minor two dims) and tiles it into
``(BR, BC)`` blocks.  Within a block, codes pack into ``BR/32`` uint32 word
rows per bit-plane: slab ``i`` (rows ``[i*GR, (i+1)*GR)`` of the block,
``GR = BR/32``) contributes bit ``i`` of each word — so both pack and unpack
touch only *contiguous sublane slabs* with static shift/or/sum ops: no
gathers, no transposes, no strided access.  This is the TPU replacement for
the reference's warp-shuffle butterfly codec (``cuda/codec.cu:142-220``).

The packed residual is ``(bits, R_pad/32, C_pad)`` uint32 — exactly
``bits/8`` bytes per element (same density as the reference).  The backward
kernel re-derives the identical block geometry from ``g.shape``, so forward
and backward always agree; :func:`unpack_block_layout` provides a jnp mirror
of the decode for fallback and testing.

Ragged edges: partial edge blocks rely on Pallas OOB semantics (out-of-bounds
reads produce garbage, out-of-bounds writes are dropped).  Garbage codes are
harmless — every decoded bit is masked to {0,1} and the corresponding ``dx``
rows/cols are dropped on write.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 32  # codes per uint32 word (one bit per bit-plane word)

# Mosaic's default scoped-VMEM budget (16 MiB) is tighter than the hardware
# (v5e has 128 MiB of VMEM); the 512-row double-buffered blocks plus the
# compare/pack temporaries need ~18-20 MiB at wide shapes, and the FFN
# sketch kernels' (k_eff, bm) accumulator block reaches ~68 MiB at bs=128
# (k_eff = 4096).  Raise the limit rather than shrink the blocks — the
# block geometry is the packed-residual layout contract between forward and
# backward, and the larger blocks are measured faster on every headline
# shape.
VMEM_LIMIT = 100 * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


_SUPPORTED_DTYPES = (jnp.float32, jnp.bfloat16)


def sketch_dtype(dtype) -> jnp.dtype:
    """Storage dtype for countsketch residuals, keyed on the MODEL dtype.

    bf16 models store bf16 sketches: the sketched weight-gradient estimator
    carries sampling variance ~ ||x||^2 ||g||^2 / k_eff, orders of magnitude
    above bf16's 2^-8 rounding, so the cast is free accuracy-wise while it
    halves the residual memory and the sketch's HBM read/write traffic —
    exactly the term that made the bf16 overhead miss the <3% target in
    round 4 (docs/BENCHMARKS.md bf16 attribution).  f32 models keep f32
    sketches (there the matmuls are the dominant cost and the f32 sketch
    already fits the budget).  Accumulation stays f32 wherever an
    accumulator exists; in-kernel slab accumulation is in the storage dtype
    (4-5 adds per bucket at headline shapes — see _ffn_sketch_epilogue).
    """
    return (jnp.bfloat16.dtype if jnp.dtype(dtype) == jnp.bfloat16.dtype
            else jnp.float32.dtype)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _choose_blocks(r: int, c: int) -> Tuple[int, int]:
    """Deterministic block geometry shared by forward and backward.

    512-row blocks halve the number of grid steps (and, in the dense
    megakernel, halve the re-streaming of the weight) versus 256 at an
    extra ~2 MiB of VMEM — measured faster on v5e for every headline shape.
    The packed-residual layout is a pure function of this geometry, so
    forward and backward always re-derive the same one.
    """
    br = min(512, _cdiv(r, GROUP) * GROUP)
    bc = min(1024, c)
    return br, bc


def _choose_bk(kdim: int) -> Optional[int]:
    """Largest 128-multiple reduction block that exactly divides ``kdim``
    (capped so the operand blocks stay comfortably inside VMEM)."""
    for bk in range(min(kdim, 2048), 0, -128):
        if kdim % bk == 0:
            return bk
    return None


def _eligible(spec, shape, dtype) -> bool:
    from fewbit_tpu.ops.activations import compare_codes

    if len(shape) < 2:
        return False
    c = shape[-1]
    if c % 128 != 0:
        return False
    if dtype not in (jnp.float32.dtype, jnp.bfloat16.dtype):
        return False
    # Border-based code functions the kernels know how to compute: the
    # standard compare path, and the generic user ``stepwise`` whose
    # shift/parity transform is recovered from static ``spec.args`` (compile-
    # time scalars — see ``_compute_codes``).  Other custom closures fall
    # back.  The unrolled compare/select trees stay reasonable up to 6 bits
    # (63 compares forward, 63 selects backward); 7-8-bit user LUTs take the
    # jnp path.
    if spec.bits > 6:
        return False
    if (spec.n_borders > 0 and spec.codes is not compare_codes
            and spec.name != "stepwise"):
        return False
    return True


def _compute_codes(spec, z, borders_ref) -> jax.Array:
    """Interval codes of a VMEM-resident block, shared by the elementwise
    and dense-epilogue forward kernels.

    For the generic ``stepwise`` op, ``spec.args = (shift, offset, parity)``
    are static Python scalars, so the recentring/|.|/sign-bit transform
    compiles straight into the kernel — no extra SMEM operands needed.
    """
    zf = z.astype(jnp.float32)
    if spec.n_borders == 0:
        return spec.codes(z, None, spec.args).astype(jnp.uint32)
    parity = -1
    if spec.name == "stepwise":
        s, _t, parity = spec.args
        if s:
            zf = zf - jnp.float32(s)
        basis = jnp.abs(zf) if parity >= 0 else zf
    else:
        basis = zf
    codes = jnp.zeros(z.shape, dtype=jnp.uint32)
    for k in range(spec.n_borders):
        codes += (basis > borders_ref[0, k]).astype(jnp.uint32)
    if parity == 1:
        # Odd derivative: the sign occupies the top code bit; the negative
        # half-table starts at the padded half size 1 << (bits - 1).
        half = jnp.uint32(1 << (spec.bits - 1))
        codes += jnp.where(zf < 0, half, jnp.uint32(0))
    return codes


def _flat_rc(shape) -> Tuple[int, int]:
    c = shape[-1]
    r = 1
    for d in shape[:-1]:
        r *= d
    return r, c


# ---------------------------------------------------------------------------
# Forward kernel.
# ---------------------------------------------------------------------------


def _forward_kernel(spec, br, bc, borders_ref, x_ref, y_ref, packed_ref):
    gr = br // GROUP
    xb = x_ref[:]
    fwd = spec.fwd_kernel or spec.fwd
    y_ref[:] = fwd(xb, spec.args).astype(y_ref.dtype)

    codes = _compute_codes(spec, xb, borders_ref)

    for b in range(spec.bits):
        plane = (codes >> b) & jnp.uint32(1)
        word = jnp.zeros((gr, bc), dtype=jnp.uint32)
        for i in range(GROUP):
            word |= plane[i * gr:(i + 1) * gr, :] << jnp.uint32(i)
        packed_ref[b, :, :] = word


def fused_forward(spec, x: jax.Array,
                  borders: jax.Array) -> Optional[Tuple[jax.Array, jax.Array]]:
    """One-pass activation + quantise + pack.  Returns ``None`` when the
    shape/dtype/spec is outside the kernel's envelope (caller falls back)."""
    if not _eligible(spec, x.shape, x.dtype):
        return None
    r, c = _flat_rc(x.shape)
    br, bc = _choose_blocks(r, c)
    gr = br // GROUP
    grid_r, grid_c = _cdiv(r, br), _cdiv(c, bc)

    x2 = x.reshape(r, c)
    nb = max(spec.n_borders, 1)
    borders2 = jnp.zeros((1, nb), jnp.float32)
    if spec.n_borders:
        borders2 = borders.reshape(1, -1).astype(jnp.float32)

    out_shapes = (
        jax.ShapeDtypeStruct((r, c), x.dtype),
        jax.ShapeDtypeStruct((spec.bits, grid_r * gr, grid_c * bc),
                             jnp.uint32),
    )
    kernel = functools.partial(_forward_kernel, spec, br, bc)
    y, packed = pl.pallas_call(
        kernel,
        grid=(grid_r, grid_c),
        in_specs=[
            pl.BlockSpec((1, nb), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((br, bc), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((br, bc), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.bits, gr, bc), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        input_output_aliases={1: 0},  # y aliases x (reference mark_dirty)
        cost_estimate=pl.CostEstimate(
            flops=6 * r * c + spec.n_borders * r * c + spec.bits * r * c,
            bytes_accessed=r * c * x.dtype.itemsize * 2
            + spec.bits * r * c // 8,
            transcendentals=r * c,
        ),
        interpret=_interpret_mode(),
        compiler_params=_compiler_params(),
    )(borders2, x2)
    return y.reshape(x.shape), packed


# ---------------------------------------------------------------------------
# Backward kernel.
# ---------------------------------------------------------------------------


def _backward_kernel(spec, br, bc, levels_ref, packed_ref, g_ref, dx_ref):
    gr = br // GROUP
    nlevels = 1 << spec.bits
    words = [packed_ref[b, :, :] for b in range(spec.bits)]
    for i in range(GROUP):
        # One boolean mask per code bit for this slab (2 VPU ops each), then
        # a balanced select tree: 2**bits - 1 selects total, no integer code
        # ever materialised.
        slot = jnp.uint32(1 << i)
        masks = [(words[b] & slot) != 0 for b in range(spec.bits)]
        vals = [levels_ref[0, k] for k in range(nlevels)]
        for mask in masks:
            vals = [jnp.where(mask, vals[2 * k + 1], vals[2 * k])
                    for k in range(len(vals) // 2)]
        g_slab = g_ref[i * gr:(i + 1) * gr, :].astype(jnp.float32)
        dx_ref[i * gr:(i + 1) * gr, :] = (vals[0] * g_slab).astype(
            dx_ref.dtype)


def fused_backward(spec, packed: jax.Array, levels: jax.Array,
                   g: jax.Array) -> Optional[jax.Array]:
    """One-pass unpack + LUT-dequant + multiply."""
    if packed.ndim != 3:
        return None  # residual came from the jnp path
    if not _eligible(spec, g.shape, g.dtype):
        return None
    r, c = _flat_rc(g.shape)
    br, bc = _choose_blocks(r, c)
    gr = br // GROUP
    grid_r, grid_c = _cdiv(r, br), _cdiv(c, bc)
    if packed.shape != (spec.bits, grid_r * gr, grid_c * bc):
        return None

    g2 = g.reshape(r, c)
    levels2 = levels.reshape(1, -1).astype(jnp.float32)
    kernel = functools.partial(_backward_kernel, spec, br, bc)
    dx = pl.pallas_call(
        kernel,
        grid=(grid_r, grid_c),
        in_specs=[
            pl.BlockSpec((1, levels2.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((spec.bits, gr, bc), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, bc), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, bc), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, c), g.dtype),
        input_output_aliases={2: 0},  # dx aliases g
        cost_estimate=pl.CostEstimate(
            flops=(spec.bits * 2 + (1 << spec.bits)) * r * c,
            bytes_accessed=r * c * g.dtype.itemsize * 2
            + spec.bits * r * c // 8,
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
        compiler_params=_compiler_params(),
    )(levels2, packed, g2)
    return dx.reshape(g.shape)


def _interpret_mode() -> bool:
    import os

    return os.getenv("FEWBIT_TPU_NATIVE", "").lower() == "interpret"


# ---------------------------------------------------------------------------
# Fused dense + activation + quantise + pack ("FFN prefix" megakernel).
#
# Computes z = x @ w + b on the MXU and applies the activation, the border
# compare, and the bit-plane pack in the epilogue of the same kernel — the
# big (N, M) pre-activation z never exists in HBM.  Combined with a sketched
# input residual this reduces the whole dense+activation block's backward
# storage to sketch(x) + bits/8 bytes per element.
# ---------------------------------------------------------------------------


def _dense_act_kernel(spec, bn, bm, bk, n_k, borders_ref, x_ref, w_ref,
                      bias_ref, y_ref, packed_ref, acc_ref):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k_idx == n_k - 1)
    def _epilogue():
        gr = bn // GROUP
        z = acc_ref[:] + bias_ref[0, :][None, :]
        fwd = spec.fwd_kernel or spec.fwd
        y_ref[:] = fwd(z, spec.args).astype(y_ref.dtype)
        codes = _compute_codes(spec, z, borders_ref)
        for b in range(spec.bits):
            plane = (codes >> b) & jnp.uint32(1)
            word = jnp.zeros((gr, bm), dtype=jnp.uint32)
            for i in range(GROUP):
                word |= plane[i * gr:(i + 1) * gr, :] << jnp.uint32(i)
            packed_ref[b, :, :] = word


def fused_dense_act(spec, x: jax.Array, w: jax.Array, bias, borders
                    ) -> Optional[Tuple[jax.Array, jax.Array]]:
    """One-kernel ``act(x @ w + b)`` with bitpacked codes of the
    pre-activation.  ``x``: (N, K); ``w``: (K, M).  Returns None when shapes
    fall outside the kernel envelope (caller falls back to XLA + the
    elementwise fused kernels)."""
    if x.ndim != 2 or w.ndim != 2:
        return None
    n, kdim = x.shape
    _, m = w.shape
    if n % 8 or kdim % 128 or m % 128:
        return None
    if x.dtype not in (jnp.float32.dtype, jnp.bfloat16.dtype):
        return None
    out_dtype = x.dtype
    from fewbit_tpu.ops.activations import compare_codes

    if spec.bits > 6:
        return None
    if (spec.n_borders > 0 and spec.codes is not compare_codes
            and spec.name != "stepwise"):
        return None

    # Same (row, col) block geometry as the elementwise kernels so the
    # packed residual decodes with the ordinary fused_backward.
    bn, bm = _choose_blocks(n, m)
    bk = _choose_bk(kdim)
    if bk is None:
        # No aligned reduction block divides kdim: a partial k-block would
        # stream out-of-bounds garbage INTO the accumulator (unlike row/col
        # edges, which only produce dropped rows) — fall back.
        return None
    gr = bn // GROUP
    grid = (_cdiv(n, bn), _cdiv(m, bm), _cdiv(kdim, bk))

    # MXU precision: XLA lowers f32 matmuls to bf16 MXU passes by default on
    # TPU; do the same (cast fuses into the operands' producers, and the
    # accumulator stays f32).  Interpret mode keeps f32 so the jnp-parity
    # tests stay exact.
    if x.dtype == jnp.float32.dtype and not _interpret_mode():
        x = x.astype(jnp.bfloat16)
        w = w.astype(jnp.bfloat16)

    nb = max(spec.n_borders, 1)
    borders2 = jnp.zeros((1, nb), jnp.float32)
    if spec.n_borders:
        borders2 = borders.reshape(1, -1).astype(jnp.float32)
    bias2 = (bias if bias is not None else
             jnp.zeros((m,), jnp.float32)).reshape(1, m).astype(jnp.float32)

    kernel = functools.partial(_dense_act_kernel, spec, bn, bm, bk, grid[2])
    out_shapes = (
        jax.ShapeDtypeStruct((n, m), out_dtype),
        jax.ShapeDtypeStruct((spec.bits, grid[0] * gr, grid[1] * bm),
                             jnp.uint32),
    )
    y, packed = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nb), lambda i, j, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bn, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bm), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bn, bm), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.bits, gr, bm), lambda i, j, k: (0, i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((bn, bm), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * kdim,
            bytes_accessed=(n * kdim + kdim * m) * x.dtype.itemsize
            + n * m * out_dtype.itemsize + spec.bits * n * m // 8,
            transcendentals=n * m,
        ),
        interpret=_interpret_mode(),
        compiler_params=_compiler_params(),
    )(borders2, x, w, bias2)
    return y, packed


def dense_act_packed_shape(spec, n: int, m: int) -> Tuple[int, int, int]:
    """Packed-residual shape the megakernel will produce for (n, m)."""
    bn, bm = _choose_blocks(n, m)
    gr = bn // GROUP
    return (spec.bits, _cdiv(n, bn) * gr, _cdiv(m, bm) * bm)


# ---------------------------------------------------------------------------
# FFN-block kernels: dense + activation + pack + countsketch epilogues.
#
# The memory-efficient FFN needs two more sketches beyond what the plain
# megakernel provides, and both would otherwise cost a full extra HBM pass
# over an (N, M) tensor (the dominant share of the RandomizedLinear step
# overhead — see docs/BENCHMARKS.md):
#
#   * forward: countsketch of y = act(x @ w_up + b) — the residual the DOWN
#     projection's weight gradient needs;
#   * backward: countsketch of dz = levels[codes] * (g @ w_down^T) — the
#     residual the UP projection's weight gradient needs — plus the bias
#     cotangent db = sum_n dz.
#
# Both ride the same VMEM-resident block as the matmul epilogue.  The
# countsketch with a stride partition maps row r to bucket r % k_eff with
# sign sigma_r, so a (FFN_BN)-row block accumulates into one contiguous
# k_eff-aligned slab of the sketch.  The grid is ordered (column j OUTER,
# row i middle, reduction k inner) so the (k_eff, bm) sketch block for a
# given j is visited in consecutive grid steps — the Pallas requirement for
# cross-step output accumulation.
# ---------------------------------------------------------------------------

FFN_BN = 512  # row block; the pack geometry must match _choose_blocks
FFN_BM = 512  # column block (kept small: the sketch block is k_eff x FFN_BM)


def countsketch_aligned_keff(n: int, k: int) -> Optional[int]:
    """Bucket count for the kernel-fused countsketch: the smallest multiple
    of FFN_BN that divides ``n`` and is >= ``k`` (never less accurate than
    requested), within a 2x bucket budget.  The kernel's slab geometry
    floors the bucket count at FFN_BN, so requests smaller than FFN_BN/2
    cannot be honoured within the budget — they return None and the caller
    falls back to the jnp sketch, which respects the requested size instead
    of silently storing an inflated residual."""
    if n % FFN_BN:
        return None
    k_eff = max(FFN_BN, _cdiv(k, FFN_BN) * FFN_BN)
    while k_eff <= 2 * k:
        if n % k_eff == 0:
            return k_eff if k_eff <= n else None
        k_eff += FFN_BN
    return None


def _ffn_sketch_epilogue(i, slabs, block, sig_ref, sk_ref):
    """Accumulate a signed row-block into its bucket slab of the sketch.

    The store dtype follows ``sk_ref`` (bf16 for bf16 models — see
    :func:`sketch_dtype`); each bucket slab accumulates n/k_eff times
    (4-5 at headline shapes), so in-ref bf16 accumulation loses far less
    than the estimator's own sampling noise."""
    signed = (block * sig_ref[:].astype(jnp.float32)).astype(sk_ref.dtype)
    # program_id is int32; make the literal match so the kernel is x64-proof.
    slab = jax.lax.rem(i, jnp.asarray(slabs, i.dtype))

    @pl.when(i < slabs)
    def _init():
        sk_ref[pl.ds(slab * FFN_BN, FFN_BN), :] = signed

    @pl.when(i >= slabs)
    def _acc():
        sk_ref[pl.ds(slab * FFN_BN, FFN_BN), :] += signed


def _dense_act_sketch_kernel(spec, bm, bk, n_k, slabs, borders_ref, x_ref,
                             w_ref, bias_ref, sig_ref, sigx_ref, y_ref,
                             packed_ref, sk_ref, skx_ref, acc_ref):
    j, i, k_idx = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xb = x_ref[:]
    acc_ref[:] += jnp.dot(xb, w_ref[:],
                          preferred_element_type=jnp.float32)

    if skx_ref is not None:
        # Input countsketch rides the matmul's own read of x: rows of block
        # i land in slab (i mod S) at their local offsets (bucket = global
        # row mod k_eff), columns follow the reduction block.  x is
        # re-streamed once per output-column block j, so accumulate only on
        # the first pass; the (k_eff, kdim) output block has a constant
        # index map, stays VMEM-resident for the whole grid and flushes
        # once at the end.
        @pl.when(j == 0)
        def _sketch_x():
            signed = (xb.astype(jnp.float32)
                      * sigx_ref[:].astype(jnp.float32)).astype(
                          skx_ref.dtype)
            slab = jax.lax.rem(i, jnp.asarray(slabs, i.dtype))

            @pl.when(i < slabs)
            def _init_x():
                skx_ref[pl.ds(slab * FFN_BN, FFN_BN),
                        pl.ds(k_idx * bk, bk)] = signed

            @pl.when(i >= slabs)
            def _acc_x():
                skx_ref[pl.ds(slab * FFN_BN, FFN_BN),
                        pl.ds(k_idx * bk, bk)] += signed

    @pl.when(k_idx == n_k - 1)
    def _epilogue():
        gr = FFN_BN // GROUP
        z = acc_ref[:] + bias_ref[0, :][None, :]
        fwd = spec.fwd_kernel or spec.fwd
        y = fwd(z, spec.args)
        y_ref[:] = y.astype(y_ref.dtype)
        codes = _compute_codes(spec, z, borders_ref)
        for b in range(spec.bits):
            plane = (codes >> b) & jnp.uint32(1)
            word = jnp.zeros((gr, bm), dtype=jnp.uint32)
            for g in range(GROUP):
                word |= plane[g * gr:(g + 1) * gr, :] << jnp.uint32(g)
            packed_ref[b, :, :] = word
        _ffn_sketch_epilogue(i, slabs, y.astype(jnp.float32), sig_ref, sk_ref)


def _kernel_no_skx(spec, bm, bk, n_k, slabs, borders_ref, x_ref, w_ref,
                   bias_ref, sig_ref, y_ref, packed_ref, sk_ref, acc_ref):
    _dense_act_sketch_kernel(spec, bm, bk, n_k, slabs, borders_ref, x_ref,
                             w_ref, bias_ref, sig_ref, None, y_ref,
                             packed_ref, sk_ref, None, acc_ref)


def _kernel_skx(spec, bm, bk, n_k, slabs, borders_ref, x_ref, w_ref,
                bias_ref, sig_ref, sigx_ref, y_ref, packed_ref, sk_ref,
                skx_ref, acc_ref):
    _dense_act_sketch_kernel(spec, bm, bk, n_k, slabs, borders_ref, x_ref,
                             w_ref, bias_ref, sig_ref, sigx_ref, y_ref,
                             packed_ref, sk_ref, skx_ref, acc_ref)


def fused_dense_act_sketch(spec, x: jax.Array, w: jax.Array, bias,
                           borders, sigma: jax.Array, k_eff: int,
                           y_dtype=None, sigma_x=None):
    """``act(x @ w + b)`` emitting packed codes AND the countsketch of the
    activation in the same pass.  Returns ``(y, packed, sketch)`` or None
    outside the envelope.  ``sigma``: (n, 1) random-sign array (the SAME
    signs the backward's jnp-side sketch of the output gradient uses).

    With ``sigma_x`` (a second (n,) sign vector), ALSO emits the
    countsketch of the input x — the up projection's own weight-gradient
    residual — riding the kernel's existing read of x; returns
    ``(y, packed, sketch_y, sketch_x)``.  Measured caveat: the
    (k_eff, kdim) VMEM-resident accumulator this needs costs more than the
    separate jnp pass it saves at headline shapes (+4.4% model step,
    docs/BENCHMARKS.md), so ``fewbit_ffn`` does NOT use it by default —
    it pays off only when x is wide relative to the VMEM headroom.
    Precision caveat: on the native path the x-sketch accumulates from the
    bf16-cast x the MXU consumes (the jnp ``_countsketch_signed`` it
    mirrors reads the original-dtype x), so a caller enabling ``sigma_x``
    on an f32 model gets a bf16-operand sketch — within the estimator's
    sampling noise, but not bit-identical to the default path."""
    if x.ndim != 2 or w.ndim != 2:
        return None
    n, kdim = x.shape
    _, m = w.shape
    if n % FFN_BN or m % FFN_BM or kdim % 128:
        return None
    if k_eff % FFN_BN or k_eff > n or n % k_eff:
        return None
    if x.dtype not in (jnp.float32.dtype, jnp.bfloat16.dtype):
        return None
    bk = _choose_bk(kdim)
    if bk is None:
        return None
    from fewbit_tpu.ops.activations import compare_codes

    if spec.bits > 6:
        return None
    if (spec.n_borders > 0 and spec.codes is not compare_codes
            and spec.name != "stepwise"):
        return None

    out_dtype = jnp.dtype(y_dtype) if y_dtype is not None else x.dtype
    sk_dt = sketch_dtype(x.dtype)  # policy keys on the MODEL dtype
    if x.dtype == jnp.float32.dtype and not _interpret_mode():
        x = x.astype(jnp.bfloat16)
        w = w.astype(jnp.bfloat16)

    bn, bm = FFN_BN, FFN_BM
    gr = bn // GROUP
    grid = (m // bm, n // bn, kdim // bk)
    slabs = k_eff // bn

    nb = max(spec.n_borders, 1)
    borders2 = jnp.zeros((1, nb), jnp.float32)
    if spec.n_borders:
        borders2 = borders.reshape(1, -1).astype(jnp.float32)
    bias2 = (bias if bias is not None else
             jnp.zeros((m,), jnp.float32)).reshape(1, m).astype(jnp.float32)
    sigma2 = sigma.reshape(n, 1).astype(jnp.float32)

    with_skx = sigma_x is not None
    kernel = functools.partial(
        _kernel_skx if with_skx else _kernel_no_skx, spec, bm, bk, grid[2],
        slabs)
    in_specs = [
        pl.BlockSpec((1, nb), lambda j, i, k: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((bn, bk), lambda j, i, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bm), lambda j, i, k: (k, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm), lambda j, i, k: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, 1), lambda j, i, k: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((bn, bm), lambda j, i, k: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((spec.bits, gr, bm), lambda j, i, k: (0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k_eff, bm), lambda j, i, k: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((n, m), out_dtype),
        jax.ShapeDtypeStruct((spec.bits, (n // bn) * gr, m), jnp.uint32),
        jax.ShapeDtypeStruct((k_eff, m), sk_dt),
    ]
    operands = [borders2, x, w, bias2, sigma2]
    if with_skx:
        in_specs.append(pl.BlockSpec((bn, 1), lambda j, i, k: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(sigma_x.reshape(n, 1).astype(jnp.float32))
        # Full-width (k_eff, kdim) block, constant index: resident in VMEM
        # for the whole grid, flushed once.
        out_specs.append(pl.BlockSpec((k_eff, kdim),
                                      lambda j, i, k: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((k_eff, kdim), sk_dt))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=[pltpu.VMEM((bn, bm), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * kdim + 4 * n * m,
            bytes_accessed=(n * kdim * grid[0] + kdim * m * grid[1])
            * x.dtype.itemsize + n * m * out_dtype.itemsize
            + spec.bits * n * m // 8 + k_eff * m * sk_dt.itemsize
            + (k_eff * kdim * sk_dt.itemsize if with_skx else 0),
            transcendentals=n * m,
        ),
        interpret=_interpret_mode(),
        compiler_params=_compiler_params(),
    )(*operands)
    if with_skx:
        y, packed, sk, skx = outs
        return y, packed, sk, skx
    y, packed, sk = outs
    return y, packed, sk


def _matmul_lut_bwd_kernel(spec, bm, n_k, slabs, levels_ref, g_ref, wt_ref,
                           packed_ref, sig_ref, dz_ref, sk_ref, db_ref,
                           acc_ref):
    i, k_idx = pl.program_id(1), pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(g_ref[:], wt_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k_idx == n_k - 1)
    def _epilogue():
        gr = FFN_BN // GROUP
        nlevels = 1 << spec.bits
        words = [packed_ref[b, :, :] for b in range(spec.bits)]
        dz_rows = []
        for g in range(GROUP):
            slot = jnp.uint32(1 << g)
            masks = [(words[b] & slot) != 0 for b in range(spec.bits)]
            vals = [levels_ref[0, k] for k in range(nlevels)]
            for mask in masks:
                vals = [jnp.where(mask, vals[2 * k + 1], vals[2 * k])
                        for k in range(len(vals) // 2)]
            dz_rows.append(vals[0] * acc_ref[g * gr:(g + 1) * gr, :])
        dz = jnp.concatenate(dz_rows, axis=0)
        dz_ref[:] = dz.astype(dz_ref.dtype)

        @pl.when(i == 0)
        def _db_init():
            db_ref[0, :] = jnp.sum(dz, axis=0)

        @pl.when(i > 0)
        def _db_acc():
            db_ref[0, :] += jnp.sum(dz, axis=0)

        _ffn_sketch_epilogue(i, slabs, dz, sig_ref, sk_ref)


def fused_matmul_lut_backward(spec, packed: jax.Array, levels: jax.Array,
                              g: jax.Array, wt: jax.Array,
                              sigma: jax.Array, k_eff: int,
                              dz_dtype=None, sk_dtype=None):
    """``dz = levels[codes] * (g @ wt)`` in one pass, emitting the
    countsketch of dz and the column sums ``db = sum_n dz``.

    ``g``: (N, H) output gradient; ``wt``: (H, M) — the down projection's
    weight already transposed (and pre-cast, with ``g``, to bf16 by the
    caller on the MXU path).  ``sk_dtype``: storage dtype of the dz sketch;
    because the caller may have pre-cast ``g``, it must pass the MODEL
    dtype's policy explicitly (defaults to :func:`sketch_dtype` of ``g``).
    Returns ``(dz, sketch, db)`` or None outside the envelope."""
    if g.ndim != 2 or wt.ndim != 2 or packed.ndim != 3:
        return None
    n, h = g.shape
    _, m = wt.shape
    if n % FFN_BN or m % FFN_BM or h % 128:
        return None
    if k_eff % FFN_BN or k_eff > n or n % k_eff:
        return None
    bk = _choose_bk(h)
    if bk is None:
        return None
    if spec.bits > 6:
        return None
    gr = FFN_BN // GROUP
    if packed.shape != (spec.bits, (n // FFN_BN) * gr, m):
        return None

    bn, bm = FFN_BN, FFN_BM
    grid = (m // bm, n // bn, h // bk)
    slabs = k_eff // bn
    out_dtype = jnp.dtype(dz_dtype) if dz_dtype is not None else g.dtype
    sk_dt = (jnp.dtype(sk_dtype) if sk_dtype is not None
             else sketch_dtype(g.dtype))

    levels2 = levels.reshape(1, -1).astype(jnp.float32)
    sigma2 = sigma.reshape(n, 1).astype(jnp.float32)

    kernel = functools.partial(_matmul_lut_bwd_kernel, spec, bm, grid[2],
                               slabs)
    out_shapes = (
        jax.ShapeDtypeStruct((n, m), out_dtype),
        jax.ShapeDtypeStruct((k_eff, m), sk_dt),
        jax.ShapeDtypeStruct((1, m), jnp.float32),
    )
    dz, sk, db = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, levels2.shape[1]), lambda j, i, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bn, bk), lambda j, i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bm), lambda j, i, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.bits, gr, bm), lambda j, i, k: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda j, i, k: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bn, bm), lambda j, i, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_eff, bm), lambda j, i, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda j, i, k: (0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((bn, bm), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * h + (spec.bits * 2 + (1 << spec.bits)) * n * m,
            bytes_accessed=(n * h * grid[0] + h * m * grid[1])
            * g.dtype.itemsize + n * m * out_dtype.itemsize
            + spec.bits * n * m // 8 + k_eff * m * sk_dt.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
        compiler_params=_compiler_params(),
    )(levels2, g, wt, packed, sigma2)
    return dz, sk, db


# ---------------------------------------------------------------------------
# jnp mirror of the block decode (fallback + testing).
# ---------------------------------------------------------------------------


def unpack_block_layout(packed: jax.Array, bits: int, shape) -> jax.Array:
    """Decode a block-layout packed residual back to per-element codes with
    plain jnp ops (the semantic mirror of the backward kernel)."""
    r, c = _flat_rc(shape)
    br, bc = _choose_blocks(r, c)
    gr = br // GROUP
    grid_r, grid_c = _cdiv(r, br), _cdiv(c, bc)
    rp, cp = grid_r * br, grid_c * bc

    codes = jnp.zeros((rp, cp), dtype=jnp.uint32)
    for blk in range(grid_r):
        block_words = packed[:, blk * gr:(blk + 1) * gr, :]  # (bits, gr, cp)
        for i in range(GROUP):
            code = jnp.zeros((gr, cp), dtype=jnp.uint32)
            for b in range(bits):
                code |= ((block_words[b] >> jnp.uint32(i)) & jnp.uint32(1)) \
                    << jnp.uint32(b)
            codes = codes.at[blk * br + i * gr: blk * br + (i + 1) * gr,
                             :].set(code)
    return codes[:r, :c].reshape(shape)


# ---------------------------------------------------------------------------
# Fused matmul + INPUT countsketch (+ column sum) — the sketched-linear
# kernel for blocks with no few-bit activation (attention QKV/out
# projections).
#
# RandomizedDense stores countsketch(x) as its backward residual and
# sketches the output gradient dy on the way back
# (functional/linear.py:_linear_grp_core_fwd/_bwd); both sketches are a
# full extra HBM pass over an (N, d) tensor that the adjacent matmul
# already streams.  This kernel rides the sketch on the matmul's own
# x-read:
#
#   forward:   y = x @ w (+ b)   AND   sk[b, :] = sum_{r = b mod k_eff} s_r x[r, :]
#   backward:  dx = dy @ w^T     AND   sketch(dy)   AND   db = sum_r dy[r, :]
#
# Geometry: with the stride partition (row r -> bucket r mod k_eff) and
# k_eff a multiple of the row block FFN_BN, the rows of block i all land in
# slab (i mod S), S = k_eff / FFN_BN, at within-slab offset = their local
# row — so the in-kernel sketch update is literally ``slab += signs * x``.
# The WHOLE weight stays resident in VMEM (its block index never changes,
# so Mosaic fetches it once) and x rides through in full-width row blocks:
# zero operand re-streaming, which is what makes the fusion strictly
# cheaper than matmul + separate sketch pass.  The grid is (slab s OUTER,
# pass c inner); x row-blocks are enumerated slab-major (block index
# c*S + s), the slab's (FFN_BN, kdim) accumulator lives in VMEM scratch
# across the c sweep, and each sketch output block is written exactly once.
# ---------------------------------------------------------------------------


def matmul_sketch_keff(n: int, kdim: int, m: int, k: int,
                       dtype) -> Optional[int]:
    """Envelope check for :func:`fused_matmul_input_sketch`; returns the
    aligned bucket count, or None when the caller must fall back to the
    unfused jnp path.  The kernel keeps the whole weight and full-width
    row blocks resident, so the envelope is a VMEM-budget estimate on top
    of the alignment requirements."""
    if jnp.dtype(dtype) not in (jnp.float32.dtype, jnp.bfloat16.dtype):
        return None
    # Width caps: measured on v5e, the fusion wins at attention-projection
    # widths (half the HBM passes beats the Mosaic-vs-XLA matmul gap) but
    # LOSES at FFN widths (>= 3072), where XLA's matmul is enough faster
    # that the saved sketch pass does not pay for it — tools/roofline.py
    # `measure_input_sketch` reproduces both sides.
    if n % FFN_BN or kdim % 128 or m % 128 or kdim > 1024 or m > 1024:
        return None
    k_eff = countsketch_aligned_keff(n, k)
    if k_eff is None or k_eff > n // 2:
        # A sketch that keeps more than half the rows saves little memory
        # and the fused write amplification is not worth it.
        return None
    est = (2 * FFN_BN * kdim * 2      # x block (bf16), double-buffered
           + kdim * m * 2             # whole w (bf16), resident
           + 2 * FFN_BN * m * 4       # y block out, double-buffered
           + FFN_BN * kdim * 4        # sketch accumulator (scratch)
           + FFN_BN * kdim * 4)       # sketch out block
    if est > 56 * 1024 * 1024:
        return None
    return k_eff


def _matmul_input_sketch_kernel(S, C, want_colsum, x_ref, w_ref,
                                bias_ref, sig_ref, y_ref, sk_ref, cs_ref,
                                sk_acc_ref, cs_acc_ref):
    s, c = pl.program_id(0), pl.program_id(1)

    xb = x_ref[:]
    y_ref[:] = (jnp.dot(xb, w_ref[:], preferred_element_type=jnp.float32)
                + bias_ref[0, :][None, :]).astype(y_ref.dtype)

    signed = xb.astype(jnp.float32) * sig_ref[:].astype(jnp.float32)

    @pl.when(c == 0)
    def _init_slab():
        sk_acc_ref[:] = signed

    @pl.when(c > 0)
    def _acc_slab():
        sk_acc_ref[:] += signed

    if want_colsum:
        colsum = jnp.sum(xb.astype(jnp.float32), axis=0, keepdims=True)

        @pl.when((s == 0) & (c == 0))
        def _init_cs():
            cs_acc_ref[:] = colsum

        @pl.when((s > 0) | (c > 0))
        def _acc_cs():
            cs_acc_ref[:] += colsum

    @pl.when(c == C - 1)
    def _emit_sketch():
        # Accumulation is f32 in scratch; only the store follows the
        # sketch-storage policy (bf16 for bf16 models).
        sk_ref[:] = sk_acc_ref[:].astype(sk_ref.dtype)

    if want_colsum:
        @pl.when((s == S - 1) & (c == C - 1))
        def _emit_colsum():
            cs_ref[:] = cs_acc_ref[:]


def fused_matmul_input_sketch(x: jax.Array, w: jax.Array, bias,
                              sigma: jax.Array, k_eff: int,
                              want_colsum: bool = False):
    """``x @ w (+ b)`` plus the stride-partition countsketch of ``x`` (and
    optionally the column sum of ``x``) in one HBM pass over ``x``.

    ``x``: (N, K); ``w``: (K, M); ``sigma``: (N,) or (N, 1) random signs.
    Returns ``(y, sketch)`` or ``(y, sketch, colsum)``; None outside the
    envelope (caller falls back).  ``sketch``: (k_eff, K) f32 with
    ``sketch[b] = sum_{r = b mod k_eff} sigma[r] * x[r]`` — exactly the
    partition the jnp sketch in ``functional/linear.py`` uses, so forward
    and backward sketches stay contraction-consistent.
    """
    if x.ndim != 2 or w.ndim != 2:
        return None
    n, kdim = x.shape
    _, m = w.shape
    if matmul_sketch_keff(n, kdim, m, k_eff, x.dtype) != k_eff:
        return None

    bn = FFN_BN
    S = k_eff // bn
    C = n // k_eff
    grid = (S, C)

    out_dtype = x.dtype
    sk_dt = sketch_dtype(x.dtype)  # policy keys on the MODEL dtype
    if x.dtype == jnp.float32.dtype and not _interpret_mode():
        # MXU precision policy matches fused_dense_act: XLA lowers f32
        # matmuls to bf16 passes on TPU; the sketch residual then also
        # accumulates from the bf16 operand (it feeds a randomized
        # estimator whose sketch noise dwarfs the cast).  Interpret mode
        # keeps f32 so jnp-parity tests compare exactly.
        x = x.astype(jnp.bfloat16)
        w = w.astype(jnp.bfloat16)

    bias2 = (bias if bias is not None else
             jnp.zeros((m,), jnp.float32)).reshape(1, m).astype(jnp.float32)
    sigma2 = sigma.reshape(n, 1).astype(jnp.float32)

    kernel = functools.partial(_matmul_input_sketch_kernel, S, C,
                               want_colsum)
    out_shapes = (
        jax.ShapeDtypeStruct((n, m), out_dtype),
        jax.ShapeDtypeStruct((k_eff, kdim), sk_dt),
        jax.ShapeDtypeStruct((1, kdim), jnp.float32),
    )
    y, sk, cs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, kdim), lambda s, c: (c * S + s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kdim, m), lambda s, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda s, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda s, c: (c * S + s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bn, m), lambda s, c: (c * S + s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, kdim), lambda s, c: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kdim), lambda s, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((bn, kdim), jnp.float32),
            pltpu.VMEM((1, kdim), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * kdim + 2 * n * kdim,
            bytes_accessed=n * kdim * x.dtype.itemsize
            + kdim * m * x.dtype.itemsize
            + n * m * jnp.dtype(out_dtype).itemsize
            + k_eff * kdim * sk_dt.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret_mode(),
        compiler_params=_compiler_params(),
    )(x, w, bias2, sigma2)
    if want_colsum:
        return y, sk, cs.reshape(kdim)
    return y, sk
