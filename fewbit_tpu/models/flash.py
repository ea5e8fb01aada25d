"""Flash-attention block-size tuning shared by the RoBERTa/GPT models.

The Pallas TPU flash kernel defaults to 128-wide q/k blocks with
``block_b=1`` — at long sequence every (batch, head) grid cell runs thin
``(128, d_head) @ (d_head, 128)`` matmuls, which is exactly the cost the
round-4 measurement attributed the +44% step-time overhead at seq=1024 to
(docs/BENCHMARKS.md flash section).  ``resolve_block_sizes`` maps a simple
``(block_q, block_kv)`` knob — or the per-sequence tuned table measured by
``tools/tune_flash.py`` on the real chip — onto the kernel's full
11-field ``BlockSizes``.

Reference: none — the reference library has no attention code at all
(SURVEY §1 L8); this is a beat-the-reference long-context tool.
"""

from __future__ import annotations

from typing import Optional, Tuple

__all__ = ("resolve_block_sizes", "use_flash", "auto_blocks",
           "TUNED_BLOCKS", "FLASH_AUTO_MIN_SEQ")

# Measured crossover (docs/BENCHMARKS.md flash section,
# artifacts/flash_crossover_r05.txt): at the model level seq=128 loses on
# both axes; the attention-only micro sweep shows flash with full-seq
# blocks still 1.16-1.19x the standard einsum at seq=256/512 and 0.72x
# at seq=1024 — so 1024 is the measured threshold, not a guess.
FLASH_AUTO_MIN_SEQ = 1024


def validate_flash_setting(setting) -> None:
    """Reject anything but False/None/True/"auto" — called from the model
    configs' ``__post_init__`` so a typo like ``"Auto"`` fails at
    construction, not silently off-TPU or mid-training on TPU."""
    if setting not in (True, False, None, "auto"):
        raise ValueError(
            f"flash_attention must be True, False, or 'auto'; "
            f"got {setting!r}")


def use_flash(setting, seq_len: int, attention_dropout: float,
              backend: Optional[str] = None,
              deterministic: bool = False) -> bool:
    """Resolve a ``flash_attention`` config value at trace time.

    ``setting``: False (never), True (always — config validation already
    guaranteed ``attention_dropout == 0``), or ``"auto"`` — enable exactly
    where the measurements say flash wins both axes: on TPU, at
    ``seq_len >= FLASH_AUTO_MIN_SEQ``, and only when dropout would not be
    applied — either ``attention_dropout == 0`` or a ``deterministic``
    (eval) trace, where the kernel is semantically identical and the
    measured 2x-speed/−47%-memory win applies regardless of the training
    dropout setting.
    """
    validate_flash_setting(setting)
    if setting is False or setting is None:
        return False
    if backend is None:
        import jax

        backend = jax.default_backend()
    if backend != "tpu":
        return False
    if setting is True:
        return True
    return ((deterministic or attention_dropout == 0.0)
            and seq_len >= FLASH_AUTO_MIN_SEQ
            and auto_blocks(seq_len) is not None)

# Per-sequence-length tuned (block_q, block_kv), measured by
# tools/tune_flash.py with the bracketed fori-loop protocol on TPU v5e
# (artifacts/tune_flash_r05.jsonl; docs/BENCHMARKS.md flash section).
# Attention fwd+bwd at bs=8/heads=12/d=64: seq=1024 default 7.8 ms ->
# 2.81 ms at (1024, 1024); seq=2048 default 27.6 ms -> 6.64 ms.  Bigger
# blocks win monotonically up to the full sequence at these lengths
# (fewer grid cells, fatter MXU matmuls).  The CAUSAL kernel (GPT) was
# swept separately and picks the same winner (0.48x/0.33x of default at
# 1024/2048) — the bigger-block win beats the finer-grained masked-block
# skipping smaller blocks would allow, so one table serves both kernels.
# Sequences not listed get ``auto_blocks`` (the same bigger-is-better rule
# generalised), never the kernel's measured-2x-slower 128-wide defaults.
TUNED_BLOCKS = {
    1024: (1024, 1024),
    2048: (1024, 1024),
}

# Bigger blocks won monotonically in the sweep, but 1024 beat 2048-wide
# full-seq blocks at seq=2048 (artifacts/tune_flash_r05.jsonl) — cap there.
_MAX_AUTO_BLOCK = 1024


def auto_blocks(seq_len: int) -> Optional[Tuple[int, int]]:
    """Generalise the tuned table to any sequence length: the largest
    lane-aligned (multiple-of-128) block <= 1024 that divides ``seq_len``
    (the kernel requires seq % block == 0).  Returns None when no such
    block exists (seq not a multiple of 128) — callers must then use the
    standard attention path, NOT the kernel defaults: the untuned
    128-wide defaults measured ~2x SLOWER than standard attention at
    seq=1024 (artifacts/flash_crossover_r05.txt), the exact regression
    ``flash_attention='auto'`` exists to avoid."""
    start = (min(_MAX_AUTO_BLOCK, seq_len) // 128) * 128
    for b in range(start, 0, -128):
        if seq_len % b == 0:
            return (b, b)
    return None


def resolve_block_sizes(seq_len: int,
                        blocks: Optional[Tuple[int, int]] = None):
    """Return a ``fa.BlockSizes`` for ``seq_len``, or None for defaults.

    ``blocks``: explicit ``(block_q, block_kv)`` override from model config;
    otherwise the tuned table is consulted, then ``auto_blocks`` for
    untabulated lengths.  Both values are clamped to the sequence length;
    the kv block also feeds the major (outer) kv loop so a full-width kv
    block turns the inner loop into one pass.
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    if blocks is None:
        blocks = TUNED_BLOCKS.get(seq_len) or auto_blocks(seq_len)
    if blocks is None:
        return None
    bq, bkv = (min(int(blocks[0]), seq_len), min(int(blocks[1]), seq_len))
    return fa.BlockSizes(
        block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkv, block_k_dkv=bkv,
        block_q_dkv=bq, block_k_major_dq=bkv, block_k_dq=bkv,
        block_q_dq=bq)
