"""Flash-attention block-size sweep on the real chip.

Round 4 measured the flash path at +44% model step time for its −45%
memory at bs=8/seq=1024 — with the kernel's default 128-wide blocks
(``block_b=1``), i.e. thin per-(batch, head) matmuls.  This tool sweeps
``(block_q, block_kv)`` for the attention fwd+bwd in isolation, each
candidate BRACKETED by adjacent timings of the default-block kernel so the
chip's clock drift cancels (the roofline protocol), and prints one JSON
line per (seq, combo).  Winners land in
``fewbit_tpu/models/flash.py:TUNED_BLOCKS``.

    python tools/tune_flash.py [--seqs 1024,2048] [--batch 8] [--iters 30]
"""

import argparse
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, str(Path(__file__).parent.parent))

HEADS, D_HEAD = 12, 64

COMBOS = [
    None,              # kernel defaults (128/128), the bracket baseline
    (256, 256),
    (256, 512),
    (512, 512),
    (512, 1024),
    (1024, 1024),
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Shared traced-trip-count + readback-sync protocol (tools/timing.py).
from tools.timing import timed_loop  # noqa: E402


def attention_body(blocks, seq, batch, causal=False):
    from fewbit_tpu.models.flash import resolve_block_sizes

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    bs = resolve_block_sizes(seq, blocks) if blocks is not None else None
    k = jax.random.normal(jax.random.key(1), (batch, HEADS, seq, D_HEAD),
                          jnp.float32)
    v = jax.random.normal(jax.random.key(2), (batch, HEADS, seq, D_HEAD),
                          jnp.float32)

    def fwd_bwd(q):
        def f(qq):
            return fa.flash_attention(qq, k, v, causal=causal,
                                      sm_scale=D_HEAD ** -0.5,
                                      block_sizes=bs).sum()

        return jax.grad(f)(q)

    def body(i, q):
        dq = fwd_bwd(q)
        patch = (dq[:1, :1, :1, :1] * 1e-9).astype(q.dtype)
        return lax.dynamic_update_slice(q, patch, (0, 0, 0, 0))

    q0 = jax.random.normal(jax.random.key(0), (batch, HEADS, seq, D_HEAD),
                           jnp.float32)
    return body, q0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", default="1024,2048")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--causal", action="store_true",
                    help="sweep the causal (GPT) kernel instead")
    args = ap.parse_args()
    log("backend:", jax.default_backend())

    for seq in (int(s) for s in args.seqs.split(",")):
        base_body, base_q = attention_body(None, seq, args.batch,
                                           args.causal)
        for combo in COMBOS:
            if combo is None:
                continue
            if combo[0] > seq or combo[1] > seq:
                continue
            body, q0 = attention_body(combo, seq, args.batch, args.causal)
            try:
                t0 = timed_loop(base_body, base_q, args.iters)
                t = timed_loop(body, q0, args.iters)
                t1 = timed_loop(base_body, base_q, args.iters)
            except Exception as exc:  # noqa: BLE001 — combo may not compile
                print(json.dumps({"seq": seq, "batch": args.batch,
                                  "causal": args.causal,
                                  "blocks": list(combo),
                                  "error": f"{type(exc).__name__}: {exc}"}),
                      flush=True)
                continue
            base = (t0 + t1) / 2
            row = {"seq": seq, "batch": args.batch, "causal": args.causal,
                   "blocks": list(combo),
                   "ms": round(t * 1e3, 3),
                   "default_ms": round(base * 1e3, 3),
                   "vs_default": round(t / base, 3)}
            print(json.dumps(row), flush=True)
            log(f"seq={seq} blocks={combo}: {row['ms']} ms "
                f"({row['vs_default']}x default {row['default_ms']} ms)")


if __name__ == "__main__":
    main()
