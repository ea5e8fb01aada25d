"""Headline benchmark: RoBERTa-base training-step memory saving + overhead.

Compares the compiled training step of RoBERTa-base (MRPC-shaped batch) in
vanilla configuration vs the few-bit configuration (3-bit GELU +
RandomizedLinear at 20% sketch ratio) — the reference's README headline
setting, which it reports as a 32.7% peak-memory saving (11.30 -> 7.60 GiB,
``/root/reference/README.md:16-27``).

Memory: XLA's compiled ``memory_analysis().temp_size_in_bytes`` — the
device scratch of one step, i.e. activations/residuals between forward and
backward plus temporaries, the same "training memory minus params" delta the
reference measures via ``max_memory_allocated - memory_allocated``
(``benchmark/benchmark.py:165-188``).  Reported for f32 at bs=64 (the
headline) and bf16 at bs=64 AND bs=128 — the reference's own batch size,
which fits the 16 GiB chip in bf16.

Step time: INTERLEAVED A/B protocol.  Each variant's train step is wrapped
in a jitted ``lax.fori_loop`` of LOOP_ITERS steps (one dispatch per block,
so host/relay latency amortises to 1/LOOP_ITERS per step), and the vanilla/
fewbit blocks alternate A/B/A/B within one session — the chip's session-to-
session drift (~±10%, docs/BENCHMARKS.md) cancels out of the per-pair
deltas.  Reported: median per-step time of each side, plus the median and
min..max spread of the per-pair overhead.

Prints exactly ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
vs_baseline = our_saving_pct / 32.7 (reference headline; >1 beats it).
"""

import json
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


class _Timeout(Exception):
    pass


def _with_deadline(seconds, fn, *args, default=None):
    """Run fn under a SIGALRM deadline (the execution relay can stall for
    minutes); return default on expiry."""

    def handler(signum, frame):
        raise _Timeout()

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(int(seconds))
    try:
        return fn(*args)
    except _Timeout:
        log(f"deadline of {seconds}s expired")
        return default
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# MRPC-realistic shape: the reference headline (11.30 -> 7.60 GiB, -32.7%)
# is bs=128 with HF dynamic padding over short MRPC pairs (~tens of tokens);
# seq=128 covers nearly all pairs.  The batch ladder guards against the
# vanilla variant OOM-ing the 16 GiB chip (it needs ~3x the scratch of the
# few-bit variant in f32; in bf16 both fit at the reference's bs=128).
BATCH_LADDER = (64, 32, 16)
SEQ = 128
REF_SAVING_PCT = 32.7


LOOP_ITERS = 20
AB_PAIRS = 4


def probe_clock_state():
    """Classify the chip's bimodal clock state (docs/BENCHMARKS.md
    session-state caveat) by timing the reference XLA bf16 matmul
    (8192x768 @ 768x3072 — the same probe tools/roofline.py brackets
    with; measured 0.52 ms in the fast state, 1.41 ms in the slow one).
    Returns {"xla_matmul_ms": t, "state": "fast"|"mid"|"slow"} or None
    when the relay stalls."""
    from tools.timing import timed_loop, touch

    x = jax.random.normal(jax.random.key(0), (8192, 768), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (768, 3072), jnp.bfloat16)

    def body(i, c):
        return touch(c, c @ w)

    # 240s: the probe is the process's FIRST dispatch — cold relay
    # handshake + compile alone can eat >120s (observed), and a None here
    # loses the clock-state record for the whole artifact.
    t = _with_deadline(240, lambda: timed_loop(body, x))
    if t is None:
        return None
    ms = t * 1e3
    state = "fast" if ms < 0.8 else ("slow" if ms > 1.1 else "mid")
    log(f"clock-state probe: XLA bf16 matmul {ms:.3f} ms -> {state}")
    return {"xla_matmul_ms": round(ms, 3), "state": state}


def build(gelu_bits, proj_dim_ratio, batch_size, dtype=jnp.float32):
    from fewbit_tpu.models import (RobertaConfig,
                                   RobertaForSequenceClassification)
    from fewbit_tpu.train import TrainConfig, create_train_state, \
        make_train_step
    from fewbit_tpu.train import synthetic_glue

    cfg = RobertaConfig(gelu_bits=gelu_bits, proj_dim_ratio=proj_dim_ratio,
                        sketch="countsketch", dtype=dtype)
    model = RobertaForSequenceClassification(cfg)
    batch_np = next(synthetic_glue(batch_size, seq_len=SEQ,
                                   vocab_size=cfg.vocab_size))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state = create_train_state(
        model, TrainConfig(total_steps=100, learning_rate=1e-5), batch)
    from fewbit_tpu.util import tpu_compile_options

    step = make_train_step(model)
    jitted = jax.jit(step, donate_argnums=(0,))
    lowered = jitted.lower(state, batch, jax.random.key(0))
    compiled = lowered.compile(compiler_options=tpu_compile_options())
    return state, batch, step, compiled


def measure_mem(compiled):
    ma = compiled.memory_analysis()
    return int(ma.temp_size_in_bytes)


def build_loop(step, state, batch):
    """Compile ``LOOP_ITERS`` train steps as ONE on-device fori_loop."""
    from fewbit_tpu.util import tpu_compile_options

    def loop(state, batch, key):
        def body(i, carry):
            st, _ = carry
            st2, m = step(st, batch, jax.random.fold_in(key, i))
            return st2, m["loss"].astype(jnp.float32)

        return jax.lax.fori_loop(0, LOOP_ITERS, body,
                                 (state, jnp.zeros((), jnp.float32)))

    jitted = jax.jit(loop, donate_argnums=(0,))
    return jitted.lower(state, batch, jax.random.key(1)).compile(
        compiler_options=tpu_compile_options())


def measure_interleaved(loop_v, loop_f, sv, sf, batch, pairs=AB_PAIRS,
                        budget_s=280.0):
    """Alternate vanilla/fewbit fori_loop blocks A/B/A/B in one session.

    Returns (t_v list, t_f list) of per-step seconds, one entry per pair
    (each entry = one whole LOOP_ITERS block / LOOP_ITERS).
    """
    key = jax.random.key(1)
    sv, lv = loop_v(sv, batch, key)
    _ = float(lv)  # warm-up dispatch + real sync (readback)
    sf, lf = loop_f(sf, batch, key)
    _ = float(lf)
    t_v, t_f = [], []
    start = time.perf_counter()
    for r in range(pairs):
        t0 = time.perf_counter()
        sv, lv = loop_v(sv, batch, key)
        _ = float(lv)
        t_v.append((time.perf_counter() - t0) / LOOP_ITERS)
        t0 = time.perf_counter()
        sf, lf = loop_f(sf, batch, key)
        _ = float(lf)
        t_f.append((time.perf_counter() - t0) / LOOP_ITERS)
        if time.perf_counter() - start > budget_s:
            log(f"A/B budget reached after pair {r + 1}")
            break
    return t_v, t_f


def ab_stats(t_v, t_f):
    """Median per-step times and the per-pair overhead distribution."""
    deltas = [100.0 * (f / v - 1.0) for v, f in zip(t_v, t_f)]
    return {
        "vanilla_step_ms": round(float(np.median(t_v)) * 1e3, 2),
        "fewbit_step_ms": round(float(np.median(t_f)) * 1e3, 2),
        "overhead_pct_median": round(float(np.median(deltas)), 2),
        "overhead_pct_min": round(min(deltas), 2),
        "overhead_pct_max": round(max(deltas), 2),
        "pairs": len(deltas),
    }


def timed_pair(tag, batch, dtype, time_budget_s=600):
    """Build both variants at (batch, dtype); memory always, timing if the
    budget allows.  Returns a result dict (timing keys absent on stall)."""
    log(f"[{tag}] compiling vanilla step (bs={batch})...")
    sv, bv, step_v, comp_v = build(None, None, batch, dtype)
    mem_v = measure_mem(comp_v)
    log(f"[{tag}] vanilla temp: {mem_v / 2**30:.3f} GiB")
    log(f"[{tag}] compiling fewbit step (gelu3 + grp 0.2)...")
    sf, bf, step_f, comp_f = build(3, 0.2, batch, dtype)
    mem_f = measure_mem(comp_f)
    log(f"[{tag}] fewbit temp: {mem_f / 2**30:.3f} GiB")
    saving = 100.0 * (1.0 - mem_f / mem_v)
    log(f"[{tag}] memory saving: {saving:.1f}%")
    del comp_v, comp_f
    result = {"batch": batch, "seq": SEQ,
              "dtype": jnp.dtype(dtype).name,
              "vanilla_temp_bytes": mem_v, "fewbit_temp_bytes": mem_f,
              "mem_saving_pct": round(saving, 2)}

    log(f"[{tag}] compiling {LOOP_ITERS}-step timing loops...")
    # 7-minute compile deadline: the relay's slow state takes 4-6 minutes
    # for the bf16 bs=128 loop compile; memory rows never wait on this.
    loop_v = _with_deadline(420, build_loop, step_v, sv, bv)
    loop_f = (_with_deadline(420, build_loop, step_f, sf, bf)
              if loop_v is not None else None)
    if loop_f is not None:
        out = _with_deadline(320, measure_interleaved, loop_v, loop_f,
                             sv, sf, bv)
        if out is not None and out[0] and out[1]:
            stats = ab_stats(*out)
            result.update(stats)
            log(f"[{tag}] step time: vanilla {stats['vanilla_step_ms']} ms, "
                f"fewbit {stats['fewbit_step_ms']} ms (median "
                f"{stats['overhead_pct_median']:+.1f}%, "
                f"range {stats['overhead_pct_min']:+.1f}"
                f"..{stats['overhead_pct_max']:+.1f}% over "
                f"{stats['pairs']} pairs)")
            return result
    log(f"[{tag}] step timing unavailable (relay stalled)")
    return result


def main():
    log("backend:", jax.default_backend())
    clock = probe_clock_state()

    # Headline: f32 at the largest batch the chip fits in f32.
    headline = None
    last_exc = None
    for batch in BATCH_LADDER:
        try:
            headline = timed_pair("f32", batch, jnp.float32)
            break
        except Exception as exc:  # noqa: BLE001 — OOM at this batch size
            last_exc = exc
            log(f"bs={batch} failed ({type(exc).__name__}); trying smaller")
    if headline is None:
        log("every batch size in the ladder failed; re-raising the last "
            "error instead of masking it")
        raise last_exc
    saving_pct = headline["mem_saving_pct"]

    # bf16 rows: where the epilogue overhead is relatively largest, incl.
    # the reference's own bs=128 (fits the 16 GiB chip in bf16).
    extras = []
    for batch in (headline["batch"], 128):
        try:
            extras.append(timed_pair("bf16", batch, jnp.bfloat16))
        except Exception as exc:  # noqa: BLE001
            log(f"bf16 bs={batch} failed: {type(exc).__name__}: {exc}")

    clock_end = probe_clock_state()
    print(json.dumps({
        "metric": "roberta_base_train_step_mem_saving",
        "value": saving_pct,
        "unit": "percent",
        "vs_baseline": round(saving_pct / REF_SAVING_PCT, 3),
        "detail": {"clock_state": clock, "clock_state_end": clock_end,
                   "headline_f32": headline, "bf16": extras},
    }))


if __name__ == "__main__":
    main()
