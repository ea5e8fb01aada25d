"""RoBERTa training benchmarks (reference parity: bench-roberta.py /
bench-linear.py): peak training memory + step time over
{Baseline, Quantized, Randomized, Both} x batch size.

Memory = compiled step ``temp_size_in_bytes`` (activations/residuals +
temporaries); time = amortised on-device step time.

    python benchmark/bench_roberta.py -f 'RoBERTa/.*/64'
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from benchmark.harness import Benchmark, main  # noqa: E402

VARIANTS = {
    "Baseline": dict(gelu_bits=None, proj_dim_ratio=None),
    "Quantized": dict(gelu_bits=3, proj_dim_ratio=None),
    "Randomized": dict(gelu_bits=None, proj_dim_ratio=0.2),
    "Both": dict(gelu_bits=3, proj_dim_ratio=0.2),
}


class BenchRoberta(Benchmark):
    name = "RoBERTa/{variant}/{batch}"
    params = {"variant": list(VARIANTS), "batch": [16, 64]}
    seq = 512

    def run(self, variant, batch):
        import jax

        from fewbit_tpu.models import (RobertaConfig,
                                       RobertaForSequenceClassification)
        from fewbit_tpu.train import (TrainConfig, create_train_state,
                                      make_train_step, synthetic_glue)

        cfg = RobertaConfig(**VARIANTS[variant])
        model = RobertaForSequenceClassification(cfg)
        raw = next(synthetic_glue(batch, seq_len=self.seq,
                                  vocab_size=cfg.vocab_size))
        import jax.numpy as jnp

        batch_arrays = {k: jnp.asarray(v) for k, v in raw.items()}
        state = create_train_state(
            model, TrainConfig(total_steps=100), batch_arrays)
        step = jax.jit(make_train_step(model), donate_argnums=(0,))
        compiled = step.lower(state, batch_arrays,
                              jax.random.key(0)).compile()
        mem = int(compiled.memory_analysis().temp_size_in_bytes)

        key = jax.random.key(1)
        state, m = compiled(state, batch_arrays, key)
        jax.block_until_ready(m["loss"])
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = compiled(state, batch_arrays, key)
        float(m["loss"])
        step_ms = (time.perf_counter() - t0) / iters * 1e3
        return {"temp_gib": mem / 2**30, "step_ms": round(step_ms, 2)}


class Sanity(Benchmark):
    name = "Sanity/Check"
    params = {}

    def run(self):
        return {"ok": 1}


if __name__ == "__main__":
    sys.exit(main())
