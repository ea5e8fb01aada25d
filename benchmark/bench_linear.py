"""RandomizedLinear sweep (north-star config 4; reference parity:
bench-linear.py): memory + step time of an MLP tower as a function of the
sketch compression ratio.

    python benchmark/bench_linear.py -f 'Linear/.*'
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from benchmark.harness import Benchmark, main  # noqa: E402


class BenchLinear(Benchmark):
    name = "Linear/{variant}/{rate}"
    params = {"variant": ["Baseline", "Randomized"],
              "rate": [0.05, 0.1, 0.2, 0.5]}

    def run(self, variant, rate):
        import jax
        import jax.numpy as jnp
        import optax

        from fewbit_tpu.models import MLP

        ratio = rate if variant == "Randomized" else None
        model = MLP(features=(3072, 3072, 3072, 768),
                    proj_dim_ratio=ratio)
        x = jax.random.normal(jax.random.key(0), (8192, 768))
        params = model.init(
            {"params": jax.random.key(1), "sketch": jax.random.key(2)}, x)
        tx = optax.sgd(1e-3)
        opt = tx.init(params)

        def step(params, opt, key):
            def loss(p):
                return jnp.mean(model.apply(
                    p, x, rngs={"sketch": key}) ** 2)
            l, g = jax.value_and_grad(loss)(params)
            updates, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, updates), opt, l

        jitted = jax.jit(step, donate_argnums=(0, 1))
        compiled = jitted.lower(params, opt, jax.random.key(3)).compile()
        mem = int(compiled.memory_analysis().temp_size_in_bytes)

        params, opt, l = compiled(params, opt, jax.random.key(4))
        jax.block_until_ready(l)
        t0 = time.perf_counter()
        for i in range(10):
            params, opt, l = compiled(params, opt, jax.random.key(5 + i))
        float(l)
        step_ms = (time.perf_counter() - t0) / 10 * 1e3
        return {"temp_mib": mem / 2**20, "step_ms": round(step_ms, 2)}


if __name__ == "__main__":
    sys.exit(main())
