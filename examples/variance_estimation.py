"""Pick a sketch compression ratio from gradient-variance estimates
(reference parity: notebooks/randomized-backward variance estimation +
modules/variance.py usage).

Wraps a RandomizedDense in a VarianceEstimator, runs a few steps, and prints
the input/grad correlation plus SGD-vs-RMM variance: choose the largest
compression whose RMM (sketch) variance stays below the SGD (mini-batch)
variance.

    python examples/variance_estimation.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import fewbit_tpu.modules as M

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2048, 256), jnp.float32)
    target = jnp.asarray(rng.randn(2048, 64), jnp.float32)

    print(f"{'ratio':>6} {'corr':>8} {'var_sgd':>12} {'var_rmm':>12} "
          f"{'rmm/sgd':>8}")
    for ratio in (0.02, 0.05, 0.1, 0.2, 0.5):
        state = M.VarianceEstimatorState()
        layer = M.RandomizedDense(features=64, proj_dim_ratio=ratio)
        wrapped = M.VarianceEstimator(layer=layer, state=state)
        params = wrapped.init(
            {"params": jax.random.key(0), "sketch": jax.random.key(1)}, x)

        def loss(p):
            y = wrapped.apply(p, x, rngs={"sketch": jax.random.key(2)})
            return jnp.mean((y - target) ** 2)

        jax.grad(loss)(params)
        jax.effects_barrier()
        corr, var_sgd, var_rmm = state.variance
        print(f"{ratio:>6.2f} {corr:>8.4f} {var_sgd:>12.4e} "
              f"{var_rmm:>12.4e} {var_rmm/var_sgd:>8.3f}")


if __name__ == "__main__":
    main()
