"""Quantizer tests: golden 3-bit GELU values and DP cross-check.

Golden borders/levels are the published reference values
(/root/reference/fewbit/approx_test.py:23-31).
"""

import numpy as np
import pytest
from scipy.special import erf

from fewbit_tpu.approx import Stepwise, approximate, dp_quantize, estimate_error

GOLDEN_BORDERS = np.array([
    -2.39798704e+00, -7.11248159e-01, -3.26290283e-01, -1.55338428e-04,
    3.26182064e-01, 7.10855860e-01, 2.39811567e+00,
])
GOLDEN_LEVELS = np.array([
    -0.00260009, -0.08883533, 0.1251944, 0.37204148, 0.6277958,
    0.87466175, 1.08880716, 1.00259936,
])


def gelu(x):
    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def gelu_grad(x):
    return 0.5 * (1.0 + erf(x / np.sqrt(2.0))) + x * np.exp(
        -0.5 * x ** 2) / np.sqrt(2.0 * np.pi)


KWARGS = dict(
    fn=gelu_grad,
    fn_prim=gelu,
    cardinality=8,
    parity=False,
    max_iters=2000,
    beps=1e-6,
    leps=1e-6,
    domain=(-100.0, 100.0),
    random_state=42,
)


class TestApproximate:

    def test_golden_gelu3(self):
        approx, info = approximate(**KWARGS)
        assert info["status"] == "converged"
        assert np.linalg.norm(approx.borders[1:-1] - GOLDEN_BORDERS) < 0.05
        assert np.linalg.norm(approx.levels - GOLDEN_LEVELS) < 0.005

    def test_parity_matches_right_half(self):
        kwargs = {**KWARGS, "cardinality": 4, "parity": True,
                  "domain": (0.0, 100.0)}
        approx, info = approximate(**kwargs)
        assert info["status"] == "converged"
        # Right half of the full 8-level solution.
        assert np.linalg.norm(approx.borders[:-1] - GOLDEN_BORDERS[3:]) < 0.05
        assert np.linalg.norm(approx.levels - GOLDEN_LEVELS[4:]) < 0.005

    def test_parity_requires_zero_origin(self):
        with pytest.raises(ValueError):
            approximate(**{**KWARGS, "parity": True, "domain": (-1.0, 1.0)})

    def test_deterministic_for_fixed_seed(self):
        a, _ = approximate(**KWARGS)
        b, _ = approximate(**KWARGS)
        np.testing.assert_array_equal(a.levels, b.levels)
        np.testing.assert_array_equal(a.borders, b.borders)


class TestStepwise:

    def test_eval_and_codes(self):
        sw = Stepwise(np.array([-10.0, 0.0, 10.0]), np.array([1.0, 2.0]))
        xs = np.array([-5.0, -0.1, 0.0, 0.1, 5.0])
        np.testing.assert_array_equal(sw(xs), [1.0, 1.0, 2.0, 2.0, 2.0])
        np.testing.assert_array_equal(sw.codes(xs), [0, 0, 1, 1, 1])

    def test_shape_validation(self):
        with pytest.raises(ValueError):
            Stepwise(np.zeros(3), np.zeros(3))


class TestDP:

    def test_dp_close_to_lloyd(self):
        """DP on a fine lattice should reach error <= Lloyd's (both near-opt)."""
        lloyd, info = approximate(**{**KWARGS, "domain": (-12.0, 12.0)})
        assert info["status"] == "converged"
        dp = dp_quantize(gelu_grad, 8, domain=(-12.0, 12.0), lattice=2048)
        err_lloyd, _ = estimate_error(gelu_grad, lloyd)
        err_dp, _ = estimate_error(gelu_grad, dp)
        assert err_dp <= err_lloyd * 1.10
        # Interior structure should roughly agree.
        assert np.max(np.abs(dp.borders[1:-1] - lloyd.borders[1:-1])) < 0.25

    def test_dp_exact_on_step_function(self):
        """A function that is already 2-piece constant is recovered exactly."""
        fn = lambda x: np.where(x < 0, 1.0, 3.0)
        dp = dp_quantize(fn, 2, domain=(-4.0, 4.0), lattice=64)
        np.testing.assert_allclose(sorted(dp.levels), [1.0, 3.0], atol=1e-9)
        assert abs(dp.borders[1]) < 0.2


class TestEstimateError:

    def test_zero_for_perfect_fit(self):
        fn = lambda x: np.where(x < 0, -1.0, 1.0)
        sw = Stepwise(np.array([-5.0, 0.0, 5.0]), np.array([-1.0, 1.0]))
        total, per = estimate_error(fn, sw)
        # Only the interval-endpoint samples at the jump contribute.
        assert total < 5e-3
