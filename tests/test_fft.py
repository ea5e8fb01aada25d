"""DCT vs the scipy oracle, across types, norms, axes, and roundtrips
(mirrors reference test strategy, /root/reference/fewbit/fft_test.py)."""

import numpy as np
import pytest
import scipy.fft

import jax.numpy as jnp

from fewbit_tpu.fft import dct, idct


@pytest.mark.parametrize("n", [4, 7, 16, 33, 128])
@pytest.mark.parametrize("type", [2, 3])
@pytest.mark.parametrize("norm", ["backward", "forward", "ortho"])
def test_dct_matches_scipy(n, type, norm):
    x = np.random.RandomState(n * type).randn(3, n).astype(np.float32)
    ours = np.asarray(dct(jnp.asarray(x), type=type, norm=norm))
    ref = scipy.fft.dct(x, type=type, norm=norm, axis=-1)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("type", [2, 3])
@pytest.mark.parametrize("norm", ["backward", "forward", "ortho"])
def test_idct_matches_scipy(type, norm):
    x = np.random.RandomState(1).randn(5, 24).astype(np.float32)
    ours = np.asarray(idct(jnp.asarray(x), type=type, norm=norm))
    ref = scipy.fft.idct(x, type=type, norm=norm, axis=-1)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("norm", ["backward", "forward", "ortho"])
def test_roundtrip(norm):
    x = np.random.RandomState(2).randn(6, 40).astype(np.float32)
    back = np.asarray(idct(dct(jnp.asarray(x), norm=norm), norm=norm))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_axis_argument():
    x = np.random.RandomState(3).randn(12, 5).astype(np.float32)
    ours = np.asarray(dct(jnp.asarray(x), axis=0, norm="ortho"))
    ref = scipy.fft.dct(x, type=2, norm="ortho", axis=0)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_orthonormality():
    # ortho DCT-II preserves inner products (Parseval) — the property the
    # randomized-linear sketch relies on.
    rng = np.random.RandomState(4)
    a = rng.randn(64, 8).astype(np.float32)
    b = rng.randn(64, 8).astype(np.float32)
    da = np.asarray(dct(jnp.asarray(a), axis=0, norm="ortho"))
    db = np.asarray(dct(jnp.asarray(b), axis=0, norm="ortho"))
    np.testing.assert_allclose(da.T @ db, a.T @ b, atol=1e-3)


class TestFWHT:
    """Kronecker-factored Walsh-Hadamard transform (the srht sketch core)."""

    def test_matches_dense_hadamard(self):
        import numpy as np
        from fewbit_tpu.fft import fwht, _hadamard

        rng = np.random.RandomState(7)
        for n in (1, 2, 8, 64, 128):
            x = jnp.asarray(rng.randn(n, 5), jnp.float32)
            want = _hadamard(n) @ np.asarray(x) / np.sqrt(n)
            got = np.asarray(fwht(x, norm="ortho"))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_orthonormal_involution(self):
        import numpy as np
        from fewbit_tpu.fft import fwht

        rng = np.random.RandomState(8)
        x = jnp.asarray(rng.randn(256, 3), jnp.float32)
        np.testing.assert_allclose(np.asarray(fwht(fwht(x))), np.asarray(x),
                                   rtol=1e-4, atol=1e-4)

    def test_rejects_non_power_of_two(self):
        import numpy as np
        import pytest
        from fewbit_tpu.fft import fwht

        with pytest.raises(ValueError):
            fwht(jnp.zeros((6, 2), jnp.float32))
