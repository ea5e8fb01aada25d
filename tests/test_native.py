"""Native host codec: build, roundtrip, and cross-validation against the
JAX bit-plane codec (the native library is the independent oracle)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fewbit_tpu import native
from fewbit_tpu.ops.bitpack import pack_codes, unpack_codes


def test_native_builds():
    assert native.available(), "g++ toolchain expected in this image"


@pytest.mark.parametrize("bits", [1, 2, 3, 4, 7])
@pytest.mark.parametrize("n", [1, 31, 32, 1000, 1 << 16])
def test_plane_roundtrip(bits, n):
    rng = np.random.RandomState(bits + n)
    codes = rng.randint(0, 1 << bits, size=n).astype(np.uint32)
    packed = native.plane_pack(codes, bits)
    out = native.plane_unpack(packed, bits, n)
    np.testing.assert_array_equal(out, codes)


@pytest.mark.parametrize("bits", [1, 3, 4])
def test_plane_matches_jax_codec(bits):
    rng = np.random.RandomState(7)
    codes = rng.randint(0, 1 << bits, size=4096).astype(np.uint32)
    native_packed = native.plane_pack(codes, bits)
    jax_packed = np.asarray(pack_codes(jnp.asarray(codes), bits))
    np.testing.assert_array_equal(native_packed, jax_packed)
    # And the cross-unpack.
    np.testing.assert_array_equal(
        np.asarray(unpack_codes(jnp.asarray(native_packed), bits, 4096)),
        codes)


@pytest.mark.parametrize("width", [1, 2, 3, 5, 8, 12, 17, 32])
def test_stream_roundtrip(width):
    rng = np.random.RandomState(width)
    n = 777
    hi = (1 << width) if width < 32 else (1 << 32)
    codes = rng.randint(0, hi, size=n, dtype=np.uint64).astype(np.uint32)
    stream = native.stream_pack(codes, width)
    assert stream.size == (n * width + 7) // 8
    out = native.stream_unpack(stream, n, width)
    np.testing.assert_array_equal(out, codes)


def test_stream_density():
    codes = np.zeros(64, np.uint32)
    assert native.stream_pack(codes, 3).size == 24  # 3 bits/elem exactly


def test_save_load_packed(tmp_path):
    rng = np.random.RandomState(0)
    codes = rng.randint(0, 8, size=(33, 17)).astype(np.uint32)
    path = tmp_path / "codes.npz"
    native.save_packed(path, codes, 3)
    out = native.load_packed(path)
    np.testing.assert_array_equal(out, codes)
    # On-disk compression beats raw int32 by a wide margin.
    raw_bytes = codes.size * 4
    assert path.stat().st_size < raw_bytes
