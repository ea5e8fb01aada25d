"""Bit-plane codec: exhaustive roundtrip and density properties.

Mirrors the reference native codec test strategy (randomized widths,
roundtrip — /root/reference/fewbit/cpu/codec_test.cc:9-51) at widths 1..8.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fewbit_tpu.ops.bitpack import (GROUP, pack_codes, packed_nbytes,
                                    packed_num_words, unpack_codes)


@pytest.mark.parametrize("bits", [1, 2, 3, 4, 5, 8])
@pytest.mark.parametrize("n", [32, 256, 1024, 333, 31, 1])
def test_roundtrip(bits, n):
    rng = np.random.RandomState(bits * 1000 + n)
    codes = rng.randint(0, 1 << bits, size=n).astype(np.uint32)
    packed = pack_codes(jnp.asarray(codes), bits)
    assert packed.dtype == jnp.uint32
    assert packed.shape == (bits, packed_num_words(n, bits))
    out = np.asarray(unpack_codes(packed, bits, n))
    np.testing.assert_array_equal(out, codes)


def test_density_matches_reference():
    # fp32 4 B/elem -> bits/8 B/elem, same as the reference stream codec
    # (cuda/activation.cc:349-356): at 3 bits a 32x..10.7x reduction.
    n = 1 << 20
    assert packed_nbytes(n, 3) == 3 * n // 8
    assert packed_nbytes(n, 1) == n // 8
    assert packed_nbytes(n, 4) == n // 2


def test_pack_is_jittable_and_stable():
    codes = jnp.arange(64, dtype=jnp.uint32) % 8
    eager = pack_codes(codes, 3)
    jitted = jax.jit(lambda c: pack_codes(c, 3))(codes)
    np.testing.assert_array_equal(np.asarray(eager), np.asarray(jitted))


def test_plane_structure():
    # All-ones codes at 2 bits: plane 0 full ones, plane 1 zeros.
    codes = jnp.ones((GROUP,), dtype=jnp.uint32)
    packed = np.asarray(pack_codes(codes, 2))
    assert packed[0, 0] == 0xFFFFFFFF
    assert packed[1, 0] == 0


def test_rejects_bad_shapes():
    with pytest.raises(ValueError):
        pack_codes(jnp.zeros((4, 4), jnp.uint32), 2)
    with pytest.raises(ValueError):
        unpack_codes(jnp.zeros((3, 4), jnp.uint32), 2, 8)
