"""Golden tests for the GF(2)-linear CRC kernels against zlib/binascii."""
import binascii
import os
import zlib

import numpy as np
import pytest

import jax.numpy as jnp

from liquid_usrp_tpu.ops import crc


def _crc16_arc_oracle(data: bytes) -> int:
    """Bit-serial CRC-16/ARC, independent of the module's own oracle."""
    reg = 0
    for b in data:
        reg ^= b
        for _ in range(8):
            if reg & 1:
                reg = (reg >> 1) ^ 0xA001
            else:
                reg >>= 1
    return reg


@pytest.mark.parametrize("n", [0, 1, 2, 9, 64, 257, 1200])
def test_crc32_matches_zlib(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, size=n, dtype=np.uint8)
    got = int(crc.crc_compute(crc.CRC_32, jnp.asarray(data)))
    assert got == zlib.crc32(data.tobytes())


@pytest.mark.parametrize("n", [0, 1, 3, 17, 200])
def test_crc16_matches_oracle(n):
    rng = np.random.default_rng(100 + n)
    data = rng.integers(0, 256, size=n, dtype=np.uint8)
    got = int(crc.crc_compute(crc.CRC_16, jnp.asarray(data)))
    assert got == _crc16_arc_oracle(data.tobytes())


def test_crc32_known_vector():
    # "123456789" — the canonical check value 0xCBF43926
    data = jnp.asarray(np.frombuffer(b"123456789", dtype=np.uint8))
    assert int(crc.crc_compute(crc.CRC_32, data)) == 0xCBF43926


def test_crc16_known_vector():
    data = jnp.asarray(np.frombuffer(b"123456789", dtype=np.uint8))
    assert int(crc.crc_compute(crc.CRC_16, data)) == 0xBB3D  # CRC-16/ARC


def test_batched():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(5, 33), dtype=np.uint8)
    got = np.asarray(crc.crc_compute(crc.CRC_32, jnp.asarray(data)))
    want = np.array([zlib.crc32(row.tobytes()) for row in data])
    np.testing.assert_array_equal(got, want)


def test_masked_matches_static():
    rng = np.random.default_rng(7)
    buf = rng.integers(0, 256, size=64, dtype=np.uint8)
    for scheme in (crc.CRC_16, crc.CRC_32):
        for n in (0, 1, 30, 64):
            got = int(crc.crc_compute_masked(scheme, jnp.asarray(buf),
                                             jnp.int32(n)))
            want = int(crc.crc_compute(scheme, jnp.asarray(buf[:n])))
            assert got == want, (scheme, n)


def test_append_check_roundtrip():
    rng = np.random.default_rng(3)
    data = jnp.asarray(rng.integers(0, 256, size=40, dtype=np.uint8))
    for scheme in (crc.CRC_NONE, crc.CRC_16, crc.CRC_32):
        framed = crc.crc_append(scheme, data)
        assert bool(crc.crc_check(scheme, framed))
        if scheme != crc.CRC_NONE:
            corrupted = framed.at[3].set(framed[3] ^ 1)
            assert not bool(crc.crc_check(scheme, corrupted))
