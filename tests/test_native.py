"""Native IQ stream engine tests (C++ via ctypes)."""
import numpy as np
import pytest

from liquid_usrp_tpu.io import native, streams


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def _rand_iq(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)


def test_cf32_roundtrip(tmp_path, lib_ok):
    x = _rand_iq(1000)
    p = str(tmp_path / "a.iq")
    native.write_file(p, x)
    back = native.read_file(p)
    np.testing.assert_array_equal(back, x)
    # interoperable with the NumPy path
    np.testing.assert_array_equal(streams.read_iq(p), x)


def test_sc16_roundtrip(tmp_path, lib_ok):
    # keep |I|,|Q| < 1.0: SC16 full scale clips at +-1
    rng = np.random.default_rng(1)
    x = (rng.uniform(-0.9, 0.9, 512) +
         1j * rng.uniform(-0.9, 0.9, 512)).astype(np.complex64)
    p = str(tmp_path / "a.sc16")
    native.write_file(p, x, fmt=native.FORMAT_SC16)
    back = native.read_file(p, fmt=native.FORMAT_SC16)
    np.testing.assert_allclose(back, x, atol=1.0 / 32767 * 2)


def test_block_reader(tmp_path, lib_ok):
    x = _rand_iq(10000, seed=3)
    p = str(tmp_path / "b.iq")
    native.write_file(p, x)
    got = []
    for blk in native.NativeReader(p, 4096):
        got.append(blk)
    out = np.concatenate(got)
    np.testing.assert_array_equal(out, x)


def test_native_writer_roundtrip(tmp_path):
    """NativeWriter blocks drain through the background thread and the file
    round-trips exactly (CF32) / within quantization (SC16)."""
    from liquid_usrp_tpu.io import native
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    x = (rng.uniform(-0.9, 0.9, 5000) +
         1j * rng.uniform(-0.9, 0.9, 5000)).astype(np.complex64)
    f32 = str(tmp_path / "w.cf32")
    with native.NativeWriter(f32) as w:
        for lo in range(0, len(x), 700):
            w.push(x[lo:lo + 700])
    back = native.read_file(f32)
    np.testing.assert_array_equal(back, x)
    s16 = str(tmp_path / "w.sc16")
    with native.NativeWriter(s16, fmt=native.FORMAT_SC16) as w:
        w.push(x)
    back = native.read_file(s16, native.FORMAT_SC16)
    np.testing.assert_allclose(back, x, atol=2.0 / 32767)


def test_cf32_to_bf16_planes_matches_mldtypes(lib_ok):
    """Native deinterleave+round == ml_dtypes RNE conversion, bit-exact
    (including ties: values like 1 + 2^-9 round to even)."""
    import ml_dtypes
    rng = np.random.default_rng(7)
    x = (rng.normal(size=4096) + 1j * rng.normal(size=4096)) \
        .astype(np.complex64)
    # inject exact-tie and edge values
    x[:6] = np.array([1.0 + 2.0 ** -9, -(1.0 + 3 * 2.0 ** -9),
                      0.0, -0.0, 1e-38, 65280.0], np.complex64)
    got = native.cf32_to_bf16_planes(x)
    want = np.stack([x.real, x.imag]).astype(ml_dtypes.bfloat16)
    assert got.dtype == ml_dtypes.bfloat16 and got.shape == (2, x.size)
    np.testing.assert_array_equal(got.view(np.uint16),
                                  want.view(np.uint16))


def test_bf16_planes_feed_iqfmt():
    """The native plane layout is exactly what ops/iqfmt consumes."""
    import jax.numpy as jnp
    from liquid_usrp_tpu.ops import iqfmt
    x = _rand_iq(257, seed=3)
    planes = native.cf32_to_bf16_planes(x)      # native or NumPy fallback
    back = np.asarray(iqfmt.iq_from_any(jnp.asarray(planes)))
    assert np.mean(np.abs(back - x) ** 2) < 1e-4 * np.mean(np.abs(x) ** 2)


def test_cf32_to_sc8_planes_matches_numpy(lib_ok):
    """Native deinterleave+quantize == NumPy round-half-even quantizer,
    bit-exact, including tie and clip cases."""
    rng = np.random.default_rng(8)
    x = (rng.uniform(-1.2, 1.2, 4096) +
         1j * rng.uniform(-1.2, 1.2, 4096)).astype(np.complex64)
    # exact .5-in-code-space ties + clip edges
    x[:4] = np.array([0.5 / 127, -1.5 / 127, 1.5, -2.0], np.complex64)
    got = native.cf32_to_sc8_planes(x)
    want = np.clip(np.round(np.stack([x.real, x.imag]) * 127.0),
                   -127, 127).astype(np.int8)
    assert got.dtype == np.int8 and got.shape == (2, x.size)
    np.testing.assert_array_equal(got, want)
