"""Direct unit tests for AGC, spectrogram, and ring-log ops."""
import numpy as np

import jax.numpy as jnp

from liquid_usrp_tpu.ops import agc, spectrum, window


def test_agc_converges_to_unity():
    rng = np.random.default_rng(0)
    x = (3.5 * (rng.normal(size=8192) + 1j * rng.normal(size=8192)) /
         np.sqrt(2)).astype(np.complex64)
    st = agc.agc_init(bandwidth=0.02)
    st, y, level, rssi = agc.agc_block(st, jnp.asarray(x))
    tail = np.asarray(y)[-2000:]
    # output amplitude driven to ~1 (unity target)
    assert abs(np.mean(np.abs(tail)) - 1.0) < 0.15
    # rssi tracks the input level (3.5 amplitude ~ 10.9 dB)
    assert abs(float(rssi[-1]) - 20 * np.log10(3.5)) < 1.5


def test_agc_block_invariance():
    rng = np.random.default_rng(1)
    x = (rng.normal(size=4096) + 1j * rng.normal(size=4096)
         ).astype(np.complex64)
    st = agc.agc_init(0.01)
    _, y_full, _, _ = agc.agc_block(st, jnp.asarray(x))
    st2 = agc.agc_init(0.01)
    st2, y1, _, _ = agc.agc_block(st2, jnp.asarray(x[:1000]))
    _, y2, _, _ = agc.agc_block(st2, jnp.asarray(x[1000:]))
    np.testing.assert_allclose(
        np.asarray(y_full), np.concatenate([np.asarray(y1),
                                            np.asarray(y2)]), atol=1e-3)


def test_spectrogram_tone_peak():
    sg = spectrum.spectrogram_create(nfft=64)
    f = 10 / 64  # exactly bin 10
    t = np.arange(64 * 8)
    x = np.exp(2j * np.pi * f * t).astype(np.complex64)
    psd, peak_db, peak_f = spectrum.spectrogram_block(sg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(peak_f), f, atol=1e-6)
    row = spectrum.ascii_row(sg, np.asarray(psd)[0])
    assert len(row) == 64
    assert row.strip() != ""


def test_ring_log():
    r = window.ring_init(16)
    r = window.ring_push(r, jnp.arange(10).astype(jnp.complex64))
    r = window.ring_push(r, (10 + jnp.arange(10)).astype(jnp.complex64))
    out = np.asarray(window.ring_read(r))
    np.testing.assert_array_equal(out.real, np.arange(4, 20))
    assert int(r.count) == 20
    # oversized push keeps the newest samples
    r = window.ring_push(r, jnp.arange(100).astype(jnp.complex64))
    np.testing.assert_array_equal(
        np.asarray(window.ring_read(r)).real, np.arange(84, 100))
