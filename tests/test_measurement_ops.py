"""Direct unit tests for AGC, spectrogram, and ring-log ops."""
import numpy as np
import pytest

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


@pytest.mark.slow
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
    # count saturates at capacity (valid-fill level, no int32 overflow
    # on long streams)
    assert int(window.ring_valid(r)) == 16
    half = window.ring_push(window.ring_init(16),
                            jnp.arange(5).astype(jnp.complex64))
    assert int(window.ring_valid(half)) == 5
    # oversized push keeps the newest samples
    r = window.ring_push(r, jnp.arange(100).astype(jnp.complex64))
    np.testing.assert_array_equal(
        np.asarray(window.ring_read(r)).real, np.arange(84, 100))


def test_frame_evm_tracks_channel_snr():
    """The reported per-frame EVM covers header+payload symbols and must
    track the channel SNR within ~2 dB (framesyncstats parity)."""
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    params = ofdm.make_ofdm_params(48, 6, 4)
    sync = ofdm_sync.make_sync(params, block_size=8192, max_payload=256,
                               max_frames=4)
    step = ofdm_sync.make_sync_step(sync)
    rng = np.random.default_rng(0)
    props = ofdm.default_props()
    h = rng.integers(0, 256, 8, dtype=np.uint8)
    p = rng.integers(0, 256, 200, dtype=np.uint8)
    f = np.asarray(ofdm.assemble_frame(params, props, jnp.asarray(h),
                                       jnp.asarray(p)))
    for snr in (30.0, 15.0):
        s = np.zeros(4 * 8192, np.complex64)
        s[1000:1000 + len(f)] = f
        std = (10 ** (-snr / 10)) ** 0.5 / np.sqrt(2)
        s = (s + std * (rng.normal(size=s.shape) +
                        1j * rng.normal(size=s.shape))).astype(np.complex64)
        st = ofdm_sync.sync_init(sync)
        evms = []
        for b in range(4):
            st, res = step(st, jnp.asarray(s[b * 8192:(b + 1) * 8192]))
            for i in np.nonzero(np.asarray(res.detected))[0]:
                if bool(res.payload_valid[i]):
                    evms.append(float(res.evm[i]))
        assert evms, f"frame not decoded at {snr} dB"
        assert abs(evms[0] - (-snr)) < 2.5, (snr, evms)
