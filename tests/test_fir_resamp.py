"""Streaming FIR / resampler tests: scipy oracles + block-size invariance."""
import numpy as np
import pytest
import scipy.signal as sig

import jax.numpy as jnp

from liquid_usrp_tpu.ops import fir, resamp, nco
from liquid_usrp_tpu.ops.filter_design import firdes_kaiser, rrcos


def _rand_iq(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)


def test_fir_block_matches_scipy():
    taps = firdes_kaiser(41, 0.2, 60.0).astype(np.float32)
    x = _rand_iq(512)
    st = fir.fir_init(41)
    _, y = fir.fir_block(jnp.asarray(taps), st, jnp.asarray(x))
    want = sig.lfilter(taps, 1.0, x)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)


def test_fir_block_invariance():
    """Chopping the stream into different block sizes gives identical output."""
    taps = jnp.asarray(firdes_kaiser(33, 0.3, 60.0).astype(np.float32))
    x = _rand_iq(600)
    outs = []
    for bs in (600, 100, 37):
        st = fir.fir_init(33)
        pieces = []
        i = 0
        while i < 600:
            n = min(bs, 600 - i)
            st, y = fir.fir_block(taps, st, jnp.asarray(x[i:i + n]))
            pieces.append(np.asarray(y))
            i += n
        outs.append(np.concatenate(pieces))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-5)


def test_firinterp_matches_upfirdn():
    k = 4
    taps = rrcos(k, 5, 0.3).astype(np.float32)
    x = _rand_iq(128)
    st = fir.firinterp_init(len(taps), k)
    _, y = fir.firinterp_block(jnp.asarray(taps), k, st, jnp.asarray(x))
    want = sig.upfirdn(taps, x, up=k)[: 128 * k]
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)


def test_firdecim_matches_upfirdn():
    k = 4
    taps = firdes_kaiser(33, 0.1, 60.0).astype(np.float32)
    x = _rand_iq(256)
    st = fir.fir_init(33)
    _, y = fir.firdecim_block(jnp.asarray(taps), k, st, jnp.asarray(x))
    # y[n] = full[n*k + k - 1] where full = lfilter(taps, 1, x)
    full = sig.lfilter(taps, 1.0, x)
    want = full[k - 1::k]
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)


def test_resamp2_interp_then_decim_identity():
    r2 = resamp.resamp2_create(7, 60.0)
    # band-limited input (half-band filters roll off near Nyquist, so a
    # full-band signal would legitimately be shaped at the edges)
    x = _rand_iq(512, seed=3)
    lp = firdes_kaiser(41, 0.18, 60.0)
    x = sig.lfilter(lp, 1.0, x).astype(np.complex64)
    sti = resamp.resamp2_state(r2)
    _, up = resamp.resamp2_interp_block(r2, sti, jnp.asarray(x))
    std = resamp.resamp2_decim_state(r2)
    _, back = resamp.resamp2_decim_block(r2, std, up)
    # identity up to the composite filter delay; find delay by correlation
    back = np.asarray(back)
    c = np.abs(np.correlate(back, x, "full"))
    lag = c.argmax() - (len(x) - 1)
    assert lag >= 0
    a = back[lag:lag + 400]
    b = x[:400]
    scale = np.vdot(b, a) / np.vdot(b, b)
    np.testing.assert_allclose(a, scale * b, atol=0.05)
    assert abs(abs(scale) - 1.0) < 0.05


@pytest.mark.parametrize("rate", [0.5003, 0.75, 1.0, 1.33, 1.9999])
def test_resamp_tone_frequency_scaling(rate):
    """A complex tone at f_in must come out at f_in/rate of the new rate —
    i.e. same absolute frequency; verify via phase slope."""
    rs = resamp.resamp_create(rate)
    f = 0.02  # cycles/sample at input rate
    n = 4096
    x = np.exp(2j * np.pi * f * np.arange(n)).astype(np.complex64)
    st = resamp.resamp_state(rs)
    st, y, valid, count = resamp.resamp_block(rs, st, jnp.asarray(x))
    y = np.asarray(y)[: int(count)]
    # discard transient
    y = y[200:-10]
    ph = np.unwrap(np.angle(y))
    slope = np.polyfit(np.arange(len(ph)), ph, 1)[0] / (2 * np.pi)
    np.testing.assert_allclose(slope, f / rate, atol=1e-4)
    # amplitude preserved within 0.5 dB
    amp = np.abs(y).mean()
    assert abs(amp - 1.0) < 0.06


def test_resamp_count_matches_rate():
    rs = resamp.resamp_create(0.7117)
    st = resamp.resamp_state(rs)
    total = 0
    nin = 0
    for i in range(10):
        x = _rand_iq(1000, seed=i)
        st, y, valid, count = resamp.resamp_block(rs, st, jnp.asarray(x))
        total += int(count)
        nin += 1000
    assert abs(total - nin * rs.rate) <= 2


@pytest.mark.slow
def test_resamp_block_invariance():
    rs = resamp.resamp_create(1.2345)
    x = _rand_iq(1200, seed=9)
    outs = []
    for bs in (1200, 400, 171):
        st = resamp.resamp_state(rs)
        got = []
        i = 0
        while i < 1200:
            n = min(bs, 1200 - i)
            st, y, valid, count = resamp.resamp_block(
                rs, st, jnp.asarray(x[i:i + n]))
            got.append(np.asarray(y)[: int(count)])
            i += n
        outs.append(np.concatenate(got))
    m = min(len(o) for o in outs)
    np.testing.assert_allclose(outs[0][:m], outs[1][:m], atol=1e-4)
    np.testing.assert_allclose(outs[0][:m], outs[2][:m], atol=1e-4)


@pytest.mark.parametrize("rate", [0.123, 0.5, 2.0, 3.7])
def test_msresamp_tone(rate):
    ms = resamp.msresamp_create(rate)
    f = 0.011
    n = 8192
    # ensure divisibility for decim chains
    x = np.exp(2j * np.pi * f * np.arange(n)).astype(np.complex64)
    st = resamp.msresamp_state(ms)
    st, y, valid, count = resamp.msresamp_block(ms, st, jnp.asarray(x))
    y = np.asarray(y)[: int(count)]
    assert abs(len(y) - n * rate) / (n * rate) < 0.05
    y = y[len(y) // 4:-10]
    ph = np.unwrap(np.angle(y))
    slope = np.polyfit(np.arange(len(ph)), ph, 1)[0] / (2 * np.pi)
    np.testing.assert_allclose(slope, f / rate, atol=2e-4)


def test_nco_mix_up_down_roundtrip():
    x = _rand_iq(300, seed=5)
    st = nco.nco_init(0.3)
    st1, up = nco.nco_mix_block(st, jnp.asarray(x), up=True)
    st2 = nco.nco_init(0.3)
    _, back = nco.nco_mix_block(st2, up, up=False)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)
    # block invariance of the carried phase
    sta = nco.nco_init(0.217)
    _, y_full = nco.nco_mix_block(sta, jnp.asarray(x), up=True)
    stb = nco.nco_init(0.217)
    stb, y1 = nco.nco_mix_block(stb, jnp.asarray(x[:137]), up=True)
    _, y2 = nco.nco_mix_block(stb, jnp.asarray(x[137:]), up=True)
    np.testing.assert_allclose(
        np.asarray(y_full), np.concatenate([y1, y2]), atol=1e-3)


def test_resamp_set_rate_midstream():
    """resamp_crcf_set_rate parity: rate mutates mid-stream, delay line and
    fractional phase carry over, each segment lands at its own rate."""
    f = 0.015
    n = 4096
    x = np.exp(2j * np.pi * f * np.arange(2 * n)).astype(np.complex64)
    rs1 = resamp.resamp_create(0.9)
    st = resamp.resamp_state(rs1)
    st, y1, valid1, c1 = resamp.resamp_block(rs1, st, jnp.asarray(x[:n]))
    rs2 = resamp.resamp_set_rate(rs1, 1.4)
    assert rs2.P == rs1.P and abs(rs2.rate - 1.4) < 1e-9
    st = resamp.resamp_rescale_state(rs1, rs2, st)
    st, y2, valid2, c2 = resamp.resamp_block(rs2, st, jnp.asarray(x[n:]))
    for y, c, rate in ((np.asarray(y1), int(c1), 0.9),
                       (np.asarray(y2), int(c2), 1.4)):
        seg = y[200:c - 10]
        ph = np.unwrap(np.angle(seg))
        slope = np.polyfit(np.arange(len(seg)), ph, 1)[0] / (2 * np.pi)
        np.testing.assert_allclose(slope, f / rate, atol=2e-4)
    # output counts match each segment's rate
    assert abs(int(c1) - n * 0.9) <= 2
    assert abs(int(c2) - n * 1.4) <= 2


def test_root_nyquist_designs_beat_rrc():
    """rkaiser/hm3 are real ISI-optimized designs (VERDICT weak #8): at the
    narrowband_tx default design point they dominate the truncated RRC."""
    from liquid_usrp_tpu.ops import filter_design as fd
    k, m, beta = 2, 9, 0.2
    rrc = fd.firdes_prototype("rrcos", k, m, beta)
    isi_rrc = fd.matched_isi_db(rrc, k)
    sb_rrc = fd.stopband_atten_db(rrc, k, beta)
    for name in ("rkaiser", "hm3"):
        h = fd.firdes_prototype(name, k, m, beta)
        assert h.shape == (2 * k * m + 1,)
        isi = fd.matched_isi_db(h, k)
        sb = fd.stopband_atten_db(h, k, beta)
        assert isi < isi_rrc - 5.0, f"{name}: ISI {isi:.1f} vs RRC {isi_rrc:.1f}"
        assert sb > sb_rrc + 5.0, f"{name}: stopband {sb:.1f} vs RRC {sb_rrc:.1f}"
    # arkaiser (fast approximation): must still hit the stopband target
    ark = fd.firdes_prototype("arkaiser", k, m, beta)
    assert fd.stopband_atten_db(ark, k, beta) > 45.0
    assert fd.matched_isi_db(ark, k) < -25.0


@pytest.mark.slow
def test_resamp_tone_reconstruction_error():
    """A pure tone must survive fractional resampling with low EVM vs
    the ideal output-grid tone.  This is the property that the
    phase-slope/amplitude fits cannot see: the old correlation-oriented
    window pairing passed those while sawtoothing output timing by ~2
    samples (-23 dB reconstruction floor)."""
    for rate in (1.33, 0.77, 1.1, 0.9):
        rs = resamp.resamp_create(rate)
        st = resamp.resamp_state(rs)
        n = 4000
        x = np.exp(2j * np.pi * 0.02 * np.arange(n)).astype(np.complex64)
        st, y, valid, cnt = resamp.resamp_block(rs, st, jnp.asarray(x))
        y = np.asarray(y)[: int(cnt)][200:-200]
        m = np.arange(len(y)) + 200
        ref = np.exp(2j * np.pi * (0.02 / rs.rate) * m)
        g = np.vdot(ref, y) / np.vdot(ref, ref)
        err_db = 10 * np.log10(np.mean(np.abs(y - g * ref) ** 2) /
                               np.mean(np.abs(y) ** 2))
        assert err_db < -60.0, (rate, err_db)


@pytest.mark.slow
def test_rational_fast_path_equals_general():
    """Small-denominator rates route through per-class strided convs
    (_resamp_block_rational); results must match the windows-gather
    general path: identical timing integers (valid/count/carried state),
    float outputs to ~1 ulp, across a block split."""
    rng = np.random.default_rng(2)
    resamp._RATIONAL_ON_CPU = True        # the path is TPU-gated
    for rate in (1.5, 0.75, 2.0, 4 / 3, 1.25, 64 / 63):
        rs = resamp.resamp_create(rate)
        assert rs.q <= resamp._RATIONAL_Q_MAX
        x1 = (rng.normal(size=1200) + 1j * rng.normal(size=1200)
              ).astype(np.complex64)
        x2 = (rng.normal(size=700) + 1j * rng.normal(size=700)
              ).astype(np.complex64)
        st = resamp.resamp_state(rs)
        st, ya, va, ca = resamp.resamp_block(rs, st, jnp.asarray(x1))
        st_f, yb, vb, cb = resamp.resamp_block(rs, st, jnp.asarray(x2))
        try:
            resamp._RATIONAL_ON_CPU = False      # force the general path
            st = resamp.resamp_state(rs)
            st, Ya, Va, Ca = resamp.resamp_block(rs, st, jnp.asarray(x1))
            st_g, Yb, Vb, Cb = resamp.resamp_block(rs, st, jnp.asarray(x2))
        finally:
            resamp._RATIONAL_ON_CPU = True
        assert int(ca) == int(Ca) and int(cb) == int(Cb), rate
        np.testing.assert_array_equal(np.asarray(va), np.asarray(Va))
        np.testing.assert_allclose(np.asarray(ya), np.asarray(Ya),
                                   atol=2e-5, err_msg=str(rate))
        np.testing.assert_allclose(np.asarray(yb), np.asarray(Yb),
                                   atol=2e-5, err_msg=str(rate))
        assert int(st_f.i0) == int(st_g.i0)
        assert int(st_f.num0) == int(st_g.num0)
    resamp._RATIONAL_ON_CPU = False
