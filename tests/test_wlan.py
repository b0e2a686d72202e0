"""802.11a frame generator structural tests."""
import numpy as np
import pytest

from liquid_usrp_tpu.framing import wlan


@pytest.mark.parametrize("rate", sorted(wlan.WLAN_RATES))
def test_frame_length(rate):
    psdu = np.arange(100, dtype=np.uint8)
    frame = np.asarray(wlan.wlan_assemble(rate, psdu))
    assert len(frame) == wlan.wlan_frame_length(rate, 100)
    # preamble + signal + >= 1 data symbol
    assert len(frame) >= 160 + 160 + 80 + 80


def test_short_training_periodicity():
    frame = np.asarray(wlan.wlan_assemble(6, np.zeros(50, np.uint8)))
    st = frame[:160]
    np.testing.assert_allclose(st[:16], st[16:32], atol=1e-5)
    np.testing.assert_allclose(st[:16], st[144:160], atol=1e-5)


def test_long_training_structure():
    frame = np.asarray(wlan.wlan_assemble(6, np.zeros(50, np.uint8)))
    lt = frame[160:320]
    # two identical 64-sample long symbols after the 32-sample guard
    np.testing.assert_allclose(lt[32:96], lt[96:160], atol=1e-5)


def test_occupied_bandwidth():
    rng = np.random.default_rng(0)
    frame = np.asarray(wlan.wlan_assemble(
        54, rng.integers(0, 256, 500, dtype=np.uint8)))
    spec = np.abs(np.fft.fft(frame[320:], 4096)) ** 2
    f = np.fft.fftfreq(4096)
    inband = spec[np.abs(f) < 26.5 / 64].mean()
    outband = spec[np.abs(f) > 30.0 / 64].mean()
    assert 10 * np.log10(inband / outband) > 12.0  # rectangular CP-OFDM sidelobes


def test_signal_field_decodes():
    """Self-check: demod + viterbi-decode the SIGNAL symbol and verify the
    encoded rate/length fields."""
    length = 123
    frame = np.asarray(wlan.wlan_assemble(24, np.zeros(length, np.uint8)))
    sig_t = frame[320 + 16:320 + 80]          # strip CP
    grid = np.fft.fft(sig_t) / (64 / np.sqrt(52))
    didx = [wlan._fftshift_index(k) for k in wlan._DATA_IDX]
    pts = np.real(grid[didx])
    bits_inter = (pts > 0).astype(np.uint8)
    # undo interleaver (bpsc=1, ncbps=48)
    deinter = np.empty(48, np.uint8)
    for k in range(48):
        i = (48 // 16) * (k % 16) + k // 16
        j = i  # s=1 => second permutation is identity for bpsc=1
        deinter[k] = bits_inter[j]
    # viterbi-free check: re-encode all 2^4 rate fields? simpler: re-encode
    # the expected SIGNAL bits and compare coded streams
    rate_bits = [1, 0, 0, 1]  # 24 Mb/s
    len_bits = [(length >> i) & 1 for i in range(12)]
    sig = np.array(rate_bits + [0] + len_bits, dtype=np.uint8)
    parity = int(sig.sum()) & 1
    sig = np.concatenate([sig, [parity], np.zeros(6, np.uint8)])
    want = wlan._interleave(wlan._conv_encode_bits(sig), 48, 1)
    np.testing.assert_array_equal(bits_inter, want)


def test_app(tmp_path):
    from liquid_usrp_tpu.apps import wlanframe_tx
    f = str(tmp_path / "wlan.iq")
    assert wlanframe_tx.main(["-o", f, "-N", "2", "-r", "12"]) == 0
    from liquid_usrp_tpu.io.streams import read_iq
    assert len(read_iq(f)) > 1000


def test_wlan_loopback_all_rates():
    """TX -> gain/phase channel + noise -> wlan_decode, PSDU-exact, every
    rate (the receive path exists for loopback verification; liquid-wlan
    and the reference app are TX-only)."""
    rng = np.random.default_rng(1)
    for rate in sorted(wlan.WLAN_RATES):
        psdu = rng.integers(0, 256, 100, dtype=np.uint8)
        f = np.asarray(wlan.wlan_assemble(rate, psdu))
        noise = 0.02 * (rng.normal(size=f.shape) +
                        1j * rng.normal(size=f.shape))
        d = wlan.wlan_decode(0.8 * np.exp(1j * 0.7) * f +
                             noise.astype(np.complex64))
        assert d["signal_valid"] and d["rate"] == rate
        assert d["length"] == 100 and d["psdu_valid"]
        assert np.array_equal(d["psdu"], psdu)


def test_wlan_signal_field_rejects_corruption():
    """Flipping the SIGNAL symbol hard enough must clear signal_valid
    (parity/structure check), not return garbage rate/length silently."""
    rng = np.random.default_rng(2)
    f = np.asarray(wlan.wlan_assemble(12, rng.integers(
        0, 256, 60, dtype=np.uint8)))
    bad = f.copy()
    bad[336:400] = 0.3 * (rng.normal(size=64) + 1j * rng.normal(size=64))
    d = wlan.wlan_decode(bad)
    assert not d["signal_valid"]


def test_wlan_conv_encoder_vectorized_matches_serial():
    """Independent serial reference with the 802.11a delay taps written
    out explicitly (17.3.5.5: g0=133 -> A = b[i]^b[i-2]^b[i-3]^b[i-5]^
    b[i-6], g1=171 -> B = b[i]^b[i-1]^b[i-2]^b[i-3]^b[i-6]; octal MSB =
    delay 0)."""
    def conv_ref(bits):
        b = np.concatenate([np.zeros(6, np.uint8), bits])
        out = np.empty(2 * len(bits), np.uint8)
        for i in range(len(bits)):
            j = i + 6
            out[2 * i] = (b[j] ^ b[j - 2] ^ b[j - 3] ^
                          b[j - 5] ^ b[j - 6])
            out[2 * i + 1] = (b[j] ^ b[j - 1] ^ b[j - 2] ^
                              b[j - 3] ^ b[j - 6])
        return out
    rng = np.random.default_rng(0)
    b = rng.integers(0, 2, 500).astype(np.uint8)
    assert np.array_equal(conv_ref(b), wlan._conv_encode_bits(b))


def test_wlanframe_tx_output_decodes(tmp_path):
    """The app's IQ file round-trips through wlan_decode PSDU-exact."""
    from liquid_usrp_tpu.apps import wlanframe_tx
    from liquid_usrp_tpu.io.streams import read_iq
    f = str(tmp_path / "wlan.iq")
    assert wlanframe_tx.main(["-o", f, "-N", "2", "-r", "24", "-P", "80",
                              "-s", "5"]) == 0
    stream = read_iq(f)
    rng = np.random.default_rng(5)
    flen = wlan.wlan_frame_length(24, 80)
    pos = 200
    for _ in range(2):
        want = rng.integers(0, 256, 80, dtype=np.uint8)
        d = wlan.wlan_decode(stream[pos:pos + flen])
        assert d["signal_valid"] and d["rate"] == 24 and d["psdu_valid"]
        assert np.array_equal(d["psdu"], want)
        pos += flen + 200


def test_wlan_sync_finds_frames_with_offset_cfo_noise():
    """Streaming front-end: unknown frame starts + CFO + phase/gain +
    noise -> sample-exact timing, CFO corrected, PSDU-exact decode, and
    no false detections on noise-only input."""
    rng = np.random.default_rng(21)
    psdu1 = rng.integers(0, 256, 100, dtype=np.uint8)
    psdu2 = rng.integers(0, 256, 60, dtype=np.uint8)
    f1 = np.asarray(wlan.wlan_assemble(24, psdu1))
    f2 = np.asarray(wlan.wlan_assemble(12, psdu2))
    stream = np.zeros(723 + len(f1) + 911 + len(f2) + 500, np.complex64)
    stream[723:723 + len(f1)] = f1
    p2 = 723 + len(f1) + 911
    stream[p2:p2 + len(f2)] = f2
    cfo = 2 * np.pi * 0.003                      # rad/sample
    stream = (0.7 * np.exp(1j * 0.9) * stream *
              np.exp(1j * cfo * np.arange(len(stream)))
              ).astype(np.complex64)
    stream += (0.02 * (rng.normal(size=stream.shape) +
                       1j * rng.normal(size=stream.shape))
               ).astype(np.complex64)
    res = wlan.wlan_sync(stream)
    assert [d["start"] for d in res] == [723, p2]
    assert [d["rate"] for d in res] == [24, 12]
    assert all(d["psdu_valid"] for d in res)
    np.testing.assert_array_equal(res[0]["psdu"], psdu1)
    np.testing.assert_array_equal(res[1]["psdu"], psdu2)
    assert abs(res[0]["cfo"] - cfo) < 5e-4
    noise = (0.1 * (rng.normal(size=20000) +
                    1j * rng.normal(size=20000))).astype(np.complex64)
    assert wlan.wlan_sync(noise) == []


def test_wlan_sync_large_cfo_two_stage():
    """CFO near the coarse estimator's range edge exercises the
    coarse(ST)+fine(LT) two-stage combination."""
    rng = np.random.default_rng(22)
    psdu = rng.integers(0, 256, 80, dtype=np.uint8)
    f = np.asarray(wlan.wlan_assemble(36, psdu))
    stream = np.zeros(400 + len(f) + 400, np.complex64)
    stream[400:400 + len(f)] = f
    cfo = 0.15                                   # rad/sample (max ~0.196)
    stream = (stream * np.exp(1j * cfo * np.arange(len(stream)))
              ).astype(np.complex64)
    stream += (0.01 * (rng.normal(size=stream.shape) +
                       1j * rng.normal(size=stream.shape))
               ).astype(np.complex64)
    res = wlan.wlan_sync(stream)
    assert len(res) == 1 and res[0]["start"] == 400
    assert res[0]["rate"] == 36 and res[0]["psdu_valid"]
    np.testing.assert_array_equal(res[0]["psdu"], psdu)
    assert abs(res[0]["cfo"] - cfo) < 1e-3


def test_wlanframe_rx_app_pair(tmp_path):
    """The wlanframe_tx -> wlanframe_rx app pair (the RX completes the
    pair idiom the reference's TX-only wlan app lacks) recovers every
    frame through an impaired virtual channel."""
    from liquid_usrp_tpu.apps import wlanframe_rx, wlanframe_tx
    f = str(tmp_path / "wlan.iq")
    assert wlanframe_tx.main(["-o", f, "-N", "3", "-r", "24",
                              "-P", "90"]) == 0
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert wlanframe_rx.main(["-i", f, "--snr", "15",
                                  "--cfo", "0.002"]) == 0
    out = buf.getvalue()
    assert "valid PSDUs         :      3 (100.00%)" in out


def test_wlan_sync_block_size_invariance():
    """House invariant: streaming results are block-size-invariant
    (same stream through 4096- and 8192-sample blocks -> identical
    frames, timestamps, payloads)."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(33)
    psdu = rng.integers(0, 256, 70, dtype=np.uint8)
    f = np.asarray(wlan.wlan_assemble(18, psdu))
    stream = np.zeros(20000, np.complex64)
    stream[5111:5111 + len(f)] = f
    stream += (0.02 * (rng.normal(size=20000) +
                       1j * rng.normal(size=20000))).astype(np.complex64)

    def run(bs):
        sync = wlan.make_wlan_sync(block_size=bs, max_psdu=128,
                                   max_frames=2)
        step = wlan.make_wlan_sync_step(sync)
        state = wlan.wlan_sync_init(sync)
        n_blocks = -(-len(stream) // bs) + sync.overlap // bs + 1
        padded = np.concatenate(
            [stream, np.zeros(n_blocks * bs - len(stream), np.complex64)])
        got = []
        for b in range(n_blocks):
            state, r = step(state, jnp.asarray(padded[b * bs:(b + 1) * bs]))
            r = jax.tree.map(np.asarray, r)
            for i in np.nonzero(r.detected & r.psdu_valid)[0]:
                got.append((int(r.t_start[i]), int(r.rate[i]),
                            r.psdu[i][: int(r.length[i])].tolist()))
        return sorted(got)

    a, b = run(4096), run(8192)
    assert a == b
    assert len(a) == 1 and a[0][0] == 5111 and a[0][1] == 18
    assert np.array_equal(a[0][2], psdu)
