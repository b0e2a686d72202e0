"""Single-carrier flexframe / frame64 loopback tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from liquid_usrp_tpu.framing import flexframe as ff
from liquid_usrp_tpu.framing import flexframe_sync as ffs
from liquid_usrp_tpu.io import channel_model as chan
from liquid_usrp_tpu.ops import crc, fec, modem

BLOCK = 8192


@pytest.fixture(scope="module")
def setup():
    params = ff.make_flex_params(k=2, m=7, beta=0.3)
    sync = ffs.make_flex_sync(params, block_size=BLOCK, max_payload=512,
                              max_frames=4)
    step = ffs.make_flex_sync_step(sync)
    return params, sync, step


def _run(sync, step, stream):
    bs = sync.block_size
    flush = int(np.ceil(sync.overlap / bs)) + 1
    n_blocks = -(-len(stream) // bs) + flush
    stream = np.concatenate(
        [stream, np.zeros(n_blocks * bs - len(stream), np.complex64)])
    state = ffs.flex_sync_init(sync)
    out = []
    for b in range(n_blocks):
        state, res = step(state, jnp.asarray(stream[b * bs:(b + 1) * bs]))
        det = np.asarray(res.detected)
        for i in np.nonzero(det)[0]:
            out.append({
                "t": int(res.t_start[i]),
                "header_valid": bool(res.header_valid[i]),
                "payload_valid": bool(res.payload_valid[i]),
                "header": np.asarray(res.header[i]),
                "payload": np.asarray(res.payload[i])[
                    : int(res.payload_len[i])],
                "cfo": float(res.cfo[i]),
                "evm": float(res.evm[i]),
            })
    return sorted(out, key=lambda f: f["t"])


def test_clean_loopback(setup):
    params, sync, step = setup
    rng = np.random.default_rng(0)
    header = rng.integers(0, 256, ff.FLEX_HEADER_USER, dtype=np.uint8)
    payload = rng.integers(0, 256, 200, dtype=np.uint8)
    frame = np.asarray(ff.flex_assemble(params, ff.default_props(),
                                        jnp.asarray(header),
                                        jnp.asarray(payload)))
    stream = np.zeros(4000 + len(frame), np.complex64)
    stream[1234:1234 + len(frame)] = frame
    frames = _run(sync, step, stream)
    assert len(frames) == 1
    f = frames[0]
    assert f["header_valid"] and f["payload_valid"]
    np.testing.assert_array_equal(f["header"], header)
    np.testing.assert_array_equal(f["payload"], payload)


@pytest.mark.parametrize("mod,fec0,fec1", [
    (modem.MOD_QPSK, fec.FEC_NONE, fec.FEC_HAMMING128),
    (modem.MOD_QAM16, fec.FEC_NONE, fec.FEC_GOLAY2412),
    (modem.MOD_BPSK, fec.FEC_NONE, fec.FEC_NONE),
    (modem.MOD_PSK8, fec.FEC_HAMMING74, fec.FEC_NONE),
])
def test_props_awgn_cfo(setup, mod, fec0, fec1):
    params, sync, step = setup
    props = ff.FrameProps(check=crc.CRC_32, fec0=fec0, fec1=fec1, mod=mod)
    rng = np.random.default_rng(mod)
    header = rng.integers(0, 256, ff.FLEX_HEADER_USER, dtype=np.uint8)
    payload = rng.integers(0, 256, 160, dtype=np.uint8)
    frame = np.asarray(ff.flex_assemble(params, props, jnp.asarray(header),
                                        jnp.asarray(payload)))
    stream = np.zeros(3000 + len(frame), np.complex64)
    stream[777:777 + len(frame)] = frame
    ch = chan.Channel(snr_db=25.0, cfo=0.003, phase=0.9)
    stream = np.asarray(chan.channel_apply(
        ch, jax.random.PRNGKey(mod), jnp.asarray(stream), signal_power=1.0))
    frames = _run(sync, step, stream)
    assert len(frames) == 1
    f = frames[0]
    assert f["payload_valid"], f
    np.testing.assert_array_equal(f["payload"], payload)
    np.testing.assert_allclose(f["cfo"], 0.003, atol=1e-3)


def test_large_cfo_detection_and_decode(setup):
    """CFO at 0.04 rad/sample (~2x the old |c1+c2|^2 metric's
    self-cancellation point of pi/(32 k)) must still detect and decode:
    pins the split-half noncoherent detection combining AND the
    split-half CFO estimator's +-pi/(32 k) = +-0.049 range."""
    params, sync, step = setup
    rng = np.random.default_rng(9)
    header = rng.integers(0, 256, ff.FLEX_HEADER_USER, dtype=np.uint8)
    payload = rng.integers(0, 256, 120, dtype=np.uint8)
    frame = np.asarray(ff.flex_assemble(params, ff.default_props(),
                                        jnp.asarray(header),
                                        jnp.asarray(payload)))
    stream = np.zeros(3000 + len(frame), np.complex64)
    stream[900:900 + len(frame)] = frame
    ch = chan.Channel(snr_db=25.0, cfo=0.04, phase=0.3)
    stream = np.asarray(chan.channel_apply(
        ch, jax.random.PRNGKey(4), jnp.asarray(stream), signal_power=1.0))
    frames = _run(sync, step, stream)
    ok = [f for f in frames if f["payload_valid"]]
    assert len(ok) == 1, frames
    np.testing.assert_array_equal(ok[0]["payload"], payload)
    np.testing.assert_allclose(ok[0]["cfo"], 0.04, atol=2e-3)


def test_frame64(setup):
    params = ff.make_flex_params(k=2, m=7, beta=0.3)
    # frame64 keeps the fixed 8-byte user header -> its own sync format
    sync = ffs.make_flex_sync(params, block_size=BLOCK, max_payload=512,
                              max_frames=4,
                              header_user=ff.FRAME64_HEADER_USER)
    step = ffs.make_flex_sync_step(sync)
    rng = np.random.default_rng(5)
    header = rng.integers(0, 256, ff.FRAME64_HEADER_USER, dtype=np.uint8)
    payload = rng.integers(0, 256, ff.FRAME64_PAYLOAD, dtype=np.uint8)
    frame = np.asarray(ff.frame64_assemble(params, jnp.asarray(header),
                                           jnp.asarray(payload)))
    assert len(frame) == ff.FRAME64_LEN
    stream = np.zeros(2000 + len(frame), np.complex64)
    stream[500:500 + len(frame)] = frame
    ch = chan.Channel(snr_db=20.0)
    stream = np.asarray(chan.channel_apply(
        ch, jax.random.PRNGKey(9), jnp.asarray(stream)))
    frames = _run(sync, step, stream)
    assert len(frames) == 1
    assert frames[0]["payload_valid"]
    np.testing.assert_array_equal(frames[0]["payload"], payload)


def test_multiple_bursts(setup):
    params, sync, step = setup
    props = ff.default_props()
    rng = np.random.default_rng(2)
    stream = np.zeros(30000, np.complex64)
    sent = []
    pos = 900
    for pid in range(4):
        header = rng.integers(0, 256, ff.FLEX_HEADER_USER, dtype=np.uint8)
        payload = rng.integers(0, 256, 100, dtype=np.uint8)
        frame = np.asarray(ff.flex_assemble(
            params, props, jnp.asarray(header), jnp.asarray(payload)))
        stream[pos:pos + len(frame)] = frame
        sent.append((pos, payload))
        pos += len(frame) + 1500
    frames = _run(sync, step, stream)
    ok = [f for f in frames if f["payload_valid"]]
    assert len(ok) == 4
    for f, (p, payload) in zip(ok, sent):
        assert abs(f["t"] - p) <= 2
        np.testing.assert_array_equal(f["payload"], payload)


@pytest.mark.slow
def test_flex_batched_blocks_equal_sequential(setup):
    """flex_sync_blocks_batched == scan of flex_sync_block: same
    detections, payloads, and stats on a multi-frame stream."""
    params, sync, step = setup
    rng = np.random.default_rng(23)
    pieces = []
    truth = []
    for i in range(5):
        header = rng.integers(0, 256, ff.FLEX_HEADER_USER, dtype=np.uint8)
        payload = rng.integers(0, 256, 120 + 20 * i, dtype=np.uint8)
        truth.append((header, payload))
        pieces.append(np.zeros(int(rng.integers(300, 1500)), np.complex64))
        pieces.append(np.asarray(ff.flex_assemble(
            params, ff.default_props(), jnp.asarray(header),
            jnp.asarray(payload))))
    stream = np.concatenate(pieces)
    n_blocks = -(-len(stream) // sync.block_size) + \
        int(np.ceil(sync.overlap / sync.block_size)) + 1
    stream = np.concatenate(
        [stream, np.zeros(n_blocks * sync.block_size - len(stream),
                          np.complex64)])
    stream = stream + (0.01 * (
        np.random.default_rng(9).normal(size=stream.shape) +
        1j * np.random.default_rng(10).normal(size=stream.shape))
    ).astype(np.complex64)

    seq = _run(sync, step, stream)

    state = ffs.flex_sync_init(sync)
    blocks = jnp.asarray(stream.reshape(n_blocks, sync.block_size))
    state2, res = ffs.flex_sync_blocks_batched(sync, state, blocks)
    res = jax.tree.map(np.asarray, res)
    bat = []
    for b, k in zip(*np.nonzero(res.detected)):
        bat.append({
            "t": int(res.t_start[b, k]),
            "header_valid": bool(res.header_valid[b, k]),
            "payload_valid": bool(res.payload_valid[b, k]),
            "payload": res.payload[b, k][: int(res.payload_len[b, k])],
            "cfo": float(res.cfo[b, k]),
            "evm": float(res.evm[b, k]),
        })
    bat = sorted(bat, key=lambda f: f["t"])
    assert len(bat) == len(seq) == 5
    for fb, fs in zip(bat, seq):
        assert fb["t"] == fs["t"]
        assert fb["payload_valid"] == fs["payload_valid"] is True
        np.testing.assert_array_equal(fb["payload"], fs["payload"])
        np.testing.assert_allclose(fb["cfo"], fs["cfo"], atol=1e-6)
        np.testing.assert_allclose(fb["evm"], fs["evm"], atol=1e-3)
    for (h, p), f in zip(truth, bat):
        np.testing.assert_array_equal(f["payload"], p)
    # carried state identical to the sequential run
    st_seq = ffs.flex_sync_init(sync)
    for b in range(n_blocks):
        st_seq, _ = step(st_seq, blocks[b])
    np.testing.assert_array_equal(np.asarray(state2.tail),
                                  np.asarray(st_seq.tail))
    assert int(state2.base) == int(st_seq.base)


def test_long_bpsk_frame_wraps_pilot_table():
    """A low-rate frame needing more pilots than the PN table holds
    (>1024) assembles and decodes payload-exact — the pilot reference is
    periodic by ordinal (regression: table slice used to truncate and
    break broadcasting at app-default max_payload=2048)."""
    from liquid_usrp_tpu.ops import crc as crc_mod
    from liquid_usrp_tpu.ops import fec as fec_mod
    from liquid_usrp_tpu.ops import modem as modem_mod
    params = ff.make_flex_params(k=2, m=7, beta=0.3)
    props = ff.FrameProps(check=crc_mod.CRC_32, fec0=fec_mod.FEC_NONE,
                          fec1=fec_mod.FEC_NONE, mod=modem_mod.MOD_BPSK)
    payload_len = 2000
    assert len(ff.slots_layout(
        ff.n_payload_slots(props, payload_len))[1]) > 1024
    rng = np.random.default_rng(77)
    header = rng.integers(0, 256, ff.FLEX_HEADER_USER, dtype=np.uint8)
    payload = rng.integers(0, 256, payload_len, dtype=np.uint8)
    burst = np.asarray(ff.flex_assemble(
        params, props, jnp.asarray(header), jnp.asarray(payload)))
    sync = ffs.make_flex_sync(params, block_size=8192, max_payload=2048,
                              max_frames=2)
    step = ffs.make_flex_sync_step(sync)
    stream = np.zeros(1500 + len(burst) + 500, np.complex64)
    stream[1500:1500 + len(burst)] = burst
    frames = _run(sync, step, stream)
    ok = [f for f in frames if f["payload_valid"]]
    assert len(ok) == 1
    np.testing.assert_array_equal(ok[0]["payload"], payload)


@pytest.mark.parametrize("mod_name", ["psk256", "apsk64", "v29", "ook",
                                      "ask16", "qam8", "sqam32", "sqam128",
                                      "arb16opt", "arb64vt", "arb256opt"])
def test_extended_scheme_frame_loopback(setup, mod_name):
    """Extended modem ladder (liquid string-parser surface) round-trips
    through a flexframe payload at high SNR."""
    from liquid_usrp_tpu.ops import crc as crc_mod
    from liquid_usrp_tpu.ops import fec as fec_mod
    from liquid_usrp_tpu.ops import modem as modem_mod
    params, sync, step = setup
    props = ff.FrameProps(check=crc_mod.CRC_32, fec0=fec_mod.FEC_NONE,
                          fec1=fec_mod.FEC_HAMMING74,
                          mod=modem_mod.mod_from_name(mod_name))
    rng = np.random.default_rng(hash(mod_name) % 2**31)
    header = rng.integers(0, 256, ff.FLEX_HEADER_USER, dtype=np.uint8)
    payload = rng.integers(0, 256, 96, dtype=np.uint8)
    burst = np.asarray(ff.flex_assemble(
        params, props, jnp.asarray(header), jnp.asarray(payload)))
    stream = np.zeros(1200 + len(burst) + 400, np.complex64)
    stream[1200:1200 + len(burst)] = burst
    stream += (0.003 * (np.random.default_rng(5).normal(
        size=stream.shape) + 1j * np.random.default_rng(6).normal(
        size=stream.shape))).astype(np.complex64)
    frames = _run(sync, step, stream)
    ok = [f for f in frames if f["payload_valid"]]
    assert len(ok) == 1, (mod_name, frames)
    np.testing.assert_array_equal(ok[0]["payload"], payload)


def test_small_m_frames_decode_across_block_seam():
    """m=3 geometry: the old 8k overlap margin read up to ~30 samples
    past the matched-filter buffer for frames at the detect-region end,
    clipping payload tails.  Sweep a frame across the seam region."""
    params = ff.make_flex_params(k=2, m=3, beta=0.3)
    sync = ffs.make_flex_sync(params, block_size=4096, max_payload=64,
                              max_frames=2)
    step = ffs.make_flex_sync_step(sync)
    rng = np.random.default_rng(8)
    header = rng.integers(0, 256, ff.FLEX_HEADER_USER, dtype=np.uint8)
    payload = rng.integers(0, 256, 48, dtype=np.uint8)
    frame = np.asarray(ff.flex_assemble(
        params, ff.default_props(), jnp.asarray(header),
        jnp.asarray(payload)))
    bs = sync.block_size
    for pos in range(bs - len(frame) - 40, bs - len(frame) + 40, 8):
        stream = np.zeros(3 * bs, np.complex64)
        stream[pos:pos + len(frame)] = frame
        st = ffs.flex_sync_init(sync)
        got = []
        for b in range(3):
            st, r = step(st, jnp.asarray(stream[b * bs:(b + 1) * bs]))
            for i in np.nonzero(np.asarray(r.payload_valid))[0]:
                got.append(np.asarray(r.payload[i])[:48])
        assert len(got) == 1, f"pos={pos}: {len(got)}"
        np.testing.assert_array_equal(got[0], payload, err_msg=str(pos))
