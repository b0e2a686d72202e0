"""GMSK frame loopback tests (gmskframe_tx/_rx pair idiom)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from liquid_usrp_tpu.framing import gmskframe as gf
from liquid_usrp_tpu.io import channel_model as chan
from liquid_usrp_tpu.ops import crc, fec

BLOCK = 8192


@pytest.fixture(scope="module")
def setup():
    params = gf.make_gmsk_params(k=2, m=3, bt=0.5)
    sync = gf.make_gmsk_sync(params, block_size=BLOCK, max_payload=512,
                             max_frames=4)
    step = gf.make_gmsk_sync_step(sync)
    return params, sync, step


def _run(sync, step, stream):
    bs = sync.block_size
    flush = int(np.ceil(sync.overlap / bs)) + 1
    n_blocks = -(-len(stream) // bs) + flush
    stream = np.concatenate(
        [stream, np.zeros(n_blocks * bs - len(stream), np.complex64)])
    state = gf.gmsk_sync_init(sync)
    out = []
    for b in range(n_blocks):
        state, res = step(state, jnp.asarray(stream[b * bs:(b + 1) * bs]))
        for i in np.nonzero(np.asarray(res.detected))[0]:
            out.append({
                "t": int(res.t_start[i]),
                "header_valid": bool(res.header_valid[i]),
                "payload_valid": bool(res.payload_valid[i]),
                "header": np.asarray(res.header[i]),
                "payload": np.asarray(res.payload[i])[
                    : int(res.payload_len[i])],
                "cfo": float(res.cfo[i]),
            })
    return sorted(out, key=lambda f: f["t"])


def test_constant_envelope(setup):
    params, _, _ = setup
    rng = np.random.default_rng(0)
    frame = np.asarray(gf.gmsk_assemble(
        params, gf.gmsk_default_props(),
        jnp.asarray(rng.integers(0, 256, 8, dtype=np.uint8)),
        jnp.asarray(rng.integers(0, 256, 50, dtype=np.uint8))))
    np.testing.assert_allclose(np.abs(frame), 1.0, atol=1e-5)


def test_clean_loopback(setup):
    params, sync, step = setup
    rng = np.random.default_rng(1)
    header = rng.integers(0, 256, 8, dtype=np.uint8)
    payload = rng.integers(0, 256, 200, dtype=np.uint8)
    frame = np.asarray(gf.gmsk_assemble(params, gf.gmsk_default_props(),
                                        jnp.asarray(header),
                                        jnp.asarray(payload)))
    stream = np.zeros(3000 + len(frame), np.complex64)
    stream[1100:1100 + len(frame)] = frame
    frames = _run(sync, step, stream)
    ok = [f for f in frames if f["payload_valid"]]
    assert len(ok) == 1
    np.testing.assert_array_equal(ok[0]["header"], header)
    np.testing.assert_array_equal(ok[0]["payload"], payload)


def test_low_snr_detection_sensitivity(setup):
    """The segmented-coherent detector must hold detection at 2 dB SNR —
    the regime where the round-2 differential-phase metric detected under
    half the frames (docs/ber_gmsk_v27: det 17/40 at 2 dB then; 40/40
    now).  Pinned so a detector change can't silently give the ~3 dB
    back."""
    params, sync, step = setup
    props = gf.gmsk_default_props()
    rng = np.random.default_rng(5)
    header = rng.integers(0, 256, 8, dtype=np.uint8)
    payload = rng.integers(0, 256, 150, dtype=np.uint8)
    frame = np.asarray(gf.gmsk_assemble(params, props, jnp.asarray(header),
                                        jnp.asarray(payload)))
    sig = float(np.mean(np.abs(frame) ** 2))
    hits = 0
    for seed in range(5):
        stream = np.zeros(3000 + len(frame), np.complex64)
        pos = 700 + 450 * seed
        stream[pos:pos + len(frame)] = frame
        noisy = np.asarray(chan.channel_apply(
            chan.Channel(snr_db=2.0, cfo=0.001), jax.random.PRNGKey(seed),
            jnp.asarray(stream), signal_power=sig))
        frames = _run(sync, step, noisy)
        hits += any(abs(f["t"] - pos) <= 2 * params.k for f in frames)
    assert hits == 5, hits


def test_zero_db_header_decode():
    """Headers must decode at 0 dB SNR once a frame is detected.

    Pins the periodogram stage-1 CFO estimator: the old adjacent-symbol
    product estimate had ~0.035 rad/sample noise at 0 dB, wrapping the
    split-half stage-2 (+-0.0245 ambiguity) and collapsing the V&V phase
    tracking on ~25% of frames (docs/ber_gmsk_v27: hdr_err 10/40 at
    0 dB then; 0/40 now).  A regression in any carrier-recovery stage
    shows up here as header failures."""
    params = gf.make_gmsk_params(k=2, m=3, bt=0.5)
    props = gf.gmsk_default_props()._replace(
        fec0=fec.FEC_CONV_V27, fec1=fec.FEC_NONE)
    from liquid_usrp_tpu.framing import payload as payload_codec
    expansion = payload_codec.required_expansion(props, 200)
    sync = gf.make_gmsk_sync(params, block_size=BLOCK, max_payload=512,
                             max_frames=4, enable_conv=True, soft=True,
                             expansion=expansion)
    step = gf.make_gmsk_sync_step(sync)
    rng = np.random.default_rng(11)
    header = rng.integers(0, 256, 8, dtype=np.uint8)
    payload = rng.integers(0, 256, 200, dtype=np.uint8)
    frame = np.asarray(gf.gmsk_assemble(params, props, jnp.asarray(header),
                                        jnp.asarray(payload),
                                        expansion=expansion))
    sig = float(np.mean(np.abs(frame) ** 2))
    hdr_ok = pay_ok = 0
    n_trials = 6
    for seed in range(n_trials):
        stream = np.zeros(2500 + len(frame), np.complex64)
        pos = 600 + 290 * seed
        stream[pos:pos + len(frame)] = frame
        noisy = np.asarray(chan.channel_apply(
            chan.Channel(snr_db=0.0, cfo=0.001), jax.random.PRNGKey(seed),
            jnp.asarray(stream), signal_power=sig))
        frames = _run(sync, step, noisy)
        hdr_ok += any(f["header_valid"] for f in frames)
        pay_ok += any(f["payload_valid"] and
                      np.array_equal(f["payload"], payload) for f in frames)
    assert hdr_ok == n_trials, (hdr_ok, n_trials)
    assert pay_ok == n_trials, (pay_ok, n_trials)


def test_awgn_cfo_loopback(setup):
    params, sync, step = setup
    props = gf.FrameProps(check=crc.CRC_32, fec0=fec.FEC_NONE,
                          fec1=fec.FEC_GOLAY2412, mod=0)
    rng = np.random.default_rng(2)
    header = rng.integers(0, 256, 8, dtype=np.uint8)
    payload = rng.integers(0, 256, 120, dtype=np.uint8)
    frame = np.asarray(gf.gmsk_assemble(params, props, jnp.asarray(header),
                                        jnp.asarray(payload)))
    stream = np.zeros(2500 + len(frame), np.complex64)
    stream[800:800 + len(frame)] = frame
    ch = chan.Channel(snr_db=20.0, cfo=0.002, phase=1.0)
    stream = np.asarray(chan.channel_apply(
        ch, jax.random.PRNGKey(3), jnp.asarray(stream)))
    frames = _run(sync, step, stream)
    ok = [f for f in frames if f["payload_valid"]]
    assert len(ok) == 1, frames
    np.testing.assert_array_equal(ok[0]["payload"], payload)
    np.testing.assert_allclose(ok[0]["cfo"], 0.002, atol=2e-3)


@pytest.mark.slow
def test_gmsk_batched_blocks_equal_sequential(setup):
    """gmsk_sync_blocks_batched == scan of gmsk_sync_block: same
    detections, payloads, and stats on a multi-frame stream."""
    params, sync, step = setup
    rng = np.random.default_rng(7)
    pieces = []
    for i in range(4):
        header = rng.integers(0, 256, 8, dtype=np.uint8)
        payload = rng.integers(0, 256, 100 + 30 * i, dtype=np.uint8)
        pieces.append(np.zeros(int(rng.integers(400, 1800)), np.complex64))
        pieces.append(np.asarray(gf.gmsk_assemble(
            params, gf.gmsk_default_props(), jnp.asarray(header),
            jnp.asarray(payload))))
    stream = np.concatenate(pieces)
    n_blocks = -(-len(stream) // sync.block_size) + \
        int(np.ceil(sync.overlap / sync.block_size)) + 1
    stream = np.concatenate(
        [stream, np.zeros(n_blocks * sync.block_size - len(stream),
                          np.complex64)])
    stream = stream + (0.02 * (
        np.random.default_rng(8).normal(size=stream.shape) +
        1j * np.random.default_rng(9).normal(size=stream.shape))
    ).astype(np.complex64)

    seq = _run(sync, step, stream)

    state = gf.gmsk_sync_init(sync)
    blocks = jnp.asarray(stream.reshape(n_blocks, sync.block_size))
    state2, res = gf.gmsk_sync_blocks_batched(sync, state, blocks)
    res = jax.tree.map(np.asarray, res)
    bat = []
    for b, k in zip(*np.nonzero(res.detected)):
        bat.append({
            "t": int(res.t_start[b, k]),
            "header_valid": bool(res.header_valid[b, k]),
            "payload_valid": bool(res.payload_valid[b, k]),
            "header": res.header[b, k],
            "payload": res.payload[b, k][: int(res.payload_len[b, k])],
            "cfo": float(res.cfo[b, k]),
        })
    bat.sort(key=lambda f: f["t"])
    assert len(bat) == len(seq) == 4
    for a, c in zip(seq, bat):
        assert a["t"] == c["t"]
        assert a["header_valid"] == c["header_valid"]
        assert a["payload_valid"] == c["payload_valid"]
        np.testing.assert_array_equal(a["header"], c["header"])
        np.testing.assert_array_equal(a["payload"], c["payload"])
        np.testing.assert_allclose(a["cfo"], c["cfo"], atol=1e-6)
    # carried state matches the sequential scan's
    st_seq = gf.gmsk_sync_init(sync)
    for b in range(n_blocks):
        st_seq, _ = step(st_seq, blocks[b])
    np.testing.assert_allclose(np.asarray(state2.tail),
                               np.asarray(st_seq.tail), atol=1e-6)
    assert int(state2.base) == int(st_seq.base)


def test_small_m_frames_decode_at_every_block_position():
    """m=1 geometry: frames whose tail reaches deep into the overlap
    margin must still decode (the old 8k margin clipped the final
    samples at the buffer edge for small m — intermittent CRC garbage)."""
    params = gf.make_gmsk_params(k=2, m=1, bt=0.5)
    sync = gf.make_gmsk_sync(params, block_size=4096, max_payload=64,
                             max_frames=2)
    step = gf.make_gmsk_sync_step(sync)
    rng = np.random.default_rng(6)
    header = rng.integers(0, 256, 8, dtype=np.uint8)
    payload = rng.integers(0, 256, 48, dtype=np.uint8)
    frame = np.asarray(gf.gmsk_assemble(
        params, gf.gmsk_default_props(), jnp.asarray(header),
        jnp.asarray(payload)))
    bs = sync.block_size
    # sweep the frame start across the block seam region
    for pos in range(bs - len(frame) - 40, bs - len(frame) + 40, 8):
        stream = np.zeros(3 * bs, np.complex64)
        stream[pos:pos + len(frame)] = frame
        st = gf.gmsk_sync_init(sync)
        got = []
        for b in range(3):
            st, r = step(st, jnp.asarray(stream[b * bs:(b + 1) * bs]))
            for i in np.nonzero(np.asarray(r.payload_valid))[0]:
                got.append(np.asarray(r.payload[i])[:48])
        assert len(got) == 1, f"pos={pos}: {len(got)} frames"
        np.testing.assert_array_equal(got[0], payload, err_msg=str(pos))
