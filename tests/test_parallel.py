"""Sharded stream processing tests on the 8-device virtual CPU mesh.

Validates the SP/TP analogs (SURVEY.md §2.2): time-block sharding with
ppermute halo exchange must reproduce the sequential synchronizer exactly;
channel sharding must recover per-channel payloads from the mixture.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from liquid_usrp_tpu.framing import ofdm, ofdm_sync
from liquid_usrp_tpu.io import channel_model as chan
from liquid_usrp_tpu.models.multichannel import MultichannelTx
from liquid_usrp_tpu.parallel import stream as pstream
from liquid_usrp_tpu.parallel.mesh import factor_devices


@pytest.fixture(scope="module")
def params():
    return ofdm.make_ofdm_params(M=48, cp_len=6, taper_len=4)


def test_factor_devices():
    assert factor_devices(8) == (4, 2) or factor_devices(8) == (2, 4)
    assert factor_devices(1) == (1, 1)
    t, c = factor_devices(6)
    assert t * c == 6


def test_time_sharded_matches_sequential(params):
    assert jax.device_count() >= 8, "conftest must provide 8 cpu devices"
    mesh = jax.make_mesh((8,), ("time",))
    sync = ofdm_sync.make_sync(params, block_size=4096, max_payload=128,
                               max_frames=4)
    chunk_blocks = 2
    total = 8 * chunk_blocks * 4096

    # stream with frames scattered across shard boundaries
    rng = np.random.default_rng(0)
    streamv = np.zeros(total, np.complex64)
    props = ofdm.FrameProps()
    sent = []
    pos = 2000
    pid = 0
    while True:
        payload = rng.integers(0, 256, 96, dtype=np.uint8)
        header = rng.integers(0, 256, 8, dtype=np.uint8)
        frame = np.asarray(ofdm.assemble_frame(
            params, props, jnp.asarray(header), jnp.asarray(payload)))
        if pos + len(frame) >= total - sync.overlap:
            break
        streamv[pos:pos + len(frame)] = frame
        sent.append((pos, header, payload))
        pos += len(frame) + 5000   # crosses 8192-sample shard boundaries
        pid += 1
    streamv = np.asarray(chan.channel_apply(
        chan.Channel(snr_db=30.0, cfo=0.001), jax.random.PRNGKey(1),
        jnp.asarray(streamv), signal_power=0.8))

    run = pstream.make_time_sharded_sync(mesh, sync, chunk_blocks)
    res = jax.tree.map(np.asarray, run(jnp.asarray(streamv)))
    det = res.detected & res.payload_valid
    rows = np.nonzero(det)[0]
    got = sorted((int(res.t_start[r]),
                  np.asarray(res.header[r]),
                  np.asarray(res.payload[r])[: int(res.payload_len[r])])
                 for r in rows)
    assert len(got) == len(sent), (len(got), len(sent))
    for (t_got, h_got, p_got), (t_want, h_want, p_want) in zip(got, sent):
        assert abs(t_got - t_want) <= 2
        np.testing.assert_array_equal(h_got, h_want)
        np.testing.assert_array_equal(p_got, p_want)

    # sequential oracle: same sync config run block-by-block
    step = ofdm_sync.make_sync_step(sync)
    state = ofdm_sync.sync_init(sync)
    seq = []
    padded = np.concatenate(
        [np.asarray(streamv), np.zeros(sync.overlap + 4096, np.complex64)])
    nb = len(padded) // 4096
    for b in range(nb):
        state, r = step(state, jnp.asarray(padded[b * 4096:(b + 1) * 4096]))
        for i in np.nonzero(np.asarray(r.detected) &
                            np.asarray(r.payload_valid))[0]:
            seq.append((int(r.t_start[i]),
                        np.asarray(r.payload[i])[: int(r.payload_len[i])]))
    seq.sort()
    assert len(seq) == len(got)
    for (t_s, p_s), (t_g, _, p_g) in zip(seq, got):
        assert t_s == t_g
        np.testing.assert_array_equal(p_s, p_g)


def test_channel_sharded_mcrx(params):
    N = 4
    mesh = jax.make_mesh((2, 4), ("time", "channel"))
    sync = ofdm_sync.make_sync(params, block_size=2048, max_payload=64,
                               max_frames=4)
    chunk_blocks = 2
    B = chunk_blocks * 2048
    total_mix = 2 * N * B * 2      # two time shards

    tx = MultichannelTx(N, M=48, cp_len=6, taper_len=4)
    rng = np.random.default_rng(3)
    sent = {}
    for ch in range(N):
        header = rng.integers(0, 256, 8, dtype=np.uint8)
        header[2] = ch
        payload = rng.integers(0, 256, 48, dtype=np.uint8)
        tx.update_data(ch, header, payload)
        sent[ch] = (header, payload)
    mixture = tx.generate_samples(total_mix // (2 * N))
    assert len(mixture) == total_mix

    run = pstream.make_sharded_mcrx(mesh, N, sync, chunk_blocks)
    res = jax.tree.map(np.asarray, run(jnp.asarray(mixture)))
    det = res.detected & res.payload_valid
    found = {}
    for ch, r in zip(*np.nonzero(det)):
        found[int(ch)] = np.asarray(res.payload[ch, r])[
            : int(res.payload_len[ch, r])]
    assert set(found) == set(range(N)), sorted(found)
    for ch, (header, payload) in sent.items():
        np.testing.assert_array_equal(found[ch], payload)


def test_a2a_mcrx_matches_duplicate_channelizer(params):
    """The all-to-all resharded receiver finds the same frames as the
    duplicate-channelizer version."""
    N = 4
    mesh = jax.make_mesh((2, 4), ("time", "channel"))
    sync = ofdm_sync.make_sync(params, block_size=2048, max_payload=64,
                               max_frames=4)
    chunk_blocks = 1
    B_grp = chunk_blocks * 2048 * 4
    total_mix = 2 * N * B_grp * 2          # two time rows

    tx = MultichannelTx(N, M=48, cp_len=6, taper_len=4)
    rng = np.random.default_rng(5)
    sent = {}
    for ch in range(N):
        header = rng.integers(0, 256, 8, dtype=np.uint8)
        header[2] = ch
        payload = rng.integers(0, 256, 48, dtype=np.uint8)
        tx.update_data(ch, header, payload)
        sent[ch] = payload
    mixture = tx.generate_samples(total_mix // (2 * N))

    run = pstream.make_sharded_mcrx_a2a(mesh, N, sync, chunk_blocks)
    res = jax.tree.map(np.asarray, run(jnp.asarray(mixture)))
    det = res.detected & res.payload_valid
    found = {}
    for ch, r in zip(*np.nonzero(det)):
        found[int(ch)] = np.asarray(res.payload[ch, r])[
            : int(res.payload_len[ch, r])]
    assert set(found) == set(range(N)), sorted(found)
    for ch, payload in sent.items():
        np.testing.assert_array_equal(found[ch], payload)


@pytest.mark.slow
def test_a2a_pipelined_matches_one_shot(params):
    """``n_steps > 1`` software-pipelined super-step scan (the overlapped
    a2a of docs/scaling.md): carried analysis/NCO/sync state across
    super-steps must make it equal to the one-shot a2a receiver over the
    same stream — including frames straddling the super-step boundaries —
    and both must recover every injected payload exactly."""
    from liquid_usrp_tpu.models.multichannel import make_mctx_step

    N = 4
    mesh = jax.make_mesh((2, 4), ("time", "channel"))
    sync = ofdm_sync.make_sync(params, block_size=2048, max_payload=64,
                               max_frames=4)
    n_steps, chunk_blocks = 3, 1
    B_sub = chunk_blocks * 2048
    n_dev = 8
    step_csamp = n_dev * B_sub                  # channel-samples per step
    T = n_steps * step_csamp
    props = ofdm.default_props()
    flen = ofdm.frame_length(params, props, 48)
    # one frame mid-stream plus one straddling EACH super-step boundary
    positions = [1200, step_csamp - flen // 2, int(1.5 * step_csamp),
                 2 * step_csamp - flen // 2, int(2.45 * step_csamp)]
    assert all(b - a >= flen + 200 for a, b in zip(positions,
                                                   positions[1:]))
    assert positions[-1] + flen < T - sync.overlap

    rng = np.random.default_rng(9)
    sent = {}                                   # (ch, pos) -> payload
    streams = np.zeros((T, N), np.complex64)
    for ch in range(N):
        for pos in positions:
            h = rng.integers(0, 256, 8, dtype=np.uint8)
            p = rng.integers(0, 256, 48, dtype=np.uint8)
            w = np.asarray(ofdm.assemble_frame(
                params, props, jnp.asarray(h), jnp.asarray(p)))
            streams[pos:pos + flen, ch] = w
            sent[(ch, pos)] = p
    init, step = make_mctx_step(N)
    st = init()
    out = []
    for lo in range(0, T, 1 << 14):
        Y = np.zeros((1 << 14, 2 * N), np.complex64)
        Y[:, :N] = streams[lo:lo + (1 << 14)]
        st, y = step(st, jnp.asarray(Y))
        out.append(np.asarray(y))
    mixture = np.concatenate(out)               # [2N * T]

    def collect(res):
        det = np.asarray(res.detected & res.payload_valid)
        got = set()
        for ch, r in zip(*np.nonzero(det)):
            got.add((int(ch), int(np.asarray(res.t_start)[ch, r]),
                     bytes(np.asarray(res.payload)[ch, r][
                         : int(np.asarray(res.payload_len)[ch, r])])))
        return got

    run_pipe = pstream.make_sharded_mcrx_a2a(
        mesh, N, sync, chunk_blocks, n_steps=n_steps)
    got_pipe = collect(run_pipe(
        jnp.asarray(mixture.reshape(n_steps, -1))))

    run_one = pstream.make_sharded_mcrx_a2a(
        mesh, N, sync, chunk_blocks * n_steps)
    got_one = collect(run_one(jnp.asarray(mixture)))

    assert got_pipe == got_one
    assert len(got_pipe) == len(sent)
    # match by payload; t_start trails the injected channel-sample
    # position by the constant synthesis+analysis PFB cascade group
    # delay (m=13 + m=7 prototype semilengths ~ 19 channel-samples)
    deltas = set()
    for ch, t, p in got_pipe:
        match = [(pos, q) for (c, pos), q in sent.items()
                 if c == ch and q.tobytes() == p]
        assert len(match) == 1, (ch, t)
        deltas.add(t - match[0][0])
    assert len(deltas) == 1 and 0 <= deltas.pop() <= 64, deltas


def _time_sharded_family_case(make_burst, make_sync_state_step, sync,
                              gap, seed):
    """Shared harness: frames across shard boundaries; time-sharded
    results must match the sequential scan frame-for-frame."""
    mesh = jax.make_mesh((8,), ("time",))
    chunk_blocks = 2
    bs = sync.block_size
    total = 8 * chunk_blocks * bs
    rng = np.random.default_rng(seed)
    streamv = np.zeros(total, np.complex64)
    sent = []
    pos = 1500
    while True:
        header = rng.integers(0, 256, getattr(sync, "header_user", 8),
                              dtype=np.uint8)
        payload = rng.integers(0, 256, 90, dtype=np.uint8)
        frame = make_burst(header, payload)
        if pos + len(frame) >= total - sync.overlap:
            break
        streamv[pos:pos + len(frame)] = frame
        sent.append((pos, payload))
        pos += len(frame) + gap
    streamv = np.asarray(chan.channel_apply(
        chan.Channel(snr_db=30.0, cfo=0.0005), jax.random.PRNGKey(seed),
        jnp.asarray(streamv), signal_power=0.8))

    run = pstream.make_time_sharded_sync(mesh, sync, chunk_blocks)
    res = jax.tree.map(np.asarray, run(jnp.asarray(streamv)))
    det = res.detected & res.payload_valid
    got = sorted((int(res.t_start[r]),
                  np.asarray(res.payload[r])[: int(res.payload_len[r])])
                 for r in np.nonzero(det)[0])
    assert len(got) == len(sent) > 2, (len(got), len(sent))
    for (t_g, p_g), (t_w, p_w) in zip(got, sent):
        assert abs(t_g - t_w) <= 2
        np.testing.assert_array_equal(p_g, p_w)

    # sequential oracle
    init_state, step = make_sync_state_step()
    state = init_state
    seq = []
    padded = np.concatenate(
        [np.asarray(streamv), np.zeros(sync.overlap + bs, np.complex64)])
    for b in range(len(padded) // bs):
        state, r = step(state, jnp.asarray(padded[b * bs:(b + 1) * bs]))
        for i in np.nonzero(np.asarray(r.detected) &
                            np.asarray(r.payload_valid))[0]:
            seq.append((int(r.t_start[i]),
                        np.asarray(r.payload[i])[: int(r.payload_len[i])]))
    seq.sort()
    assert [t for t, _ in seq] == [t for t, _ in got]
    for (t_s, p_s), (t_g, p_g) in zip(seq, got):
        np.testing.assert_array_equal(p_s, p_g)


@pytest.mark.slow
def test_time_sharded_flex_matches_sequential():
    from liquid_usrp_tpu.framing import flexframe as ff
    from liquid_usrp_tpu.framing import flexframe_sync as ffs
    params = ff.make_flex_params(k=2, m=7, beta=0.3)
    sync = ffs.make_flex_sync(params, block_size=4096, max_payload=128,
                              max_frames=4)
    _time_sharded_family_case(
        lambda h, p: np.asarray(ff.flex_assemble(
            params, ff.default_props(), jnp.asarray(h), jnp.asarray(p))),
        lambda: (ffs.flex_sync_init(sync), ffs.make_flex_sync_step(sync)),
        sync, gap=5000, seed=3)


@pytest.mark.slow
def test_time_sharded_gmsk_matches_sequential():
    from liquid_usrp_tpu.framing import gmskframe as gf
    params = gf.make_gmsk_params(k=2, m=3, bt=0.5)
    sync = gf.make_gmsk_sync(params, block_size=4096, max_payload=128,
                             max_frames=4)
    _time_sharded_family_case(
        lambda h, p: np.asarray(gf.gmsk_assemble(
            params, gf.gmsk_default_props(), jnp.asarray(h),
            jnp.asarray(p))),
        lambda: (gf.gmsk_sync_init(sync), gf.make_gmsk_sync_step(sync)),
        sync, gap=5200, seed=4)


def test_sharded_mctx_matches_sequential():
    """The synthesis dual (make_sharded_mctx): per-channel baseband
    sharded [channel x time] -> all_to_all -> fine-time-sharded PFB
    synthesis + exact-DDS centering NCO must equal the sequential
    make_mctx_step scan sample-for-sample."""
    from liquid_usrp_tpu.models.multichannel import make_mctx_step
    assert jax.device_count() >= 8
    mesh = jax.make_mesh((2, 4), ("time", "channel"))
    N = 4
    B_sub = 2048                       # channel-samples per fine chunk
    T = 2 * 4 * B_sub                  # n_time * n_ch * B_sub

    # per-channel baseband: real frames on ch 0/2, tones + zeros elsewhere
    rng = np.random.default_rng(7)
    params = ofdm.make_ofdm_params(M=48, cp_len=6, taper_len=4)
    streams = np.zeros((N, T), np.complex64)
    for ch in (0, 2):
        pos = 100
        while pos + 2000 < T:
            f = np.asarray(ofdm.assemble_frame(
                params, ofdm.FrameProps(),
                jnp.asarray(rng.integers(0, 256, 8, dtype=np.uint8)),
                jnp.asarray(rng.integers(0, 256, 64, dtype=np.uint8))))
            streams[ch, pos:pos + len(f)] = f
            pos += len(f) + int(rng.integers(500, 1500))
    streams[1] = np.exp(2j * np.pi * 0.01 * np.arange(T)).astype(
        np.complex64)

    run = pstream.make_sharded_mctx(mesh, N, B_sub)
    mix_sharded = run(jnp.asarray(streams))
    assert mix_sharded.shape == (2 * N * T,)

    init, step = make_mctx_step(N)
    st = init()
    out = []
    for lo in range(0, T, 4096):
        Y = jnp.zeros((4096, 2 * N), jnp.complex64).at[:, :N].set(
            jnp.asarray(streams[:, lo:lo + 4096].T))
        st, y = step(st, Y)
        out.append(np.asarray(y))
    mix_seq = np.concatenate(out)

    np.testing.assert_allclose(mix_sharded, mix_seq, atol=2e-5)


@pytest.mark.slow
def test_time_sharded_wlan_matches_sequential():
    """The 802.11a synchronizer rides the same time-sharded
    infrastructure as the other frame families: sharded results equal
    the sequential scan frame-for-frame."""
    from liquid_usrp_tpu.framing import wlan
    sync = wlan.make_wlan_sync(block_size=4096, max_psdu=64, max_frames=2)
    mesh = jax.make_mesh((8,), ("time",))
    chunk_blocks = -(-sync.overlap // sync.block_size) + 1
    bs = sync.block_size
    total = 8 * chunk_blocks * bs
    rng = np.random.default_rng(17)
    streamv = np.zeros(total, np.complex64)
    sent = []
    pos = 1500
    while True:
        rate = [6, 24, 54][len(sent) % 3]
        psdu = rng.integers(0, 256, 40, dtype=np.uint8)
        frame = np.asarray(wlan.wlan_assemble(rate, psdu))
        if pos + len(frame) >= total - sync.overlap:
            break
        streamv[pos:pos + len(frame)] = frame
        sent.append((pos, rate, psdu))
        pos += len(frame) + 4000
    n = np.arange(total)
    streamv = (0.8 * np.exp(1j * 0.4) * streamv *
               np.exp(1j * 0.002 * n)).astype(np.complex64)
    streamv += (0.02 * (rng.normal(size=total) +
                        1j * rng.normal(size=total))).astype(np.complex64)

    run = pstream.make_time_sharded_sync(mesh, sync, chunk_blocks)
    res = jax.tree.map(np.asarray, run(jnp.asarray(streamv)))
    det = res.detected & res.psdu_valid
    got = sorted((int(res.t_start[r]), int(res.rate[r]),
                  np.asarray(res.psdu[r])[: int(res.length[r])])
                 for r in np.nonzero(det)[0])
    assert len(got) == len(sent) > 2, (len(got), len(sent))
    for (t_g, r_g, p_g), (t_w, r_w, p_w) in zip(got, sent):
        assert t_g == t_w
        assert r_g == r_w
        np.testing.assert_array_equal(p_g, p_w)

    # sequential oracle
    step = wlan.make_wlan_sync_step(sync)
    state = wlan.wlan_sync_init(sync)
    seq = []
    padded = np.concatenate(
        [streamv, np.zeros(sync.overlap + bs, np.complex64)])
    for b in range(len(padded) // bs):
        state, r = step(state, jnp.asarray(padded[b * bs:(b + 1) * bs]))
        for i in np.nonzero(np.asarray(r.detected) &
                            np.asarray(r.psdu_valid))[0]:
            seq.append((int(r.t_start[i]), int(r.rate[i]),
                        np.asarray(r.psdu[i])[: int(r.length[i])]))
    seq.sort()
    assert [(t, r) for t, r, _ in seq] == [(t, r) for t, r, _ in got]
    for (_, _, p_s), (_, _, p_g) in zip(seq, got):
        np.testing.assert_array_equal(p_s, p_g)
