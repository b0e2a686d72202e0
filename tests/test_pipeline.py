"""Stage-pipelined stream driver test (file -> prefetch -> sync)."""
import numpy as np

import jax.numpy as jnp

from liquid_usrp_tpu.framing import ofdm, ofdm_sync
from liquid_usrp_tpu.io import streams
from liquid_usrp_tpu.io.pipeline import run_pipelined


def test_pipelined_file_rx(tmp_path):
    params = ofdm.make_ofdm_params(48, 6, 4)
    sync = ofdm_sync.make_sync(params, block_size=4096, max_payload=128,
                               max_frames=4)
    step = ofdm_sync.make_sync_step(sync)
    rng = np.random.default_rng(0)
    props = ofdm.default_props()
    header = rng.integers(0, 256, 8, dtype=np.uint8)
    payload = rng.integers(0, 256, 100, dtype=np.uint8)
    frame = np.asarray(ofdm.assemble_frame(
        params, props, jnp.asarray(header), jnp.asarray(payload)))
    stream = np.zeros(40000, np.complex64)
    stream[3000:3000 + len(frame)] = frame
    path = str(tmp_path / "pipe.iq")
    streams.write_iq(path, stream)

    got = []

    def on_results(res):
        for i in np.nonzero(np.asarray(res.detected))[0]:
            if bool(res.payload_valid[i]):
                got.append(np.asarray(res.payload[i])[
                    : int(res.payload_len[i])])

    run_pipelined(streams.iq_blocks(path, 1000), step,
                  ofdm_sync.sync_init(sync), on_results,
                  block_size=sync.block_size)
    assert len(got) == 1
    np.testing.assert_array_equal(got[0], payload)


def test_async_tx_producer():
    """The TX worker generates ahead of the consumer cursor and every
    submitted packet decodes at the receiver (SURVEY §2.2 async TX)."""
    import time as _time
    from liquid_usrp_tpu.io.pipeline import AsyncTxProducer
    from liquid_usrp_tpu.models.multichannel import (MultichannelTx,
                                                     MultichannelRx)

    N = 2
    rng = np.random.default_rng(9)
    tx = MultichannelTx(N, M=48, cp_len=6, taper_len=4)
    prod = AsyncTxProducer(tx, block_channel_samples=256, depth=6)
    sent = {}
    pid = 0
    for rep in range(2):
        for ch in range(N):
            header = np.zeros(8, np.uint8)
            header[0], header[1], header[2] = pid >> 8, pid & 0xFF, ch
            payload = rng.integers(0, 256, 96, dtype=np.uint8)
            prod.transmit_packet(ch, header, payload)
            sent[pid] = (ch, payload)
            pid += 1
    prod.close()
    # ahead-of-cursor: the worker fills its queue without any consumption
    # (first block pays the jit compile, so poll with a generous budget)
    deadline = _time.time() + 90
    while prod.queued_blocks() < 2 and _time.time() < deadline:
        _time.sleep(0.1)
    assert prod.queued_blocks() >= 2
    stream = np.concatenate(list(prod.blocks()))
    rx = MultichannelRx(N, M=48, cp_len=6, taper_len=4, block_size=4096,
                        max_payload=128)
    frames = rx.execute(stream) + rx.flush()
    got = {((int(f["header"][0]) << 8) | int(f["header"][1])): f
           for f in frames if f["payload_valid"]}
    assert set(got) == set(sent)
    for p, (ch, payload) in sent.items():
        assert got[p]["channel"] == ch
        assert np.array_equal(got[p]["payload"], payload)
