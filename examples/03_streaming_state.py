"""Streaming state: block-size invariance + checkpoint/resume mid-stream.

    JAX_PLATFORMS=cpu python examples/03_streaming_state.py

Every streaming op carries exact state (``step(state, block)``), so (a)
results are identical for ANY block chopping of the same stream, and (b)
the synchronizer state can be checkpointed to disk at an arbitrary split
point and resumed in a different process run (the reference's pthread
state machines have no analog of either).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

from liquid_usrp_tpu.framing import ofdm, ofdm_sync
from liquid_usrp_tpu.io import channel_model as chan
from liquid_usrp_tpu.utils.checkpoint import load_state, save_state


def decode_all(sync, step, stream, bs):
    state = ofdm_sync.sync_init(sync)
    rows = []
    pad = np.zeros((-len(stream)) % bs + sync.overlap + bs, np.complex64)
    full = np.concatenate([stream, pad])
    for lo in range(0, len(full) - len(full) % bs, bs):
        state, res = step(state, jnp.asarray(full[lo:lo + bs]))
        for i in np.nonzero(np.asarray(res.payload_valid))[0]:
            rows.append((int(res.t_start[i]),
                         bytes(np.asarray(res.payload[i])
                               [: int(res.payload_len[i])])))
    return rows


def main():
    params = ofdm.make_ofdm_params(M=48, cp_len=6, taper_len=4)
    rng = np.random.default_rng(3)
    stream = np.zeros(40000, np.complex64)
    pos = 1500
    n_frames = 0
    while True:
        f = np.asarray(ofdm.assemble_frame(
            params, ofdm.default_props(),
            jnp.asarray(rng.integers(0, 256, 8, dtype=np.uint8)),
            jnp.asarray(rng.integers(0, 256, 120, dtype=np.uint8))))
        if pos + len(f) + 6000 > len(stream):
            break
        stream[pos:pos + len(f)] = f
        pos += len(f) + 2000
        n_frames += 1
    stream = np.asarray(chan.channel_apply(
        chan.Channel(snr_db=25.0, cfo=0.001), jax.random.PRNGKey(4),
        jnp.asarray(stream), signal_power=0.8))

    # (a) block-size invariance: same payloads at bs=2048 and 8192
    # (with DIFFERENT sync builds the detected t may sit +-2 samples on
    # the metric plateau; the suite's stricter bit-identical test feeds
    # different choppings to the SAME sync — test_ofdm_loopback.py)
    sync = ofdm_sync.make_sync(params, block_size=2048, max_payload=128)
    rows_a = decode_all(sync, ofdm_sync.make_sync_step(sync), stream, 2048)
    sync_b = ofdm_sync.make_sync(params, block_size=8192, max_payload=128)
    rows_b = decode_all(sync_b, ofdm_sync.make_sync_step(sync_b),
                        stream, 8192)
    assert len(rows_a) == len(rows_b)
    for (ta, pa), (tb, pb) in zip(sorted(rows_a), sorted(rows_b)):
        assert abs(ta - tb) <= 2 and pa == pb, "block chopping changed results"
    print(f"{len(rows_a)}/{n_frames} frames, same at bs=2048 and 8192")

    # (b) checkpoint mid-stream, resume, same frames
    step = ofdm_sync.make_sync_step(sync)
    state = ofdm_sync.sync_init(sync)
    split = 10 * 2048
    rows_c = []

    def run(state, seg):
        for lo in range(0, len(seg) - len(seg) % 2048, 2048):
            state, res = step(state, jnp.asarray(seg[lo:lo + 2048]))
            for i in np.nonzero(np.asarray(res.payload_valid))[0]:
                rows_c.append((int(res.t_start[i]),
                               bytes(np.asarray(res.payload[i])
                                     [: int(res.payload_len[i])])))
        return state

    state = run(state, stream[:split])
    path = os.path.join(tempfile.mkdtemp(), "sync_state")
    save_state(path, state._asdict())
    state2 = type(state)(**load_state(path, state._asdict()))
    tail_pad = np.zeros(sync.overlap + 2048, np.complex64)
    run(state2, np.concatenate([stream[split:], tail_pad]))
    assert rows_c == rows_a, "checkpoint/resume changed results"
    print(f"checkpoint at sample {split}: resumed run decoded identically")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
