"""Minimal library-level loopback: assemble -> impaired channel -> sync.

The ~40-line core workflow of the framework, CPU-runnable in seconds:

    JAX_PLATFORMS=cpu python examples/01_loopback.py

Everything is a pure function: ``assemble_frame`` builds one burst as a
single batched graph, ``channel_apply`` adds deterministic AWGN+CFO, and
the synchronizer is a ``step(state, block)`` scanned over the stream.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

import jax
import jax.numpy as jnp

from liquid_usrp_tpu.framing import ofdm, ofdm_sync
from liquid_usrp_tpu.io import channel_model as chan


def main():
    params = ofdm.make_ofdm_params(M=48, cp_len=6, taper_len=4)
    props = ofdm.default_props()          # CRC32, none+Golay(24,12), QPSK

    rng = np.random.default_rng(0)
    header = rng.integers(0, 256, 8, dtype=np.uint8)
    payload = rng.integers(0, 256, 200, dtype=np.uint8)
    burst = ofdm.assemble_frame(params, props, jnp.asarray(header),
                                jnp.asarray(payload))

    stream = jnp.zeros(8 * 4096, jnp.complex64)
    stream = stream.at[3000:3000 + burst.shape[0]].set(burst)
    stream = chan.channel_apply(
        chan.Channel(snr_db=20.0, cfo=0.002), jax.random.PRNGKey(1),
        stream, signal_power=0.8)

    sync = ofdm_sync.make_sync(params, block_size=4096, max_payload=256,
                               max_frames=4)
    step = ofdm_sync.make_sync_step(sync)
    state = ofdm_sync.sync_init(sync)
    blocks = np.asarray(stream).reshape(-1, sync.block_size)
    for blk in blocks:
        state, res = step(state, jnp.asarray(blk))
        for i in np.nonzero(np.asarray(res.detected))[0]:
            ok = bool(res.payload_valid[i])
            print(f"frame @ t={int(res.t_start[i])}: "
                  f"cfo={float(res.cfo[i]):+.5f} "
                  f"evm={float(res.evm[i]):.1f} dB "
                  f"payload {'OK' if ok else 'FAIL'}")
            if ok:
                got = np.asarray(res.payload[i])[: int(res.payload_len[i])]
                assert np.array_equal(got, payload)
                print("payload recovered exactly")
                return 0
    raise SystemExit("frame not recovered")


if __name__ == "__main__":
    raise SystemExit(main())
