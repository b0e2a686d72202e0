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
