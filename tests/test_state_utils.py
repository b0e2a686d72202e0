"""Checkpoint/resume + config layer tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from liquid_usrp_tpu.framing import ofdm, ofdm_sync
from liquid_usrp_tpu.utils import checkpoint
from liquid_usrp_tpu.utils.config import OfdmConfig, parse_crc


def test_checkpoint_resume_mid_stream(tmp_path):
    """Interrupt a sync run, checkpoint, resume: identical results to an
    uninterrupted run (impossible in the reference — its state is hidden
    inside liquid-dsp objects)."""
    params = ofdm.make_ofdm_params(48, 6, 4)
    sync = ofdm_sync.make_sync(params, block_size=4096, max_payload=128,
                               max_frames=4)
    step = ofdm_sync.make_sync_step(sync)
    rng = np.random.default_rng(0)
    props = ofdm.default_props()
    payload = rng.integers(0, 256, 96, dtype=np.uint8)
    header = rng.integers(0, 256, 8, dtype=np.uint8)
    frame = np.asarray(ofdm.assemble_frame(
        params, props, jnp.asarray(header), jnp.asarray(payload)))
    stream = np.zeros(4096 * 6, np.complex64)
    stream[5000:5000 + len(frame)] = frame

    def run(state, blocks):
        out = []
        for b in blocks:
            state, res = step(state, jnp.asarray(b))
            out.append(res)
        return state, out

    blocks = [stream[i * 4096:(i + 1) * 4096] for i in range(6)]
    # uninterrupted
    _, full = run(ofdm_sync.sync_init(sync), blocks)
    # interrupted + checkpointed after 3 blocks
    st, first = run(ofdm_sync.sync_init(sync), blocks[:3])
    ckpt = str(tmp_path / "sync_state.npz")
    checkpoint.save_state(ckpt, st)
    restored = checkpoint.load_state(ckpt, ofdm_sync.sync_init(sync))
    _, second = run(restored, blocks[3:])
    resumed = first + second
    for a, b in zip(full, resumed):
        np.testing.assert_array_equal(np.asarray(a.detected),
                                      np.asarray(b.detected))
        np.testing.assert_array_equal(np.asarray(a.payload),
                                      np.asarray(b.payload))
        np.testing.assert_array_equal(np.asarray(a.t_start),
                                      np.asarray(b.t_start))


def test_config_validation():
    cfg = OfdmConfig()
    assert cfg.validate() is cfg
    with pytest.raises(ValueError):
        OfdmConfig(num_subcarriers=4).validate()
    with pytest.raises(ValueError):
        OfdmConfig(taper_len=10, cp_len=6).validate()
    props = cfg.props.to_props()
    assert props.mod == 1  # qpsk
    with pytest.raises(ValueError):
        parse_crc("bogus")


@pytest.mark.slow
def test_app_checkpoint_resume_split_stream(tmp_path):
    """ofdmflexframe_rx --save-state/--load-state: a stream split at an
    arbitrary mid-frame sample decodes the same packet total as one run
    (synchronizer tail, stream base, and partial-block pending all carry)."""
    import re
    from liquid_usrp_tpu.apps import ofdmflexframe_rx, ofdmflexframe_tx
    from liquid_usrp_tpu.io.streams import read_iq, write_iq
    from test_apps import _capture

    iq = str(tmp_path / "ck.iq")
    rc, _ = _capture(ofdmflexframe_tx.main,
                     ["-o", iq, "-N", "8", "-P", "512"])
    assert rc == 0
    s = read_iq(iq)
    assert len(s) > 55000           # several sync blocks in each part
    cut = 55001                     # arbitrary, mid-frame, off block grid
    a_iq, b_iq = str(tmp_path / "a.iq"), str(tmp_path / "b.iq")
    write_iq(a_iq, s[:cut])
    write_iq(b_iq, s[cut:])
    st = str(tmp_path / "st")

    def packets(out):
        return int(re.search(r"valid packets\s+:\s+(\d+)", out).group(1))

    rc, full = _capture(ofdmflexframe_rx.main,
                    ["-i", iq, "-q", "-p", "600"])
    assert rc == 0
    rc, a = _capture(ofdmflexframe_rx.main,
                     ["-i", a_iq, "-q", "-p", "600", "--save-state", st])
    assert rc == 0
    rc, b = _capture(ofdmflexframe_rx.main,
                     ["-i", b_iq, "-q", "-p", "600", "--load-state", st])
    assert rc == 0
    assert packets(full) == 8
    assert packets(a) + packets(b) == 8
    assert packets(a) > 0           # the split lands mid-stream, not at 0
