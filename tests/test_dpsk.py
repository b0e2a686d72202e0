"""Honest differential PSK in the frame path.

The liquid modem's dpsk2/4/8 are genuinely differential
(/root/reference/src/narrowband_tx.cc:153-154): data rides phase
*increments*, so a static channel phase cancels with no equalizer help.
These tests pin that property at the shared payload-codec level (a coherent
mapping provably cannot pass the phase-offset case) and end-to-end through
the OFDM frame loopback.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from liquid_usrp_tpu.framing import ofdm, ofdm_sync, payload as pc
from liquid_usrp_tpu.ops import modem
from liquid_usrp_tpu.utils.bits import unpack_bits

from test_ofdm_loopback import _make_frame, _run_stream


def _codec_points(props, payload):
    """Replicate the TX payload point stream for the codec."""
    enc = pc.encode_payload(props, jnp.asarray(payload))
    bps = modem.bits_per_symbol(props.mod)
    pbits = unpack_bits(enc)
    pad = -(-pbits.shape[-1] // bps) * bps - pbits.shape[-1]
    if pad:
        pbits = jnp.concatenate([pbits, jnp.zeros(pad, dtype=pbits.dtype)])
    pts = modem.modulate(props.mod, modem.bits_to_symbols(pbits, bps))
    if modem.is_differential(props.mod):
        pts = pc.diff_encode_points(pts)
    return pts


def _codec_decode(sync_enc_max, max_payload, props, points, plen):
    n_pts = sync_enc_max * 8 + 1
    pad = n_pts - points.shape[-1]
    points = jnp.concatenate(
        [points, jnp.zeros((pad,), points.dtype)])[None, :]
    mk = lambda v: jnp.asarray([v], jnp.int32)  # noqa: E731
    payload, valid = pc.decode_payload_batch(
        sync_enc_max, max_payload + 4, max_payload, points,
        mk(props.mod), mk(props.fec0), mk(props.fec1), mk(props.check),
        mk(plen), jnp.asarray([True]))
    return np.asarray(payload[0][:plen]), bool(valid[0])


@pytest.mark.parametrize("mod", [modem.MOD_DPSK2, modem.MOD_DPSK4,
                                 modem.MOD_DPSK8])
@pytest.mark.slow
def test_dpsk_codec_survives_static_phase(mod):
    """DPSK payload decodes under a static phase offset with NO equalizer."""
    rng = np.random.default_rng(5)
    payload = rng.integers(0, 256, 96, dtype=np.uint8)
    props = ofdm.FrameProps(mod=mod)
    pts = _codec_points(props, payload)
    rot = jnp.asarray(np.complex64(np.exp(1j * 0.8)))
    dec, ok = _codec_decode(256 * 3, 256, props, pts * rot, len(payload))
    assert ok
    assert np.array_equal(dec, payload)


def test_coherent_codec_fails_static_phase():
    """Control: the same offset breaks a coherent QPSK payload (no EQ), so
    the DPSK pass above cannot come from a mislabeled coherent mapping."""
    rng = np.random.default_rng(5)
    payload = rng.integers(0, 256, 96, dtype=np.uint8)
    props = ofdm.FrameProps(mod=modem.MOD_QPSK)
    pts = _codec_points(props, payload)
    rot = jnp.asarray(np.complex64(np.exp(1j * 0.8)))
    dec, ok = _codec_decode(256 * 3, 256, props, pts * rot, len(payload))
    assert not ok


def test_dpsk_ofdm_loopback():
    """End-to-end: dpsk4 payload through the OFDM frame + synchronizer."""
    params = ofdm.make_ofdm_params(M=48, cp_len=6, taper_len=4)
    sync = ofdm_sync.make_sync(params, block_size=8192, max_payload=512,
                               max_frames=4)
    step = ofdm_sync.make_sync_step(sync)
    props = ofdm.FrameProps(mod=modem.MOD_DPSK4)
    header, payload, samples = _make_frame(params, props, 3, 200)
    stream = np.zeros(3000 + len(samples), np.complex64)
    stream[1200:1200 + len(samples)] = samples
    frames = _run_stream(sync, step, stream)
    assert len(frames) == 1
    f = frames[0]
    assert f["header_valid"] and f["payload_valid"]
    assert np.array_equal(f["payload"][:200], payload)
