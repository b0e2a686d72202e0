"""Exhaustive payload-codec matrix at the codec level (no synchronizer).

The frame loopback tests sample a few mod/FEC combos end-to-end; this
pins the whole scheme matrix cheaply: every payload FEC (including the
conv/RS extended set) x CRC x a modem spread, encoded -> modulated ->
batch-decoded in ONE device call (the decode graph is runtime-switched
over scheme ids by design, so the entire matrix shares one compile).

Mirrors the role of liquid-dsp's autotest matrix over
``packetizer_create(crc, fec0, fec1)`` combinations.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from liquid_usrp_tpu.framing import ofdm, payload as pc
from liquid_usrp_tpu.ops import crc as crc_mod
from liquid_usrp_tpu.ops import fec as fec_mod
from liquid_usrp_tpu.ops import modem
from liquid_usrp_tpu.utils.bits import unpack_bits

PLEN = 96
# worst expansion in the matrix: rep5 inner x golay outer = 10x
EXPANSION = 12
ENC_MAX = EXPANSION * (PLEN + 4)
N_PTS = ENC_MAX * 8 + 1


def _points(props, payload):
    enc = pc.encode_payload(props, jnp.asarray(payload))
    bps = modem.bits_per_symbol(props.mod)
    pbits = unpack_bits(enc)
    pad = -(-pbits.shape[-1] // bps) * bps - pbits.shape[-1]
    if pad:
        pbits = jnp.concatenate([pbits, jnp.zeros(pad, dtype=pbits.dtype)])
    pts = modem.modulate(props.mod, modem.bits_to_symbols(pbits, bps))
    if modem.is_differential(props.mod):
        pts = pc.diff_encode_points(pts)
    return np.asarray(pts)


def _matrix():
    mods = [modem.MOD_BPSK, modem.MOD_QPSK, modem.MOD_QAM16]
    combos = []
    for i, f0 in enumerate(pc.PAYLOAD_FECS_FULL):
        for f1 in (fec_mod.FEC_NONE, fec_mod.FEC_HAMMING128):
            check = (crc_mod.CRC_16, crc_mod.CRC_32)[i % 2]
            mod = mods[i % len(mods)]
            combos.append(ofdm.FrameProps(check=check, fec0=f0, fec1=f1,
                                          mod=mod))
    return combos


def _decode_matrix(combos, pts_rows, soft):
    K = len(combos)
    P = np.zeros((K, N_PTS), np.complex64)
    for r, pts in enumerate(pts_rows):
        P[r, :len(pts)] = pts
    mk = lambda vs: jnp.asarray(vs, jnp.int32)                # noqa: E731
    fn = pc.decode_payload_batch_soft if soft else pc.decode_payload_batch
    payload, valid = fn(
        ENC_MAX, PLEN + 4, PLEN, jnp.asarray(P),
        mk([p.mod for p in combos]), mk([p.fec0 for p in combos]),
        mk([p.fec1 for p in combos]), mk([p.check for p in combos]),
        mk([PLEN] * K), jnp.asarray([True] * K),
        fecs=pc.PAYLOAD_FECS_FULL)
    return np.asarray(payload), np.asarray(valid)


@pytest.mark.parametrize("soft", [False, True], ids=["hard", "soft"])
@pytest.mark.slow
def test_full_fec_matrix_roundtrip(soft):
    combos = _matrix()
    rng = np.random.default_rng(11)
    payloads = [rng.integers(0, 256, PLEN, dtype=np.uint8)
                for _ in combos]
    rows = [_points(p, pay) for p, pay in zip(combos, payloads)]
    if soft:
        # mild noise: every code in the matrix must still decode clean,
        # and the conv branches exercise their true LLR path
        rows = [r + (0.02 * (rng.normal(size=r.shape)
                             + 1j * rng.normal(size=r.shape))
                     ).astype(np.complex64) for r in rows]
    dec, valid = _decode_matrix(combos, rows, soft)
    for r, (props, pay) in enumerate(zip(combos, payloads)):
        name = (f"{fec_mod.fec_name(props.fec0)}+"
                f"{fec_mod.fec_name(props.fec1)}")
        assert bool(valid[r]), name
        np.testing.assert_array_equal(dec[r, :PLEN], pay, err_msg=name)


def test_soft_header_decode_matches_and_beats_hard():
    """decode_header_soft: identical fields to decode_header on clean
    points, and a far higher valid rate at noise where hard Golay + CRC16
    collapses (the isolated ~2 dB header gain; end-to-end the channel
    estimator shares the blame, see docs/ber_gmsk_v27)."""
    rng = np.random.default_rng(4)
    hdr = rng.integers(0, 256, 8, dtype=np.uint8)

    class P:
        mod, fec0, fec1, check = 3, 1, 2, crc_mod.CRC_32
    henc = np.asarray(pc.encode_header(jnp.asarray(hdr), 77, P))
    bits = np.unpackbits(henc)
    pts = np.asarray(modem.modulate(
        modem.MOD_BPSK, jnp.asarray(bits.astype(np.int32))))
    # clean: every field must agree with the hard path
    llr = pc.generic_demod_soft(jnp.asarray(pts.astype(np.complex64)),
                                jnp.int32(modem.MOD_BPSK),
                                pc.HEADER_ENC_BYTES * 8)
    got = pc.decode_header_soft(llr, 100)
    hb = pc.header_bits_to_bytes(jnp.asarray(bits))
    want = pc.decode_header(hb, 100)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    assert bool(got[-1])
    assert int(got[1]) == 77 and int(got[2]) == 3

    ok_h = ok_s = 0
    for t in range(25):
        r2 = np.random.default_rng(t)
        noisy = (pts + 0.85 * (r2.standard_normal(len(pts))
                               + 1j * r2.standard_normal(len(pts)))
                 ).astype(np.complex64)
        hs = np.asarray(modem.demodulate(
            modem.MOD_BPSK, jnp.asarray(noisy))).astype(np.uint8)
        ok_h += bool(pc.decode_header(
            pc.header_bits_to_bytes(jnp.asarray(hs)), 100)[-1])
        llr = pc.generic_demod_soft(jnp.asarray(noisy),
                                    jnp.int32(modem.MOD_BPSK),
                                    pc.HEADER_ENC_BYTES * 8)
        ok_s += bool(pc.decode_header_soft(llr, 100)[-1])
    assert ok_s >= ok_h + 5, (ok_h, ok_s)


def test_matrix_fits_budget():
    """required_expansion really bounds every pair in the matrix (the
    static decode buffers above are sized from it)."""
    for props in _matrix():
        exp = pc.required_expansion(props, PLEN)
        assert exp <= EXPANSION, fec_mod.fec_name(props.fec0)
        assert pc.payload_enc_bytes(props, PLEN) <= exp * (PLEN + 4)
