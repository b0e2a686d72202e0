"""Pathological-input robustness for every synchronizer family.

The reference's samplewise state machines can simply crash or wedge on
garbage input; a batched static-shape design must instead make a promise:
ANY finite input block produces finite carried state, and the CRC/parity
gates keep `payload_valid` false when there is no real frame.  These
sweeps feed adversarial streams — DC, full-scale tones, impulse trains,
amplitude steps of 1e6, denormal-scale noise, all-zeros, and NaN/Inf
blocks followed by clean blocks — through all four single-channel sync
families (incl. 802.11a) and check those promises.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from liquid_usrp_tpu.framing import flexframe as ff
from liquid_usrp_tpu.framing import flexframe_sync as ffs
from liquid_usrp_tpu.framing import gmskframe as gf
from liquid_usrp_tpu.framing import ofdm, ofdm_sync

pytestmark = pytest.mark.slow  # heavy end-to-end lane

BS = 8192


def _families():
    params = ofdm.make_ofdm_params(M=48, cp_len=6, taper_len=4)
    osync = ofdm_sync.make_sync(params, block_size=BS, max_payload=64,
                                max_frames=4)
    fparams = ff.make_flex_params()
    fsync = ffs.make_flex_sync(fparams, block_size=BS, max_payload=64,
                               max_frames=4)
    gparams = gf.make_gmsk_params()
    gsync = gf.make_gmsk_sync(gparams, block_size=BS, max_payload=64,
                              max_frames=4)
    from liquid_usrp_tpu.framing import wlan
    wsync = wlan.make_wlan_sync(block_size=BS, max_psdu=64, max_frames=4)
    return [
        ("ofdm", osync, ofdm_sync.sync_init, ofdm_sync.sync_block),
        ("flex", fsync, ffs.flex_sync_init, ffs.flex_sync_block),
        ("gmsk", gsync, gf.gmsk_sync_init, gf.gmsk_sync_block),
        ("wlan", wsync, wlan.wlan_sync_init, wlan.wlan_sync_block),
    ]


def _adversarial_blocks(rng):
    t = np.arange(BS)
    blocks = {
        "zeros": np.zeros(BS, np.complex64),
        "dc": np.full(BS, 0.7 + 0.3j, np.complex64),
        "tone": np.exp(2j * np.pi * 0.1251 * t).astype(np.complex64),
        # a period-(M/4) tone is the S0 detector's worst structured alias
        "alias_tone": np.exp(2j * np.pi * t / 12).astype(np.complex64),
        "impulses": (np.where(t % 257 == 0, 1000.0, 0.0) + 0j
                     ).astype(np.complex64),
        "amp_step": np.where(t < BS // 2, 1e-6, 1e6).astype(
            np.complex64) * np.exp(1j * 0.3),
        "denormal": (1e-38 * (rng.normal(size=BS) +
                              1j * rng.normal(size=BS))
                     ).astype(np.complex64),
    }
    return blocks


@pytest.mark.parametrize("family", ["ofdm", "flex", "gmsk", "wlan"])
def test_no_false_frames_and_finite_state(family):
    rng = np.random.default_rng(0)
    name, sync, init, block_fn = next(
        f for f in _families() if f[0] == family)
    for tag, blk in _adversarial_blocks(rng).items():
        st = init(sync)
        for _ in range(2):
            st, res = block_fn(sync, st, jnp.asarray(blk))
        valid = getattr(res, "payload_valid", None)
        if valid is None:
            valid = res.psdu_valid
        assert not bool(np.asarray(valid).any()), (tag,)
        for leaf in jax.tree.leaves(st):
            arr = np.asarray(leaf)
            if np.issubdtype(arr.dtype, np.floating) or \
               np.issubdtype(arr.dtype, np.complexfloating):
                assert np.isfinite(arr).all(), (tag, "non-finite state")


@pytest.mark.parametrize("family", ["ofdm", "flex", "gmsk", "wlan"])
def test_recovers_after_nan_block(family):
    """A NaN/Inf block must not poison the carried state: a clean frame
    in a later block still decodes payload-exact."""
    rng = np.random.default_rng(1)
    name, sync, init, block_fn = next(
        f for f in _families() if f[0] == family)
    header = rng.integers(0, 256, 14 if family == "flex" else 8,
                          dtype=np.uint8)
    payload = rng.integers(0, 256, 48, dtype=np.uint8)
    if family == "ofdm":
        params = sync.params
        burst = np.asarray(ofdm.assemble_frame(
            params, ofdm.default_props(), jnp.asarray(header),
            jnp.asarray(payload)))
    elif family == "flex":
        burst = np.asarray(ff.flex_assemble(
            ff.make_flex_params(), ff.default_props(), jnp.asarray(header),
            jnp.asarray(payload)))
    elif family == "gmsk":
        burst = np.asarray(gf.gmsk_assemble(
            gf.make_gmsk_params(), gf.gmsk_default_props(),
            jnp.asarray(header), jnp.asarray(payload)))
    else:
        from liquid_usrp_tpu.framing import wlan
        burst = np.asarray(wlan.wlan_assemble(24, payload))
    bad = np.full(BS, np.nan + 1j * np.inf, np.complex64)
    clean = np.zeros(BS, np.complex64)
    clean[500:500 + len(burst)] = burst
    clean += (0.005 * (rng.normal(size=BS) + 1j * rng.normal(size=BS))
              ).astype(np.complex64)
    st = init(sync)
    st, _ = block_fn(sync, st, jnp.asarray(bad))
    got = 0
    # overlap carry means the NaN tail bleeds into the next window; one
    # flush block in between drains it, then the clean frame must decode
    for blk in (np.zeros(BS, np.complex64), clean,
                np.zeros(BS, np.complex64), np.zeros(BS, np.complex64)):
        st, res = block_fn(sync, st, jnp.asarray(blk))
        ok = getattr(res, "payload_valid", None)
        if ok is None:
            ok = res.psdu_valid
        pay = getattr(res, "payload", None)
        plen = getattr(res, "payload_len", None)
        if pay is None:
            pay, plen = res.psdu, res.length
        for k in range(sync.max_frames):
            if bool(np.asarray(ok[k])):
                got += 1
                np.testing.assert_array_equal(
                    np.asarray(pay[k])[: int(plen[k])], payload)
    assert got == 1


def test_cross_family_isolation():
    """A stream carrying all four families' frames: each synchronizer
    decodes exactly its own frames payload-exact and validates nothing
    from the other families (cross-family waveforms are adversarial
    structured input, not noise)."""
    from liquid_usrp_tpu.framing import wlan
    rng = np.random.default_rng(42)
    payloads = {}
    bursts = {}
    h8 = rng.integers(0, 256, 8, dtype=np.uint8)
    h14 = rng.integers(0, 256, 14, dtype=np.uint8)
    p = rng.integers(0, 256, 60, dtype=np.uint8)
    payloads["ofdm"] = p
    bursts["ofdm"] = np.asarray(ofdm.assemble_frame(
        ofdm.make_ofdm_params(M=48, cp_len=6, taper_len=4),
        ofdm.default_props(), jnp.asarray(h8), jnp.asarray(p)))
    p = rng.integers(0, 256, 60, dtype=np.uint8)
    payloads["flex"] = p
    bursts["flex"] = np.asarray(ff.flex_assemble(
        ff.make_flex_params(), ff.default_props(), jnp.asarray(h14),
        jnp.asarray(p)))
    p = rng.integers(0, 256, 60, dtype=np.uint8)
    payloads["gmsk"] = p
    bursts["gmsk"] = np.asarray(gf.gmsk_assemble(
        gf.make_gmsk_params(), gf.gmsk_default_props(), jnp.asarray(h8),
        jnp.asarray(p)))
    p = rng.integers(0, 256, 60, dtype=np.uint8)
    payloads["wlan"] = p
    bursts["wlan"] = np.asarray(wlan.wlan_assemble(12, p))

    stream = np.zeros(4 * BS, np.complex64)
    pos = 700
    for fam in ("ofdm", "flex", "gmsk", "wlan"):
        stream[pos:pos + len(bursts[fam])] = bursts[fam]
        pos += len(bursts[fam]) + 900
    stream += (0.01 * (rng.normal(size=len(stream)) +
                       1j * rng.normal(size=len(stream)))
               ).astype(np.complex64)

    for fam, sync, init, block_fn in _families():
        st = init(sync)
        n_blocks = 4 + sync.overlap // BS + 1
        padded = np.concatenate(
            [stream, np.zeros(n_blocks * BS - len(stream), np.complex64)])
        got = []
        for b in range(n_blocks):
            st, res = block_fn(sync, st,
                               jnp.asarray(padded[b * BS:(b + 1) * BS]))
            ok = getattr(res, "payload_valid", None)
            if ok is None:
                ok = res.psdu_valid
            pay = getattr(res, "payload", None)
            plen = getattr(res, "payload_len", None)
            if pay is None:
                pay, plen = res.psdu, res.length
            for k in np.nonzero(np.asarray(ok))[0]:
                got.append(np.asarray(pay[k])[: int(plen[k])])
        assert len(got) == 1, (fam, len(got))
        np.testing.assert_array_equal(got[0], payloads[fam])
