"""Unit tests for the shared blockwise carrier-phase tracker
(framing/phase_track.py) — the component behind the GMSK full-frame and
flexframe header-span carrier recovery."""
import numpy as np

import jax.numpy as jnp

from liquid_usrp_tpu.framing.phase_track import track_phase_bpsk


def _mk_stream(n, n_known, drift, noise, seed, slip_at=None):
    rng = np.random.default_rng(seed)
    s = rng.choice([-1.0, 1.0], n)
    s[:n_known] = 1.0
    phi = drift * np.arange(n)
    if slip_at is not None:
        phi = phi + np.pi * (np.arange(n) >= slip_at)
    y = s * np.exp(1j * phi)
    y = y + noise * (rng.normal(size=n) + 1j * rng.normal(size=n))
    sgn_known = np.zeros(n, np.float32)
    sgn_known[:n_known] = 1.0
    return s, phi, y.astype(np.complex64), sgn_known


def test_tracks_linear_drift():
    """Residual-CFO drift (0.003 rad/sym over 512 syms = 1.5 rad end to
    end) must be tracked to well under a decision error."""
    s, phi, y, known = _mk_stream(512, 64, 0.003, 0.15, seed=0)
    est = np.asarray(track_phase_bpsk(jnp.asarray(y), jnp.asarray(known)))
    dec = np.sign(np.real(y * np.exp(-1j * est)))
    assert np.array_equal(dec, s)
    # trajectory error small and unwrapped (no pi offsets anywhere)
    err = np.angle(np.exp(1j * (est - phi)))
    assert np.max(np.abs(err)) < 0.4, np.max(np.abs(err))


def test_dd_refinement_not_worse_than_vv_seed():
    """The data-aided passes (no squaring loss) must track at least as
    accurately as the bare V&V seed.  (A genuine pi step on unknown
    data is deliberately NOT followed — (s, phi) == (-s, phi+pi) for
    unknown signs, so removing ~pi jumps is the correct smoothness
    prior; the V&V seed's spurious slips were the real-world failure.)
    """
    for seed in range(3):
        s, phi, y, known = _mk_stream(2048, 64, 0.003, 0.5, seed=seed)
        rms = []
        for it in (0, 2):
            est = np.asarray(track_phase_bpsk(
                jnp.asarray(y), jnp.asarray(known), n_iter=it))
            err = np.angle(np.exp(1j * (est - phi)))
            rms.append(float(np.sqrt(np.mean(err ** 2))))
        assert rms[1] <= rms[0] * 1.02, rms


def test_anchored_absolute_phase():
    """The known-sign span anchors the absolute phase: a constant pi
    offset (which bare V&V cannot see) must not survive."""
    s, phi, y, known = _mk_stream(256, 64, 0.0, 0.1, seed=2)
    y = (y * np.exp(1j * np.pi)).astype(np.complex64)  # global flip
    est = np.asarray(track_phase_bpsk(jnp.asarray(y), jnp.asarray(known)))
    dec = np.sign(np.real(y * np.exp(-1j * est)))
    assert np.array_equal(dec, s)


def test_short_single_segment_stream():
    """n < seg exercises the n_seg == 1 constant-phase path."""
    s, phi, y, known = _mk_stream(24, 12, 0.0, 0.05, seed=3)
    est = np.asarray(track_phase_bpsk(jnp.asarray(y), jnp.asarray(known),
                                      seg=32))
    dec = np.sign(np.real(y * np.exp(-1j * est)))
    assert np.array_equal(dec, s)
