"""Blockwise carrier-phase tracking for pseudo-BPSK symbol streams.

Shared by the GMSK and single-carrier flexframe receivers (capability
parity with the carrier-tracking loops inside liquid-dsp's
``gmskframesync``/``flexframesync``, re-expressed as a batched two-stage
estimator instead of a sample-serial PLL).

Stage 1 (Viterbi&Viterbi): squaring ``y`` removes the +-1 data signs, so
each ``seg``-symbol segment yields a phase estimate mod pi, unwrapped
across segments.  Stage 2+ (data-aided / decision-directed): decisions
from the previous trajectory — with caller-supplied *known* signs over
pilot/template spans — re-estimate each segment's phase coherently: no
squaring loss, unambiguous mod 2pi, anchored to the true carrier by the
known spans.  Genuine carrier drift is smooth across a segment, so a ~pi
jump between consecutive estimates IS a V&V slip and the mod-pi unwrap
removes it.  The returned trajectory is linearly interpolated between
segment centers (a piecewise-constant correction leaves a residual-CFO
sawtooth).

All shapes static; safe under ``jit``/``vmap``.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["track_phase_bpsk"]


def track_phase_bpsk(y: jnp.ndarray, sgn_known: jnp.ndarray,
                     seg: int = 32, n_iter: int = 2) -> jnp.ndarray:
    """Phase trajectory ``phi [n]`` for a pseudo-BPSK stream.

    ``y [n]`` complex symbols (+-1 signs times a slowly-drifting carrier);
    ``sgn_known [n]`` float: the known sign (+-1) over template/pilot
    spans, 0 where the data is unknown.  The first segment must contain
    known signs to anchor the absolute phase.  Callers apply
    ``y * exp(-1j * phi)``.
    """
    n = y.shape[0]
    n_seg = -(-n // seg)
    npad = n_seg * seg
    ypad = jnp.concatenate([y, jnp.zeros((npad - n,), y.dtype)])
    spad = jnp.concatenate(
        [sgn_known.astype(jnp.float32), jnp.zeros((npad - n,), jnp.float32)])
    valid = jnp.arange(npad) < n
    known = spad != 0.0

    # pass 1: V&V seed
    y2 = jnp.sum((ypad * ypad).reshape(n_seg, seg), axis=-1)
    ph = 0.5 * jnp.angle(y2)
    dph = ph[1:] - ph[:-1]
    dph = jnp.mod(dph + np.pi / 2, np.pi) - np.pi / 2
    phu = jnp.concatenate([ph[:1], ph[0] + jnp.cumsum(dph)])

    # passes 2..: data-aided refinement
    for _ in range(n_iter):
        yc = ypad * jnp.exp(-1j * jnp.repeat(phu, seg))
        r = jnp.real(yc)
        s_hat = jnp.where(known, spad, jnp.where(r >= 0, 1.0, -1.0))
        s_hat = jnp.where(valid, s_hat, 0.0)
        u2 = jnp.sum((ypad * s_hat).reshape(n_seg, seg), axis=-1)
        ph2 = jnp.angle(u2)
        dph2 = ph2[1:] - ph2[:-1]
        dph2 = jnp.mod(dph2 + np.pi / 2, np.pi) - np.pi / 2
        phu = jnp.concatenate([ph2[:1], ph2[0] + jnp.cumsum(dph2)])

    # linear interpolation between segment centers
    ctr = (seg - 1) / 2.0
    fi = (jnp.arange(n, dtype=jnp.float32) - ctr) / seg
    i0 = jnp.clip(jnp.floor(fi).astype(jnp.int32), 0, max(n_seg - 2, 0))
    fr = jnp.clip(fi - i0.astype(jnp.float32), 0.0, 1.0)
    if n_seg == 1:
        return jnp.full((n,), phu[0])
    return phu[i0] * (1 - fr) + phu[i0 + 1] * fr
