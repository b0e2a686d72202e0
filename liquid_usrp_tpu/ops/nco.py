"""Numerically-controlled oscillator: block-vectorized complex mixing.

Capability parity: ``nco_crcf_{set_frequency, mix_up, mix_down, step}``
(/root/reference/lib/multichanneltx.cc:94-96,217-222 and lib/
multichannelrx.cc:98-100,163-164) — the reference rotates one sample per call;
here a whole block is mixed with one phase-ramp multiply, and the carried
phase is wrapped each block so float32 never accumulates error.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["NcoState", "nco_init", "nco_mix_block", "nco_phase_ramp"]

_TWO_PI = 2.0 * 3.14159265358979323846


class NcoState(NamedTuple):
    phase: jnp.ndarray  # scalar float32, radians in [0, 2pi)
    freq: jnp.ndarray   # scalar float32, radians/sample


def nco_init(freq_rad: float, phase: float = 0.0) -> NcoState:
    return NcoState(phase=jnp.float32(phase), freq=jnp.float32(freq_rad))


def nco_phase_ramp(state: NcoState, n: int):
    """Phases for the next ``n`` samples and the advanced state."""
    ph = state.phase + state.freq * jnp.arange(n, dtype=jnp.float32)
    new_phase = jnp.mod(state.phase + state.freq * n, _TWO_PI)
    return ph, state._replace(phase=new_phase.astype(jnp.float32))


def nco_mix_block(state: NcoState, x: jnp.ndarray, up: bool = True):
    """Mix a complex block up (+f) or down (-f): ``(state, x) -> (state', y)``."""
    ph, new_state = nco_phase_ramp(state, x.shape[-1])
    rot = jnp.exp(1j * (ph if up else -ph)).astype(jnp.complex64)
    return new_state, x * rot
