"""Numerically-controlled oscillator: block-vectorized complex mixing.

Capability parity: ``nco_crcf_{set_frequency, mix_up, mix_down, step}``
(/root/reference/lib/multichanneltx.cc:94-96,217-222 and lib/
multichannelrx.cc:98-100,163-164) — the reference rotates one sample per call;
here a whole block is mixed with one phase-ramp multiply.

Phase is carried as a **uint32 fixed-point turn accumulator** (1 turn =
2^32), the classic DDS design: ``phase[i] = phase0 + freq_u32 * i`` in
wrapping uint32 arithmetic is *exact* modular math, so there is zero phase
accumulation error at any stream length (a float32 ramp loses ~0.06 rad per
sample near 1e6-sample blocks).  The only approximation is the one-time
frequency quantization to the 2^-32-turn grid (<= 7.3e-10 rad/sample), which
is identical on every path — sequential, block-split, and sharded runners
therefore mix with bit-identical phases.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = ["NcoState", "nco_init", "nco_init_at", "nco_phase_ramp",
           "nco_mix_block", "freq_to_u32"]

_TWO_PI = 2.0 * np.pi
_TURN = float(2.0 ** 32)          # uint32 units per turn
_TO_RAD = np.float32(_TWO_PI / _TURN)


def freq_to_u32(freq_rad: float) -> np.uint32:
    """Quantize radians/sample to the uint32 turn grid (host-side)."""
    turns = float(freq_rad) / _TWO_PI
    return np.uint32(int(round(turns * _TURN)) % (1 << 32))


class NcoState(NamedTuple):
    phase: jnp.ndarray  # scalar uint32, phase in 2^-32 turns
    freq: jnp.ndarray   # scalar uint32, frequency in 2^-32 turns/sample


def nco_init(freq_rad: float, phase: float = 0.0) -> NcoState:
    ph = np.uint32(int(round(phase / _TWO_PI * _TURN)) % (1 << 32))
    return NcoState(phase=jnp.uint32(ph), freq=jnp.uint32(freq_to_u32(freq_rad)))


def nco_init_at(freq_rad: float, index) -> NcoState:
    """NCO state positioned at absolute sample ``index`` (traced uint32 ok).

    ``phase = freq * index mod 2pi`` computed exactly in wrapping uint32
    arithmetic — safe for any stream offset (the float32 formulation loses
    integer precision past 2^24 samples).
    """
    f = jnp.uint32(freq_to_u32(freq_rad))
    if isinstance(index, (int, np.integer)):
        # host ints >= 2^31 would overflow the default int32 conversion
        # inside jnp.asarray; reduce mod 2^32 first (exact: the DDS is
        # modular anyway)
        index = np.uint32(int(index) % (1 << 32))
    idx = jnp.asarray(index).astype(jnp.uint32)
    return NcoState(phase=f * idx, freq=f)


def nco_phase_ramp(state: NcoState, n: int):
    """Radian phases for the next ``n`` samples and the advanced state."""
    ph_u32 = state.phase + state.freq * jnp.arange(n, dtype=jnp.uint32)
    new_phase = state.phase + state.freq * jnp.uint32(n % (1 << 32))
    return ph_u32.astype(jnp.float32) * _TO_RAD, state._replace(phase=new_phase)


def nco_mix_block(state: NcoState, x: jnp.ndarray, up: bool = True):
    """Mix a complex block up (+f) or down (-f): ``(state, x) -> (state', y)``."""
    ph, new_state = nco_phase_ramp(state, x.shape[-1])
    rot = jnp.exp(1j * (ph if up else -ph)).astype(jnp.complex64)
    return new_state, x * rot
