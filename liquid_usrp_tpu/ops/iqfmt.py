"""Reduced-precision IQ ingest formats.

The RX pipelines are HBM-bandwidth-bound (docs/roofline.md): arithmetic
intensity is a few FLOPs/byte, so the device-memory format of the mixture
stream is a first-order throughput lever.  bfloat16 I/Q planes halve the
dominant input read vs complex64 at a ~45 dB quantization-SNR floor —
far below the channel noise the decode chain already operates against,
and comparable to the effective resolution of the SC16 wire format the
reference's USRP front end delivers (UHD converts to COMPLEX_FLOAT32
host-side; /root/reference/lib/ofdmtxrx.cc:96-97 io_type usage).

Convention: a "planes" array is real-valued ``[2, L]`` (row 0 = I,
row 1 = Q) in bfloat16/float16/float32.  Pipeline steps accept either a
complex64 stream or a planes array; planes are combined to complex64 at
trace time so every downstream kernel is unchanged — only the HBM-side
representation (and hence the input bandwidth) differs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["iq_to_planes", "iq_from_any"]


def iq_to_planes(x: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Complex stream ``[...]`` -> real planes ``[2, ...]`` (rounded)."""
    return jnp.stack([x.real, x.imag]).astype(dtype)


def iq_from_any(x: jnp.ndarray) -> jnp.ndarray:
    """Accept a complex stream or ``[2, ...]`` real planes; return
    complex64.  Trace-time dispatch on dtype: jit retraces per input
    signature, so both forms share one step function."""
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return x.astype(jnp.complex64)
    if x.ndim < 2 or x.shape[0] != 2:
        raise ValueError(
            f"planes input must be [2, ...] real (got {x.shape} {x.dtype})")
    if not jnp.issubdtype(x.dtype, jnp.floating):
        # raw integer planes (e.g. SC16 wire format) would cast to
        # +-32767-scale floats and silently break every downstream
        # threshold; integer ingest must be scaled by the caller
        raise ValueError(
            f"planes must be float (bf16/f16/f32), got {x.dtype}; "
            f"scale integer wire formats first (io.native converters)")
    xf = x.astype(jnp.float32)
    return jax.lax.complex(xf[0], xf[1])
