"""Fixed-size sliding sample logs (windowcf/windowf semantics).

Capability parity: ``windowcf_{create,push,write,read}`` ring logs used for
IQ/RSSI capture dumps (/root/reference/src/rssi.cc:119-120,184-190,225-226
and src/asgram_rx.cc:134,210,244).

TPU-first design: a ring buffer as a pure pytree — block ``push`` is a roll +
dynamic-update-slice; ``read`` returns the contiguous time-ordered view.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["RingLog", "ring_init", "ring_push", "ring_read"]


class RingLog(NamedTuple):
    buf: jnp.ndarray     # [capacity]
    count: jnp.ndarray   # int32: total samples ever pushed (saturates view)


def ring_init(capacity: int, dtype=jnp.complex64) -> RingLog:
    return RingLog(buf=jnp.zeros((capacity,), dtype=dtype),
                   count=jnp.int32(0))


def ring_push(ring: RingLog, x: jnp.ndarray) -> RingLog:
    """Append a block (keeps the newest ``capacity`` samples)."""
    cap = ring.buf.shape[0]
    n = x.shape[-1]
    if n >= cap:
        return RingLog(buf=x[-cap:], count=ring.count + n)
    buf = jnp.roll(ring.buf, -n)
    buf = buf.at[cap - n:].set(x)
    return RingLog(buf=buf, count=ring.count + n)


def ring_read(ring: RingLog) -> jnp.ndarray:
    """Time-ordered contents (oldest first; zeros before first wrap)."""
    return ring.buf
