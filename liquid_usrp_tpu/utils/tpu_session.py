"""Tunnel-session health gate shared by every on-TPU measurement script.

The axon TPU tunnel backend fails nondeterministically per process session
(ROUND1_NOTES/ROUND2_NOTES).  Two observed bad-session modes: (a) any
device->host fetch fails UNIMPLEMENTED or hangs; (b) elementwise ops work
but EVERY nontrivial fresh compile (matmul/conv/fft/gather/cumsum) fails
UNIMPLEMENTED — so the gate must exercise the compile path, not just
transport.  Detecting either in seconds lets retry harnesses sample many
more sessions within their budget than burning a full per-child timeout.

Deliberately imports jax lazily and only inside the probe thread so a
hanging backend init cannot block the caller past ``timeout_s``.
"""
from __future__ import annotations

__all__ = ["session_healthy"]


def session_healthy(timeout_s: float = 150.0) -> bool:
    """True iff this process's backend session passes a tiny fetch AND a
    fresh jitted-matmul compile within ``timeout_s`` seconds."""
    import threading

    import numpy as np
    ok = []

    def probe():
        try:
            import jax
            import jax.numpy as jnp
            v = np.asarray(jnp.ones(16) * 2.0)
            m = np.asarray(jax.jit(
                lambda: jnp.ones((128, 128)) @ jnp.ones((128, 128)))())
            ok.append(bool(v.sum() == 32.0) and bool(m[0, 0] == 128.0))
        except Exception:
            ok.append(False)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok and ok[0])
