"""Tunnel-session health gate shared by every on-TPU measurement script.

The axon TPU tunnel backend fails nondeterministically per process session
(ROUND1_NOTES/ROUND2_NOTES).  Three observed bad-session modes: (a) any
device->host fetch fails UNIMPLEMENTED or hangs; (b) elementwise ops work
but EVERY nontrivial fresh compile (matmul/conv/fft/gather/cumsum) fails
UNIMPLEMENTED; (c) — round-2 session 4 — matmul and elementwise compiles
PASS while everything structurally interesting (pad/gather/cumsum/fft/
scan/cond/sort/...) fails UNIMPLEMENTED, and session goodness is fixed at
init (bimodal: a session either passes all of these or only matmul).  So
the gate must probe the ops that actually discriminate, not just matmul.
Detecting a bad session in seconds lets retry harnesses sample many more
sessions within their budget than burning a full per-child timeout.

Deliberately imports jax lazily and only inside the probe thread so a
hanging backend init cannot block the caller past ``timeout_s``.
"""
from __future__ import annotations

__all__ = ["session_healthy"]


def session_healthy(timeout_s: float | None = None) -> bool:
    """True iff this process's backend session passes a tiny fetch, a
    fresh jitted-matmul compile, AND a discriminating structured-op
    compile (pad+gather+cumsum+fft — the ops bad-mode (c) rejects)
    within ``timeout_s`` seconds (default: env ``TPU_HEALTH_TIMEOUT_S``
    or 150 — deadline-constrained harnesses shrink it)."""
    import os
    import threading

    if timeout_s is None:
        timeout_s = float(os.environ.get("TPU_HEALTH_TIMEOUT_S", "150"))

    import numpy as np
    ok = []

    def probe():
        try:
            import jax
            import jax.numpy as jnp

            v = np.asarray(jnp.ones(16) * 2.0)

            # register the host-CPU backend while we are still early in
            # the session: the measurement scripts build ground-truth
            # waveforms on it, and discovery is order-sensitive here —
            # requesting "cpu" before the first tunnel compute can hang,
            # and some sessions refuse late registration entirely
            # ("Unknown backend cpu")
            try:
                jax.devices("cpu")
            except Exception:
                pass
            m = np.asarray(jax.jit(
                lambda: jnp.ones((128, 128)) @ jnp.ones((128, 128)))())

            # bad-mode (c) discriminator: matmul passes there, these fail
            # NOTE the reduction must be well-conditioned: sum of FFT
            # *real parts* is mathematically ~0 here (= N*y[0]), so a
            # healthy session's float32 residual (~76 on v5e) divided by
            # a near-zero expectation failed the gate for every healthy
            # session (round-3 live repro).  Per-bin complex comparison
            # is O(signal) per bin AND phase/order-sensitive (a session
            # with right magnitudes in wrong bins or corrupted phases
            # must fail too).
            def structured():
                x = jnp.pad(jnp.arange(1024, dtype=jnp.float32), (3, 5))
                y = jnp.cumsum(x)[jnp.arange(0, 1024, 8)]
                return jnp.fft.fft(y.astype(jnp.complex64))

            s_bins = np.asarray(jax.jit(structured)())
            # deterministic input -> assert the exact expected spectrum
            # (a wrong-but-finite session result must fail the gate too)
            xe = np.pad(np.arange(1024, dtype=np.float32), (3, 5))
            ye = np.cumsum(xe)[np.arange(0, 1024, 8)]
            se_bins = np.fft.fft(ye.astype(np.complex128))
            rel = float(np.abs(s_bins - se_bins).max()
                        / max(np.abs(se_bins).max(), 1.0))
            ok.append(bool(v.sum() == 32.0) and bool(m[0, 0] == 128.0)
                      and bool(np.all(np.isfinite(s_bins))) and rel < 1e-4)
        except Exception:
            ok.append(False)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok and ok[0])
