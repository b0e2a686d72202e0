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

Round-4 refinements (docs/tpu_runs/r04_capability.json):

* a fourth bad mode (d): the deployed backend rejects every compile
  that touches a COMPLEX dtype while running all real ops at speed.
  The planar pipeline (ops/planar.py) runs fine there, so the gate has
  a ``mode="real"`` variant that never compiles a complex op;
* **one failed compile poisons the session**: after any UNIMPLEMENTED
  every later compile in the process fails too.  Probe real before
  complex, and never measure in a session that probed a failing op.

Deliberately imports jax lazily and only inside the probe thread so a
hanging backend init cannot block the caller past ``timeout_s``.
"""
from __future__ import annotations

__all__ = ["session_healthy", "session_capabilities"]


def _probe_real() -> bool:
    """Real-ops structured probe with exact expected values (no complex
    dtype anywhere — safe to run before a planar measurement)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    v = np.asarray(jnp.ones(16) * 2.0)
    try:
        jax.devices("cpu")      # register host backend early (see below)
    except Exception:
        pass
    m = np.asarray(jax.jit(
        lambda: jnp.ones((128, 128)) @ jnp.ones((128, 128)))())

    def structured():
        # the ops the planar pipeline leans on: pad, cumsum, gather,
        # scan, cond, reduce_window, top_k, dynamic_slice, sort
        x = jnp.pad(jnp.arange(1024, dtype=jnp.float32), (3, 5))
        y = jnp.cumsum(x)[jnp.arange(0, 1024, 8)]
        s, _ = lax.scan(lambda c, e: (c + e, c), 0.0, y)
        w = lax.reduce_window(y, -jnp.inf, lax.max, (8,), (8,), "VALID")
        tv, ti = lax.top_k(y, 4)
        d = lax.dynamic_slice(y, (jnp.int32(7),), (8,))
        z = lax.cond(s > 0, lambda: jnp.sort(d), lambda: d)
        return y, s, w, tv, ti.astype(jnp.float32), z

    outs = [np.asarray(o) for o in jax.jit(structured)()]
    xe = np.pad(np.arange(1024, dtype=np.float32), (3, 5))
    ye = np.cumsum(xe)[np.arange(0, 1024, 8)]
    se = ye.astype(np.float64).cumsum()[-1]
    we = ye.reshape(-1, 8).max(-1)
    tie = np.argsort(ye)[::-1][:4].astype(np.float32)
    tve = np.sort(ye)[::-1][:4]
    de = np.sort(ye[7:15])
    rel = max(
        float(np.abs(outs[0] - ye).max() / np.abs(ye).max()),
        float(abs(outs[1] - se) / abs(se)),
        float(np.abs(outs[2] - we).max() / np.abs(we).max()),
        float(np.abs(outs[3] - tve).max() / np.abs(tve).max()),
        float(np.abs(outs[4] - tie).max() / max(tie.max(), 1.0)),
        float(np.abs(outs[5] - de).max() / np.abs(de).max()),
    )
    return bool(v.sum() == 32.0) and bool(m[0, 0] == 128.0) and rel < 1e-4


def _probe_complex() -> bool:
    """Complex structured probe (the original bad-mode (c) gate).

    WARNING: a failure poisons the session for every later compile —
    only call after :func:`_probe_real`, and never measure afterwards
    in the same process if this returned False.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    def structured():
        x = jnp.pad(jnp.arange(1024, dtype=jnp.float32), (3, 5))
        y = jnp.cumsum(x)[jnp.arange(0, 1024, 8)]
        return jnp.fft.fft(y.astype(jnp.complex64))

    s_bins = np.asarray(jax.jit(structured)())
    # deterministic input -> assert the exact expected spectrum
    # (a wrong-but-finite session result must fail the gate too).
    # Per-bin complex comparison is O(signal) per bin AND phase/order-
    # sensitive (round-3 live repro: a sum-of-real-parts expectation is
    # ~0 and rejected every healthy session).
    xe = np.pad(np.arange(1024, dtype=np.float32), (3, 5))
    ye = np.cumsum(xe)[np.arange(0, 1024, 8)]
    se_bins = np.fft.fft(ye.astype(np.complex128))
    rel = float(np.abs(s_bins - se_bins).max()
                / max(np.abs(se_bins).max(), 1.0))
    return bool(np.all(np.isfinite(s_bins))) and rel < 1e-4


def _run_with_timeout(fn, timeout_s: float):
    ok, _finished = _run_with_timeout2(fn, timeout_s)
    return ok


def _run_with_timeout2(fn, timeout_s: float):
    """Returns ``(ok, finished)`` — ``finished=False`` means the probe
    thread was still running at the deadline (verdict unknown), which is
    a different fact from a definitive in-time failure."""
    import threading
    box = []

    def runner():
        try:
            box.append(fn())
        except Exception:
            box.append(False)

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(box and box[0]), bool(box)


def session_healthy(timeout_s: float | None = None,
                    mode: str = "complex") -> bool:
    """True iff this process's backend session passes a tiny fetch, a
    fresh jitted-matmul compile, AND a discriminating structured-op
    compile within ``timeout_s`` seconds (default: env
    ``TPU_HEALTH_TIMEOUT_S`` or 150 — deadline-constrained harnesses
    shrink it).

    ``mode="complex"`` (default) additionally requires the complex
    structured probe (full complex pipelines runnable);
    ``mode="real"`` checks real ops only — the planar pipeline's gate.
    """
    import os

    if timeout_s is None:
        timeout_s = float(os.environ.get("TPU_HEALTH_TIMEOUT_S", "150"))

    def probe():
        r = _probe_real()
        if not r:
            return False
        if mode == "real":
            return True
        return _probe_complex()

    return _run_with_timeout(probe, timeout_s)


def session_capabilities(timeout_s: float | None = None) -> dict:
    """Probe this session's capability tiers: ``{"real": bool,
    "complex": bool | None}``.

    ``complex`` is three-valued: ``True``/``False`` are definitive probe
    verdicts; ``None`` means the probe TIMED OUT (verdict unknown) — do
    not collapse it with a truthiness check when "definitively
    incapable" matters (the bench ladder keeps complex attempts alive on
    ``None``).  Real is probed FIRST (a complex failure poisons the
    session — the report stays valid but no measurement should run in
    this process afterwards)."""
    import os

    import time

    if timeout_s is None:
        timeout_s = float(os.environ.get("TPU_HEALTH_TIMEOUT_S", "150"))
    t0 = time.monotonic()
    caps = {"real": False, "complex": False}
    caps["real"] = _run_with_timeout(_probe_real, 0.75 * timeout_s)
    if caps["real"]:
        # the real probe already paid backend init, so the complex probe
        # is one compile: give it ALL remaining wall-clock (a fixed 25%
        # slice misreported a complex-capable session as real-only when
        # init ate the real probe's share — observed live in round 4)
        left = max(30.0, timeout_s - (time.monotonic() - t0))
        ok, finished = _run_with_timeout2(_probe_complex, left)
        # a timed-out probe is an UNKNOWN verdict, not a definitive
        # incapacity: report None so callers can still attempt the
        # complex tier (its own health gate fails fast if truly absent)
        caps["complex"] = ok if finished else None
    return caps
