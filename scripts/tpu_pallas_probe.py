"""On-TPU validation + timing for the Mosaic detect front-end.

Runs in fresh child processes (the tunnel backend is per-session flaky,
ROUND2_NOTES.md): gates each session on a compile-path health probe,
compiles ``detect_metric_fused_2d`` on the real chip, checks numerics
against the XLA formulation on the same device, and times both over a
bench-sized block.  Prints one JSON line; exit 0 only if the kernel
compiled AND matched.  Child exit codes: 0 ok, 1 compile fail, 2 numeric
mismatch, 3 unhealthy session (parent retries).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))


def _healthy(timeout_s: float = 150.0) -> bool:
    """Shared tunnel-session gate (liquid_usrp_tpu/utils/tpu_session.py)."""
    from liquid_usrp_tpu.utils.tpu_session import session_healthy
    return session_healthy(timeout_s)


def main():
    if not _healthy():
        print(json.dumps({"error": "session unhealthy"}))
        os._exit(3)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    from liquid_usrp_tpu.ops import iqfmt
    from liquid_usrp_tpu.ops.pallas_kernels import (
        detect_candidates_onepass, detect_metric_fused_2d,
        detect_metric_onepass)

    dev = jax.devices()[0]
    out = {"device": str(dev), "platform": jax.default_backend()}
    any_fail = False
    all_match = True

    # M=64: both kernels (fused_2d requires span+lag <= 128); M=128:
    # one-pass only — the row-roll generalization past one lane register
    configs = [
        (64, 8, [("fused2d", detect_metric_fused_2d),
                 ("onepass", detect_metric_onepass)]),
        (128, 16, [("onepass", detect_metric_onepass)]),
    ]
    rng = np.random.default_rng(0)
    for M, cp, kernels in configs:
        # oracle = the production XLA metric itself, so the probe cannot
        # drift from what the pipeline actually computes
        params = ofdm.make_ofdm_params(M, cp, 4)
        sync = ofdm_sync.make_sync(params, block_size=131072,
                                   max_payload=64, max_frames=4
                                   )._replace(use_pallas=False)
        d = M // 4
        L = ofdm_sync.NUM_S0 * M - d
        n = 131072 + L + d - 1
        ext = iqfmt.device_put_c64(
            (rng.standard_normal(n) +
             1j * rng.standard_normal(n)).astype(np.complex64))

        f_xla = jax.jit(lambda e, sync=sync: ofdm_sync._detect_metric(
            sync, e))
        try:
            m_x, c_x = jax.block_until_ready(f_xla(ext))
        except Exception as e:  # noqa: BLE001
            out["error"] = "xla baseline: " + repr(e)[:300]
            print(json.dumps(out))
            sys.exit(3)   # even XLA will not compile: bad session, retry

        def t(f, ext=ext):
            f(ext)[0].block_until_ready()
            n_it = 50
            t0 = time.perf_counter()
            for _ in range(n_it):
                r = f(ext)
            jax.block_until_ready(r)
            return (time.perf_counter() - t0) / n_it * 1e6

        out[f"xla_us_m{M}"] = round(t(f_xla), 1)

        for name, fn in kernels:
            key = f"{name}_m{M}"
            f_pal = jax.jit(lambda e, fn=fn, d=d, L=L: fn(e, d, L))
            try:
                m_p, c_p = jax.block_until_ready(f_pal(ext))
            except Exception as e:  # noqa: BLE001
                msg = repr(e)
                out[key] = {"compile": "fail", "error": msg[:400]}
                if "UNIMPLEMENTED" in msg or "Unimplemented" in msg:
                    # session-wide outage mode (ROUND2_NOTES): every fresh
                    # nontrivial compile fails, Mosaic or not -- retry
                    print(json.dumps(out))
                    sys.exit(3)
                any_fail = True
                continue
            # device-side reductions only (tunnel-safe): scalar fetches
            scale = float(jnp.max(jnp.abs(m_x)))
            merr = float(jnp.max(jnp.abs(m_p - m_x))) / max(scale, 1e-12)
            cerr = float(jnp.max(jnp.abs(c_p - c_x))) / float(
                jnp.max(jnp.abs(c_x)))
            match = bool(merr < 2e-3 and cerr < 2e-3)
            all_match = all_match and match
            out[key] = {"compile": "ok", "metric_rel_err": merr,
                        "corr_rel_err": cerr, "match": match,
                        "us": round(t(f_pal), 1)}

    # fused candidate kernel (metric+NMS+top-k in VMEM) at the flagship
    # M=48 config vs the composed XLA path, loaded with a real frame
    params = ofdm.make_ofdm_params(48, 6, 4)
    sync = ofdm_sync.make_sync(params, block_size=131072, max_payload=64,
                               max_frames=8)._replace(use_pallas=0)
    frame = iqfmt.device_get_c64(ofdm.assemble_frame(
        params, ofdm.default_props(),
        jnp.asarray(np.arange(8, dtype=np.uint8)),
        jnp.asarray(np.arange(48, dtype=np.uint8))))
    buf = np.zeros(131072 + sync.overlap, np.complex64)
    buf[5000:5000 + len(frame)] = frame
    buf[70000:70000 + len(frame)] = frame
    buf += 0.02 * (rng.standard_normal(len(buf)) +
                   1j * rng.standard_normal(len(buf))).astype(np.complex64)
    ext = iqfmt.device_put_c64(buf)
    d, L = 12, ofdm_sync.NUM_S0 * 48 - 12

    def xla_cand(e):
        m, c = ofdm_sync._detect_metric(sync, e)
        det, locs = ofdm_sync._find_candidates(sync, m)
        return det, locs, c[jnp.clip(locs, 0, c.shape[0] - 1)]

    f_xla2 = jax.jit(xla_cand)
    f_cand = jax.jit(lambda e: detect_candidates_onepass(
        e, d, L, 48, sync.block_size, sync.threshold, sync.max_frames,
        interpret=False))
    det_x, locs_x, _ = jax.block_until_ready(f_xla2(ext))
    try:
        vals_p, locs_p, _ = jax.block_until_ready(f_cand(ext))
    except Exception as e:  # noqa: BLE001
        msg = repr(e)
        out["cand_m48"] = {"compile": "fail", "error": msg[:400]}
        if "UNIMPLEMENTED" in msg or "Unimplemented" in msg:
            print(json.dumps(out))
            sys.exit(3)
        any_fail = True
    else:
        det_p = vals_p > 0
        det_eq = bool(jnp.all(det_p == det_x))
        # plateau argmax may differ by a few samples (documented)
        loc_ok = bool(jnp.all(jnp.where(
            det_x, jnp.abs(locs_p - locs_x) <= 3, True)))
        n_det = int(jnp.sum(det_x))
        match = det_eq and loc_ok and n_det == 2

        def t2(f):
            jax.block_until_ready(f(ext))
            t0 = time.perf_counter()
            for _ in range(50):
                r = f(ext)
            jax.block_until_ready(r)
            return (time.perf_counter() - t0) / 50 * 1e6

        all_match = all_match and match
        out["cand_m48"] = {"compile": "ok", "det_equal": det_eq,
                           "loc_ok": loc_ok, "n_detected": n_det,
                           "match": match, "us": round(t2(f_cand), 1),
                           "xla_us": round(t2(f_xla2), 1)}

    # PRODUCTION metric kernel: segmented-xcorr one-pass vs the XLA
    # FFT-domain path (the use_pallas=1 + xcorr_detect route) on the
    # same frame-loaded M=48 buffer
    from liquid_usrp_tpu.framing.ofdm_sync import _xc_span
    from liquid_usrp_tpu.ops.pallas_kernels import \
        detect_metric_xcorr_onepass
    tmpl = np.tile(np.asarray(params.s0_time), ofdm_sync.NUM_S0)
    span = _xc_span(len(tmpl))
    n_metric = sync.block_size + 2 * 48 + 1
    f_xcx = jax.jit(
        lambda e: ofdm_sync._detect_metric_xcorr(sync, e))
    f_xck = jax.jit(lambda e: detect_metric_xcorr_onepass(
        e, tmpl, span, n_metric, interpret=False))
    m_ref = jax.block_until_ready(f_xcx(ext))
    try:
        m_k = jax.block_until_ready(f_xck(ext))
    except Exception as e:  # noqa: BLE001
        msg = repr(e)
        out["xcorr_m48"] = {"compile": "fail", "error": msg[:400]}
        if "UNIMPLEMENTED" in msg or "Unimplemented" in msg:
            print(json.dumps(out))
            sys.exit(3)
        any_fail = True
    else:
        rel = float(jnp.max(jnp.abs(m_k - m_ref))) / max(
            float(jnp.max(jnp.abs(m_ref))), 1e-12)
        pk_ok = bool(jnp.argmax(m_k) == jnp.argmax(m_ref))
        match = rel < 5e-3 and pk_ok

        def t3(f):
            jax.block_until_ready(f(ext))
            t0 = time.perf_counter()
            for _ in range(50):
                r = f(ext)
            jax.block_until_ready(r)
            return (time.perf_counter() - t0) / 50 * 1e6

        all_match = all_match and match
        out["xcorr_m48"] = {"compile": "ok", "rel_err": rel,
                            "peak_match": pk_ok, "match": match,
                            "us": round(t3(f_xck), 1),
                            "xla_us": round(t3(f_xcx), 1)}
    print(json.dumps(out))
    sys.exit(1 if any_fail else (0 if all_match else 2))


def parent() -> int:
    for i in range(8):
        env = dict(os.environ, _PALLAS_PROBE_CHILD="1")
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=600)
        except subprocess.TimeoutExpired:
            print(f"attempt {i}: timeout", flush=True)
            continue
        line = next((ln for ln in out.stdout.splitlines()
                     if ln.startswith("{")), "")
        if out.returncode in (0, 1, 2):     # definitive kernel verdict
            print(line)
            return out.returncode
        print(f"attempt {i}: rc={out.returncode} {line[:200]} "
              f"err={out.stderr[-200:]}", flush=True)
        time.sleep(10 if out.returncode == 3 else 20)
    return 3


if __name__ == "__main__":
    if os.environ.get("_PALLAS_PROBE_CHILD"):
        main()
    else:
        sys.exit(parent())
