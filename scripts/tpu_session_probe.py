"""One-session TPU probe: Pallas 2-D kernel compile check + granular
fixed-cost attribution + batched-vs-scan dispatch comparison.

Bundled into one process because healthy tunnel sessions are a scarce
resource (see ROUND2_NOTES.md) — run everything while we have one.
Invoked without args it acts as its own retry harness: fresh child
subprocesses with a fast session health gate (the bench.py pattern),
because roughly half of tunnel sessions hang or fail UNIMPLEMENTED.
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def _healthy(timeout_s: float = 150.0) -> bool:
    """Shared tunnel-session gate (liquid_usrp_tpu/utils/tpu_session.py)."""
    from liquid_usrp_tpu.utils.tpu_session import session_healthy
    return session_healthy(timeout_s)


def pallas_check():
    import jax
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    from liquid_usrp_tpu.ops import pallas_kernels as pk

    params = ofdm.make_ofdm_params(48, 6, 4)
    bs = 131072
    sync = ofdm_sync.make_sync(params, block_size=bs, max_payload=512,
                               max_frames=48)
    rng = np.random.default_rng(0)
    from liquid_usrp_tpu.ops.iqfmt import device_put_c64
    ext = device_put_c64((rng.normal(size=bs + sync.overlap) +
                          1j * rng.normal(size=bs + sync.overlap))
                         .astype(np.complex64))
    M = params.M
    d = M // 4
    L = 2 * M - d

    @jax.jit
    def xla_ref(ext):
        return ofdm_sync._detect_metric(sync, ext)

    @jax.jit
    def pallas_ver(ext):
        return pk.detect_metric_fused_2d(ext, d, L)

    m0, c0 = xla_ref(ext)
    jax.block_until_ready(m0)
    try:
        m1, c1 = pallas_ver(ext)
        jax.block_until_ready(m1)
    except Exception as e:
        print("PALLAS COMPILE FAILED:", type(e).__name__, str(e)[:300])
        return False
    err_m = float(jnp.max(jnp.abs(m0 - m1[: m0.shape[0]])))
    err_c = float(jnp.max(jnp.abs(c0 - c1[: c0.shape[0]])))
    print(f"pallas on-TPU validate: metric err {err_m:.2e}  c err {err_c:.2e}")

    def timeit(fn, n=20):
        r = fn(ext)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                r = fn(ext)
            jax.block_until_ready(r)
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    t_x = timeit(xla_ref)
    t_p = timeit(pallas_ver)
    print(f"  XLA detect-metric   : {t_x*1e6:8.1f} us")
    print(f"  Pallas detect-metric: {t_p*1e6:8.1f} us   "
          f"({t_x/t_p:.2f}x)")
    return err_m < 1e-3 and err_c < 1e-2


def resamp_rational_check():
    """On-chip: the gather-free rational fast path vs the general
    windows-gather form — numerical match + timing (decides whether the
    TPU backend gate in ops/resamp.py points the right way)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from liquid_usrp_tpu.ops import resamp as rs_mod

    rng = np.random.default_rng(0)
    from liquid_usrp_tpu.ops.iqfmt import device_put_c64
    x = device_put_c64((rng.normal(size=1 << 17) +
                        1j * rng.normal(size=1 << 17)).astype(np.complex64))
    results = {}
    for rate in (1.5, 4.0 / 3.0):
        rs = rs_mod.resamp_create(rate)
        outs = {}
        for name, on in (("rational", True), ("general", False)):
            rs_mod._RATIONAL_ON_CPU = on      # forces the path on TPU too
            if not on:
                rs_mod._RATIONAL_Q_MAX = -1
            f = jax.jit(lambda s, v: rs_mod.resamp_block(rs, s, v))
            st = rs_mod.resamp_state(rs)
            r = f(st, x)
            jax.block_until_ready(r)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(10):
                    r = f(st, x)
                jax.block_until_ready(r)
                best = min(best, (time.perf_counter() - t0) / 10)
            outs[name] = (r[1], best)    # device array: complex
            # fetches are transport-unsafe; compare on device below
            rs_mod._RATIONAL_Q_MAX = 64
        rs_mod._RATIONAL_ON_CPU = False
        err = float(jnp.max(jnp.abs(outs["rational"][0] -
                                    outs["general"][0])))
        tr, tg = outs["rational"][1], outs["general"][1]
        print(f"  resamp rate {rate:.3f}: err {err:.2e}  rational "
              f"{x.shape[0]/tr/1e6:7.0f} MS/s  general "
              f"{x.shape[0]/tg/1e6:7.0f} MS/s  ({tg/tr:.2f}x)")
        results[rate] = err < 2e-5
    return all(results.values())


def _child() -> int:
    if not _healthy():
        print("session unhealthy", flush=True)
        os._exit(3)
    import jax
    print("devices:", jax.devices(), flush=True)
    ok = pallas_check()
    print("pallas ok:", ok, flush=True)
    ok_r = resamp_rational_check()
    print("resamp rational ok:", ok_r, flush=True)
    import stage_probe
    print("--- granular ---", flush=True)
    stage_probe.granular()
    print("--- batched vs scan ---", flush=True)
    stage_probe.batched_vs_scan()
    return 0


def main() -> int:
    if os.environ.get("_PROBE_CHILD"):
        return _child()
    for i in range(8):
        env = dict(os.environ, _PROBE_CHILD="1")
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=900)
        except subprocess.TimeoutExpired as e:
            print(f"attempt {i}: timeout"
                  f" (partial: {str(e.stdout)[-200:]})", flush=True)
            continue
        if out.returncode == 0:
            print(out.stdout)
            return 0
        print(f"attempt {i}: rc={out.returncode} "
              f"out={out.stdout[-300:]} err={out.stderr[-300:]}", flush=True)
        time.sleep(10 if out.returncode == 3 else 20)
    return 1


if __name__ == "__main__":
    sys.exit(main())
