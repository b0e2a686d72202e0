"""On-TPU A/B of payload-demod formulations (the planar pipeline's #1
HBM consumer: 21.3 KB/sample, docs/tpu_runs/r05_planar_stage_v2.json,
vs 109 B/sample for the min-only EVM scan of the SAME table).

Hypothesis: the int32 argmin carry chain in ``_nearest_sym``'s unrolled
table scan exceeds the TPU fusion budget, so every [K, n_pts]
intermediate spills to HBM; the EVM path returns only the float min, its
index chain is DCE'd, and the whole scan fuses.  Variants:

* cur        — production generic_demod_bits (argmin via chunked scan)
* dmin_only  — same scan, min only (control: should match the EVM cost)
* sym_only   — same scan, argmin only (isolate the index carry)
* tiled<T>   — scan over [K, T] point tiles, full table unrolled inside
               (spill buffers shrink from n_pts to T)
* mxu<T>     — per-tile score matrix via dot + argmin reduction

Usage: run on TPU; reads the stage probe's cached inputs.  One JSON
line for docs/tpu_runs/.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from planar_stage_probe import (_code_key, _enable_compile_cache,  # noqa: E402
                                make_looped, timeit)


def _nearest_tiled(x, table, T):
    """Point-tiled argmin: x [n] complex, table [C] complex."""
    import jax.numpy as jnp
    from jax import lax
    C = table.shape[0]
    n = x.shape[0]
    ntiles = -(-n // T)
    pad = ntiles * T - n
    xr = jnp.pad(jnp.real(x), (0, pad)).reshape(ntiles, T)
    xi = jnp.pad(jnp.imag(x), (0, pad)).reshape(ntiles, T)
    tr, ti = jnp.real(table), jnp.imag(table)

    def body(_, xt):
        xrt, xit = xt
        bm = jnp.full((T,), jnp.float32(1e30))
        ba = jnp.zeros((T,), jnp.int32)
        for k in range(C):
            d = (xrt - tr[k]) ** 2 + (xit - ti[k]) ** 2
            upd = d < bm
            bm = jnp.where(upd, d, bm)
            ba = jnp.where(upd, k, ba)
        return None, (ba, bm)

    _, (sym, dmin) = lax.scan(body, None, (xr, xi))
    return sym.reshape(-1)[:n], dmin.reshape(-1)[:n]


def _nearest_mxu(x, table, T):
    """Per-tile score matrix [T, C] via dot + argmin reduction."""
    import jax.numpy as jnp
    from jax import lax
    C = table.shape[0]
    n = x.shape[0]
    ntiles = -(-n // T)
    pad = ntiles * T - n
    xr = jnp.pad(jnp.real(x), (0, pad)).reshape(ntiles, T)
    xi = jnp.pad(jnp.imag(x), (0, pad)).reshape(ntiles, T)
    tr, ti = jnp.real(table), jnp.imag(table)
    bias = tr * tr + ti * ti                     # [C]

    def body(_, xt):
        xrt, xit = xt
        score = (-2.0 * (xrt[:, None] * tr[None, :]
                         + xit[:, None] * ti[None, :])
                 + bias[None, :])                # [T, C]
        sym = jnp.argmin(score, axis=-1).astype(jnp.int32)
        dmin = jnp.min(score, axis=-1) + xrt * xrt + xit * xit
        return None, (sym, dmin)

    _, (sym, dmin) = lax.scan(body, None, (xr, xi))
    return sym.reshape(-1)[:n], dmin.reshape(-1)[:n]


def main():
    bs = int(os.environ.get("BS", 65536))
    maxf = int(os.environ.get("MAXF", 24))
    cache = (f"/tmp/planar_stage_inputs_bs{bs}_mf{maxf}"
             f"_{_code_key()}.npz")
    if not os.path.exists(cache):
        import subprocess
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__),
                                     "planar_stage_probe.py"),
                        "--build", cache], check=True,
                       env=dict(os.environ, JAX_PLATFORMS="cpu"))
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    from liquid_usrp_tpu.framing import payload as payload_codec
    from liquid_usrp_tpu.ops.planar import planarize, to_planar

    print("backend:", jax.devices(), file=sys.stderr, flush=True)
    params = ofdm.make_ofdm_params(48, 6, 4)
    sync = ofdm_sync.make_sync(params, block_size=bs, max_payload=512,
                               max_frames=maxf)
    data = np.load(cache)
    pts_p = jax.device_put(to_planar(data["points"]))
    mod = jnp.asarray(data["mod"])
    n_pts = data["points"].shape[-1]

    def tab_of(m):
        return jnp.asarray(payload_codec._stacked_tables())[m][:64]

    def cur(t, pts):
        bits = jax.vmap(lambda x, m: payload_codec.generic_demod_bits(
            x, m, sync.enc_max * 8, n_table=64)[0])(pts + t, mod)
        return jnp.sum(bits)

    def dmin_only(t, pts):
        d = jax.vmap(lambda x, m: payload_codec._nearest_sym(
            x, tab_of(m))[1])(pts + t, mod)
        return jnp.sum(d)

    def sym_only(t, pts):
        s = jax.vmap(lambda x, m: payload_codec._nearest_sym(
            x, tab_of(m))[0])(pts + t, mod)
        return jnp.sum(s)

    def make_tiled(T, impl):
        def fn(t, pts):
            s, d = jax.vmap(lambda x, m: impl(x, tab_of(m), T))(
                pts + t, mod)
            return jnp.sum(s) + jnp.sum(d)
        return fn

    # --- detect sub-stages (the other 2.8 KB/sample) ---
    ext_p = jax.device_put(to_planar(data["stream"]))
    locs = jnp.asarray(data["locs"])
    M = params.M
    win = M
    n_metric = sync.block_size + 2 * win + 1
    metric_host = np.abs(np.random.default_rng(3).standard_normal(
        n_metric).astype(np.float32)) * 0.2
    metric_d = jax.device_put(jnp.asarray(metric_host))

    def nms_rw(t, m):
        m = m + t
        lm = jax.lax.reduce_window(m, -jnp.inf, jax.lax.max,
                                   (2 * win + 1,), (1,), "SAME")
        return jnp.sum(lm)

    def nms_vanherk(t, m):
        m = m + t
        W = 2 * win + 1
        half = win
        n = m.shape[0]
        nt = -(-(n + 2 * half) // W)
        xp = jnp.pad(m, (half, nt * W - n - half),
                     constant_values=-jnp.inf)
        blocks = xp.reshape(nt, W)
        P = jax.lax.cummax(blocks, axis=1).reshape(-1)
        S = jax.lax.cummax(blocks[:, ::-1], axis=1)[:, ::-1].reshape(-1)
        i = jnp.arange(n)
        return jnp.sum(jnp.maximum(S[i], P[i + W - 1]))

    def find_cands(t, m):
        det, locs_ = ofdm_sync._find_candidates(sync, m + t)
        return jnp.sum(det) + jnp.sum(locs_)

    def c_at_only(t, ext):
        c = ofdm_sync._c_at(sync, ext + t, locs)
        return jnp.sum(jnp.abs(c))

    stages = {
        "cur": (cur, (pts_p,)),
        "dmin_only": (dmin_only, (pts_p,)),
        "sym_only": (sym_only, (pts_p,)),
        "tiled_512": (make_tiled(512, _nearest_tiled), (pts_p,)),
        "tiled_2048": (make_tiled(2048, _nearest_tiled), (pts_p,)),
        "mxu_512": (make_tiled(512, _nearest_mxu), (pts_p,)),
        "nms_rw": (nms_rw, (metric_d,)),
        "nms_vanherk": (nms_vanherk, (metric_d,)),
        "find_cands": (find_cands, (metric_d,)),
        "c_at": (c_at_only, (ext_p,)),
    }
    only = os.environ.get("STAGES")
    if only:
        keep = set(only.split(","))
        stages = {k: v for k, v in stages.items() if k in keep}

    report = {"bs": bs, "max_frames": maxf, "n_pts": int(n_pts),
              "device": jax.devices()[0].device_kind, "stages": {}}
    t0s = jax.device_put(jnp.float32(0.0))
    n0s = jax.device_put(jnp.int32(1))
    for name, (fn, base_args) in stages.items():
        try:
            t0 = time.time()
            exe = jax.jit(planarize(make_looped(fn))).lower(
                t0s, n0s, *base_args).compile()
            compile_s = time.time() - t0
            try:
                ca = exe.cost_analysis() or {}
            except Exception:
                ca = {}
            dt = timeit(exe, base_args)
            row = {"ms": round(dt * 1e3, 3),
                   "compile_s": round(compile_s, 1),
                   "bytes": float(ca.get("bytes accessed", 0)),
                   "bytes_per_sample": round(
                       float(ca.get("bytes accessed", 0)) / bs, 1),
                   "GBps": round(
                       float(ca.get("bytes accessed", 0)) / dt / 1e9, 1)}
        except Exception as e:  # noqa: BLE001 — variant isolation
            row = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
        report["stages"][name] = row
        print(f"  {name:12s}: {row}", file=sys.stderr, flush=True)

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
