"""On-TPU stage cost probe for the PLANAR pipeline (HBM attribution).

Round-5 v2.  The r05 coarse probe attributed the planar sync's HBM
traffic (docs/tpu_runs/r05_planar_stage_v1.json): full step 46.3 KB per
channel sample (3.03 GB / 65k block) of which detect+NMS is ~3.2 KB and
the legacy autocorr metric 0.37 KB — the candidate refine/decode path
owns ~93% of all bytes.  This v2 probe carves the decode path into its
stages (xcorr metric, candidate extraction, per-candidate refine,
payload demod, FEC+CRC, EVM) so each optimization round can see which
stage pays.

Hard-won measurement rules (ROUND4_NOTES):

* timings must vary inputs per iteration — repeated dispatch of the
  same executable on the same buffers is served from a cache over the
  tunnel (observed "6309 GB/s" on an 819 GB/s chip);
* XLA cost analysis (flops / bytes accessed) is static and trustworthy;
* the persistent compilation cache WORKS over the tunnel (measured
  0.74 s -> 0.08 s across processes) — enabled here so re-probes after
  a code change only recompile the changed stages.

Env: BS (block size, default 65536), MAXF (max_frames, default 24),
STAGES (comma list to restrict), VAR (input variants for timing,
default 4).  Output: one JSON line for docs/tpu_runs/.
"""
import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

_CACHE_DIR = os.environ.get("JAX_PERSISTENT_CACHE", "/tmp/xla_bench_cache")


def _enable_compile_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _code_key() -> str:
    """Short content key over the modules that shape the probe inputs —
    a stale /tmp cache after a frame-assembly change would silently feed
    mismatched streams (ADVICE r4)."""
    h = hashlib.sha256()
    root = os.path.join(os.path.dirname(__file__), "..", "liquid_usrp_tpu")
    for rel in ("framing/ofdm.py", "framing/ofdm_sync.py",
                "framing/payload.py", "ops/modem.py", "ops/fec.py"):
        with open(os.path.join(root, rel), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:10]


def make_looped(fn):
    """Wrap stage ``fn(t, *args) -> f32 scalar`` as ``looped(t, n,
    *args)`` running the stage ``n`` times inside ONE executable via
    ``fori_loop`` (traced bound — no recompile per n), with a
    per-iteration uniqueness offset so nothing CSEs across iterations
    and the carry chains the iterations serially."""
    import jax.numpy as jnp
    from jax import lax

    def looped(t, n, *args):
        def body(i, acc):
            return acc + fn(t + jnp.float32(1e-6) *
                            (i.astype(jnp.float32) + acc * 0), *args)
        return lax.fori_loop(0, n, body, jnp.float32(0.0))
    return looped


def timeit(exe, base_args, target_s=0.2, n_max=512):
    """Per-iteration device seconds for ``exe(t, n, *args)`` (a
    :func:`make_looped` stage) by N-differencing.

    On this tunnel backend the naive recipes are all wrong:
    ``block_until_ready`` returns before execution, repeated
    (executable, buffers) dispatches are served from a cache, a value
    fetch costs a ~35 ms round-trip, and each dispatch RPC ~0.4 ms
    (measured, ROUND5 notes).  So: run the stage n times INSIDE one
    dispatch, fetch the scalar result to drain, and difference n=1
    against a large n — RTT and dispatch overhead cancel exactly."""
    import jax
    import jax.numpy as jnp
    state = {"k": 0}

    def run(n):
        state["k"] += 1
        t = jax.device_put(jnp.float32(1e-3 * state["k"]))
        nn = jax.device_put(jnp.int32(n))
        t0 = time.perf_counter()
        np.asarray(exe(t, nn, *base_args))
        return time.perf_counter() - t0

    run(1)
    run(1)                                   # warm (compile + caches)
    n = 8
    while True:
        t1 = min(run(1), run(1))
        tn = min(run(n), run(n))
        if tn - t1 > target_s or n >= n_max:
            return max(tn - t1, 1e-9) / (n - 1)
        n *= 4


def _anchors():
    """Per-session calibration anchors: measured bf16 matmul FLOP/s and
    an HBM stream read bandwidth, every call unique (see timeit).  Lets
    artifacts from different sessions be compared (r04 saw an
    unexplained 3.9x cross-session spread with no way to tell which
    session was slow)."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    k = 2048
    a = jnp.asarray(rng.standard_normal((k, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((k, k)), jnp.bfloat16)

    def mm(t, a, b):
        return ((a + t.astype(jnp.bfloat16)) @ b).astype(jnp.float32).sum()

    dt = timeit(jax.jit(make_looped(mm)), (a, b))
    matmul_tflops = 2 * k * k * k / dt / 1e12
    n = 1 << 24                              # 64 MB f32
    v = jnp.asarray(rng.standard_normal(n), jnp.float32)

    def rd(t, x):
        return (x + t).sum()

    dt = timeit(jax.jit(make_looped(rd)), (v,))
    stream_gbps = 4 * n / dt / 1e9
    return {"bf16_matmul_tflops": round(matmul_tflops, 1),
            "hbm_read_gbps": round(stream_gbps, 1)}


def _build_inputs(path: str) -> None:
    """Forced-CPU child: build the loaded stream, init state, candidate
    locations, and the refine outputs (points + per-frame props) that
    feed the payload-stage probes."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync

    params = ofdm.make_ofdm_params(48, 6, 4)
    bs = int(os.environ.get("BS", 65536))
    maxf = int(os.environ.get("MAXF", 24))
    sync = ofdm_sync.make_sync(params, block_size=bs, max_payload=512,
                               max_frames=maxf)
    rng = np.random.default_rng(0)
    props = ofdm.default_props()
    hdr = rng.integers(0, 256, 8, dtype=np.uint8)
    pay = rng.integers(0, 256, 400, dtype=np.uint8)
    w = np.asarray(ofdm.assemble_frame(params, props, jnp.asarray(hdr),
                                       jnp.asarray(pay)))
    flen = len(w)
    stream = np.zeros(bs + sync.overlap, np.complex64)
    pos = 64
    while pos + flen + 128 < bs:
        stream[pos:pos + flen] = w
        pos += flen + 128
    stream += 0.01 * (rng.standard_normal(stream.shape)
                      + 1j * rng.standard_normal(stream.shape)
                      ).astype(np.complex64)
    state_host = jax.device_get(ofdm_sync.sync_init(sync))
    leaves, _ = jax.tree.flatten(state_host)

    # ground-truth candidates + the refine stage's outputs (the payload
    # probes' inputs), computed with the production detector on host
    ext = jnp.asarray(stream)
    detected, locs, c_at = ofdm_sync._detect_candidates(sync, ext)
    (user, points, plen, mod, f0, f1, check, hvalid, rssi, hevm,
     cfo) = jax.vmap(lambda n0, ca: ofdm_sync._decode_candidate(
        sync, ext, n0, ca))(locs, c_at)
    np.savez(path, stream=stream, locs=np.asarray(locs),
             c_at=np.asarray(c_at),
             points=np.asarray(points), plen=np.asarray(plen),
             mod=np.asarray(mod), f0=np.asarray(f0), f1=np.asarray(f1),
             check=np.asarray(check), hvalid=np.asarray(hvalid),
             hevm=np.asarray(hevm),
             **{f"s{i}": np.asarray(v) for i, v in enumerate(leaves)})


def main():
    bs = int(os.environ.get("BS", 65536))
    maxf = int(os.environ.get("MAXF", 24))

    cache = (f"/tmp/planar_stage_inputs_bs{bs}_mf{maxf}"
             f"_{_code_key()}.npz")
    if not os.path.exists(cache):
        subprocess.run([sys.executable, os.path.abspath(__file__),
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
    stream = data["stream"]
    shape_leaves, treedef = jax.tree.flatten(
        jax.eval_shape(lambda: ofdm_sync.sync_init(sync)))
    state_host = jax.tree.unflatten(
        treedef, [data[f"s{i}"] for i in range(len(shape_leaves))])

    ext_p = jax.device_put(to_planar(stream))
    blk_p = jax.device_put(to_planar(stream[sync.overlap:].copy()))
    state_p = jax.device_put(to_planar(state_host))
    locs = jnp.asarray(data["locs"])
    c_at_p = jax.device_put(to_planar(data["c_at"]))
    pts_p = jax.device_put(to_planar(data["points"]))
    plen, mod = jnp.asarray(data["plen"]), jnp.asarray(data["mod"])
    f0, f1 = jnp.asarray(data["f0"]), jnp.asarray(data["f1"])
    check = jnp.asarray(data["check"])
    hvalid = jnp.asarray(data["hvalid"])
    hevm = jnp.asarray(data["hevm"])

    # every stage's first arg is the uniqueness scalar t (see timeit):
    # folded into the stage input at negligible scale so no two calls
    # ever present the same argument buffers
    def xcorr_metric(t, ext):
        return jnp.sum(ofdm_sync._detect_metric_xcorr(sync, ext + t))

    def detect_cands(t, ext):
        det, locs_, c = ofdm_sync._detect_candidates(sync, ext + t)
        return jnp.sum(det) + jnp.sum(locs_) + jnp.sum(jnp.abs(c))

    def refine(t, ext, c_at_):
        outs = jax.vmap(lambda n0, ca: ofdm_sync._decode_candidate(
            sync, ext + t, n0, ca))(locs, c_at_)
        acc = 0.0
        for o in outs:
            acc = acc + jnp.sum(jnp.abs(o.astype(jnp.float32))
                                if o.dtype != jnp.complex64
                                else jnp.abs(o))
        return acc

    def payload_demod(t, pts):
        bits = jax.vmap(lambda x, m: payload_codec.generic_demod_bits(
            x, m, sync.enc_max * 8, n_table=64)[0])(pts + t, mod)
        return jnp.sum(bits)

    def payload_fec(t, pts):
        pay, ok = payload_codec.decode_payload_batch(
            sync.enc_max, sync.dec_max, sync.max_payload, pts + t, mod,
            f0, f1, check, plen, hvalid, sync.fecs)
        return jnp.sum(pay) + jnp.sum(ok)

    def payload_evm(t, pts):
        used = payload_codec.payload_points_used(
            sync.fecs, sync.dec_max, sync.enc_max, plen, mod, f0, f1,
            check)
        mse = payload_codec.payload_evm_mse(pts + t, mod, used)
        return jnp.sum(payload_codec.frame_evm_db(hevm, mse, used))

    step = ofdm_sync.make_sync_step(sync)

    def full_step(t, state, block):
        st, res = step(state, block + t)
        return jnp.sum(res.payload_valid) + jnp.sum(res.payload) \
            + jnp.sum(jnp.abs(st.tail))

    # glue attribution: the vmapped candidate window slice on its own,
    # and the no-detection floor (noise input keeps the decode gate's
    # skip branch — detect + state carry + result assembly only)
    def window_gather(t, ext):
        wins = jax.vmap(lambda n0: ofdm_sync._window_gather(
            ext + t, n0, sync.overlap))(locs)
        return jnp.sum(jnp.abs(wins))

    noise_blk = 0.01 * (np.random.default_rng(9).standard_normal(bs)
                        + 1j * np.random.default_rng(10)
                        .standard_normal(bs)).astype(np.complex64)
    noise_p = jax.device_put(to_planar(noise_blk))

    stages = {
        "xcorr_metric": (xcorr_metric, (ext_p,)),
        "detect_cands": (detect_cands, (ext_p,)),
        "window_gather": (window_gather, (ext_p,)),
        "refine": (refine, (ext_p, c_at_p)),
        "payload_demod": (payload_demod, (pts_p,)),
        "payload_fec": (payload_fec, (pts_p,)),
        "payload_evm": (payload_evm, (pts_p,)),
        "full_step": (full_step, (state_p, blk_p)),
        "full_step_idle": (full_step, (state_p, noise_p)),
    }
    only = os.environ.get("STAGES")
    if only:
        keep = set(only.split(","))
        stages = {k: v for k, v in stages.items() if k in keep}

    report = {"bs": bs, "max_frames": maxf,
              "device": jax.devices()[0].device_kind,
              "code_key": _code_key(), "stages": {}}
    try:
        report["anchors"] = _anchors()
        print(f"  anchors: {report['anchors']}", file=sys.stderr,
              flush=True)
    except Exception as e:  # noqa: BLE001
        report["anchors"] = {"error": str(e)[:120]}
    t_sample = jax.device_put(jnp.float32(0.0))
    n_sample = jax.device_put(jnp.int32(1))
    for name, (fn, base_args) in stages.items():
        t0 = time.time()
        exe = jax.jit(planarize(make_looped(fn))).lower(
            t_sample, n_sample, *base_args).compile()
        compile_s = time.time() - t0
        try:
            ca = exe.cost_analysis() or {}
        except Exception:
            ca = {}
        dt = timeit(exe, base_args)
        row = {
            "ms": round(dt * 1e3, 3),
            "MSps": round(bs / dt / 1e6, 2),
            "compile_s": round(compile_s, 1),
            "flops": float(ca.get("flops", 0)),
            "bytes": float(ca.get("bytes accessed", 0)),
            "bytes_per_sample": round(float(ca.get("bytes accessed", 0))
                                      / bs, 1),
            "hbm_GBps": round(float(ca.get("bytes accessed", 0)) / dt / 1e9,
                              1),
        }
        report["stages"][name] = row
        print(f"  {name:14s}: {row['ms']:9.2f} ms  {row['MSps']:8.2f} MS/s  "
              f"{row['bytes_per_sample']:9.1f} B/samp  "
              f"{row['hbm_GBps']:6.1f} GB/s  (compile {compile_s:.0f}s)",
              file=sys.stderr, flush=True)

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--build":
        _build_inputs(sys.argv[2])
        sys.exit(0)
    sys.exit(main())
