"""On-TPU stage cost probe for the PLANAR pipeline (HBM attribution).

The planar mcrx pipeline measures ~100 KB of HBM traffic per IQ sample
(docs/tpu_runs/), far above the theoretical need — this probe times each
stage separately and reads XLA cost analysis per stage to attribute the
traffic: detection metric, candidate refine, payload decode, PFB
front-end, full sync.  Real-gate only; safe on complex-rejecting tunnel
deployments.

Env: BS (block size, default 65536), MAXF (max_frames, default 24).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def timeit(fn, *args, n=5):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def _build_inputs(path: str) -> None:
    """Forced-CPU child: build the loaded stream + init state to a file
    (some tunnel sessions refuse host-CPU backend registration, so the
    TPU process must never need an in-session cpu device)."""
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
    np.savez(path, stream=stream,
             **{f"s{i}": np.asarray(v) for i, v in enumerate(leaves)})


def main():
    import subprocess

    bs = int(os.environ.get("BS", 65536))
    maxf = int(os.environ.get("MAXF", 24))
    cache = f"/tmp/planar_stage_inputs_bs{bs}_mf{maxf}.npz"
    if not os.path.exists(cache):
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--build", cache], check=True,
                       env=dict(os.environ, JAX_PLATFORMS="cpu"))

    import jax
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    from liquid_usrp_tpu.models.multichannel import make_mcrx_batched_step
    from liquid_usrp_tpu.ops.planar import planarize, to_planar

    print("backend:", jax.devices(), file=sys.stderr, flush=True)
    params = ofdm.make_ofdm_params(48, 6, 4)
    sync = ofdm_sync.make_sync(params, block_size=bs, max_payload=512,
                               max_frames=maxf)

    data = np.load(cache)
    stream = data["stream"]
    # pytree structure re-derived backend-free; leaves from the file
    shape_leaves, treedef = jax.tree.flatten(
        jax.eval_shape(lambda: ofdm_sync.sync_init(sync)))
    state_host = jax.tree.unflatten(
        treedef, [data[f"s{i}"] for i in range(len(shape_leaves))])

    ext_p = jax.device_put(to_planar(stream))
    blk_p = jax.device_put(to_planar(stream[sync.overlap:].copy()))
    state_p = jax.device_put(to_planar(state_host))

    def metric_only(ext):
        m, c = ofdm_sync._detect_metric(sync, ext)
        return m.sum() + jnp.abs(c).sum()

    def detect_all(ext):
        m, c = ofdm_sync._detect_metric(sync, ext)
        det, locs = ofdm_sync._find_candidates(sync, m)
        return jnp.sum(det) + jnp.sum(locs)

    step = ofdm_sync.make_sync_step(sync)

    def full_step(state, block):
        st, res = step(state, block)
        return jnp.sum(res.payload_valid) + jnp.sum(res.payload) \
            + jnp.sum(jnp.abs(st.tail))

    stages = {
        "metric_only": (metric_only, (ext_p,)),
        "detect_all": (detect_all, (ext_p,)),
        "full_step_loaded": (full_step, (state_p, blk_p)),
    }

    report = {"bs": bs, "max_frames": maxf,
              "device": jax.devices()[0].device_kind, "stages": {}}
    for name, (fn, args) in stages.items():
        t0 = time.time()
        exe = jax.jit(planarize(fn)).lower(*args).compile()
        compile_s = time.time() - t0
        try:
            ca = exe.cost_analysis() or {}
        except Exception:
            ca = {}
        dt = timeit(exe, *args)
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
        print(f"  {name:18s}: {row['ms']:9.2f} ms  {row['MSps']:8.2f} MS/s  "
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
