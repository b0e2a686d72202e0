"""Throughput table for all three frame-family synchronizers + channelizer.

Prints one row per pipeline (samples/s/chip).  Unlike bench.py (driver
interface, one JSON line) this is the human-facing overview; run on the
real chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def _time(run, state, blocks, iters=5):
    """Time ``run`` keeping its RESULTS live.

    Every runner returns ``(state, live_scalar)`` where the scalar
    depends on the per-block results: the carried sync states depend
    only on the INPUT samples (tail slices + counters), so a runner
    returning state alone lets XLA dead-code-eliminate the entire
    detector/decode — the harness then times a memcpy (the round-1..3
    per-pipeline sync rows were invalid for exactly this reason:
    2.3 GS/s "ofdm_sync" on a 4-core host).
    """
    import jax
    out = run(state, blocks)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    st = state
    acc = None
    for _ in range(iters):
        st, live = run(st, blocks)
        acc = live if acc is None else acc + live
    jax.block_until_ready((st, acc))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    BS = 32768
    SCAN = 4
    rows = []

    def noise(shape):
        return jnp.asarray(
            (0.1 * (rng.normal(size=shape) + 1j * rng.normal(size=shape)))
            .astype(np.complex64))

    # OFDM sync
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    params = ofdm.make_ofdm_params(48, 6, 4)
    sync = ofdm_sync.make_sync(params, block_size=BS, max_payload=512,
                               max_frames=16)

    @jax.jit
    def run_ofdm(state, blocks):
        def body(st, b):
            st, res = ofdm_sync.sync_block(sync, st, b)
            return st, jnp.sum(res.detected)
        st, d = jax.lax.scan(body, state, blocks)
        return st, jnp.sum(d)

    dt = _time(run_ofdm, ofdm_sync.sync_init(sync), noise((SCAN, BS)))
    rows.append(("ofdm_sync", SCAN * BS / dt))

    # flexframe sync
    from liquid_usrp_tpu.framing import flexframe as ff
    from liquid_usrp_tpu.framing import flexframe_sync as ffs
    fparams = ff.make_flex_params()
    fsync = ffs.make_flex_sync(fparams, block_size=BS, max_payload=512,
                               max_frames=16)

    @jax.jit
    def run_flex(state, blocks):
        def body(st, b):
            st, res = ffs.flex_sync_block(fsync, st, b)
            return st, jnp.sum(res.detected)
        st, d = jax.lax.scan(body, state, blocks)
        return st, jnp.sum(d)

    dt = _time(run_flex, ffs.flex_sync_init(fsync), noise((SCAN, BS)))
    rows.append(("flexframe_sync", SCAN * BS / dt))

    # GMSK sync
    from liquid_usrp_tpu.framing import gmskframe as gf
    gparams = gf.make_gmsk_params()
    gsync = gf.make_gmsk_sync(gparams, block_size=BS, max_payload=512,
                              max_frames=16)

    @jax.jit
    def run_gmsk(state, blocks):
        def body(st, b):
            st, res = gf.gmsk_sync_block(gsync, st, b)
            return st, jnp.sum(res.detected)
        st, d = jax.lax.scan(body, state, blocks)
        return st, jnp.sum(d)

    dt = _time(run_gmsk, gf.gmsk_sync_init(gsync), noise((SCAN, BS)))
    rows.append(("gmsk_sync", SCAN * BS / dt))

    # channelizer alone (64-channel analysis)
    from liquid_usrp_tpu.ops import pfb
    chz = pfb.pfbch_create(128, m=7)

    @jax.jit
    def run_pfb(state, blocks):
        def body(st, b):
            st2, X = pfb.pfb_analyze_block(chz, st, b)
            return st2, jnp.sum(jnp.abs(X[0]))
        st, d = jax.lax.scan(body, state, blocks)
        return st, jnp.sum(d)

    dt = _time(run_pfb, pfb.pfbch_state(chz),
               noise((SCAN, 128 * 8192)))
    rows.append(("pfb_analyze_128ch", SCAN * 128 * 8192 / dt))

    # full mcrx pipeline, complex64 vs bf16-planes ingest (docs/roofline
    # "input precision" lever) — noise input, detect path loaded
    from liquid_usrp_tpu.models.multichannel import make_mcrx_step
    from liquid_usrp_tpu.ops import iqfmt
    N = 4
    init_state, step = make_mcrx_step(N, sync)

    @jax.jit
    def run_mcrx(state, blocks):
        def body(st, x):
            st, res = step(st, x)
            return st, jnp.sum(res.detected)
        st, d = jax.lax.scan(body, state, blocks)
        return st, jnp.sum(d)

    mix = noise((SCAN, 2 * N * BS))
    dt = _time(run_mcrx, init_state(), mix)
    rows.append(("mcrx_4ch_c64", SCAN * 2 * N * BS / dt))
    planes = jnp.stack([mix.real, mix.imag], axis=1).astype(jnp.bfloat16)
    dt = _time(run_mcrx, init_state(), planes)
    rows.append(("mcrx_4ch_bf16", SCAN * 2 * N * BS / dt))

    print(f"{'pipeline':24s} {'samples/s/chip':>16s} {'vs 8 MS/s':>10s}")
    for name, sps in rows:
        print(f"{name:24s} {sps:16,.0f} {sps / 8e6:9.0f}x")
    # machine-readable trailer so scripts/record_tpu_run.sh can persist
    # the table as a docs/tpu_runs artifact (VERDICT r2 #3)
    import json
    print(json.dumps({
        "device": jax.devices()[0].platform,
        "block_size": BS,
        "rows": {name: round(sps, 1) for name, sps in rows}}))


if __name__ == "__main__":
    main()
