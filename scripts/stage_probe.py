"""On-TPU stage cost probe for the OFDM sync front-end.

Times each detection stage separately at a large block size to attribute
the per-block fixed cost (cumsum metric, NMS reduce_window, top_k, decode
gate) — the data behind the Pallas/fixed-cost optimization choices.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def timeit(fn, *args, n=10):
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


def main():
    import jax
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync

    print("backend:", jax.devices())
    params = ofdm.make_ofdm_params(48, 6, 4)
    bs = int(os.environ.get("BS", 131072))
    sync = ofdm_sync.make_sync(params, block_size=bs, max_payload=512,
                               max_frames=48)
    rng = np.random.default_rng(0)
    ext = jnp.asarray((rng.normal(size=bs + sync.overlap) +
                       1j * rng.normal(size=bs + sync.overlap))
                      .astype(np.complex64) * 0.1)
    block = ext[sync.overlap:]
    state = ofdm_sync.sync_init(sync)

    @jax.jit
    def metric_only(ext):
        m, c = ofdm_sync._detect_metric(sync, ext)
        return m.sum() + jnp.abs(c).sum()

    @jax.jit
    def metric_raw(ext):
        m, c = ofdm_sync._detect_metric(sync, ext)
        return m, c

    @jax.jit
    def nms_only(metric):
        win = params.M
        local_max = jax.lax.reduce_window(
            metric, -jnp.inf, jax.lax.max, (2 * win + 1,), (1,), "SAME")
        return local_max.sum()

    @jax.jit
    def topk_only(metric):
        vals, locs = jax.lax.top_k(metric, sync.max_frames)
        return vals.sum() + locs.sum()

    @jax.jit
    def detect_all(ext):
        m, c = ofdm_sync._detect_metric(sync, ext)
        det, locs = ofdm_sync._find_candidates(sync, m)
        return jnp.sum(det) + jnp.sum(locs)

    step = ofdm_sync.make_sync_step(sync)

    m, _ = metric_raw(ext)
    jax.block_until_ready(m)

    t = {}
    t["metric"] = timeit(metric_only, ext)
    t["nms"] = timeit(nms_only, m)
    t["topk"] = timeit(topk_only, m)
    t["detect_all"] = timeit(detect_all, ext)
    t["full_step_idle"] = timeit(lambda: step(state, block), n=5)

    for k, v in t.items():
        print(f"  {k:16s}: {v*1e3:8.3f} ms   ({bs/v/1e6:9.1f} MS/s)")


def granular():
    """Attribute the full-step fixed cost beyond detection."""
    import jax
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync

    params = ofdm.make_ofdm_params(48, 6, 4)
    bs = int(os.environ.get("BS", 131072))
    sync = ofdm_sync.make_sync(params, block_size=bs, max_payload=512,
                               max_frames=48)
    rng = np.random.default_rng(0)
    ext_len = bs + sync.overlap
    block = jnp.asarray((rng.normal(size=bs) + 1j * rng.normal(size=bs))
                        .astype(np.complex64) * 0.1)
    state = ofdm_sync.sync_init(sync)

    @jax.jit
    def detect_state(state, block):
        ext = jnp.concatenate([state.tail, block])
        metric, c = ofdm_sync._detect_metric(sync, ext)
        det, locs = ofdm_sync._find_candidates(sync, metric)
        new_state = ofdm_sync.OfdmSyncState(
            tail=ext[ext.shape[0] - sync.overlap:],
            base=state.base + sync.block_size)
        return new_state, jnp.sum(det) + jnp.sum(locs)

    @jax.jit
    def detect_state_catgather(state, block):
        ext = jnp.concatenate([state.tail, block])
        metric, c = ofdm_sync._detect_metric(sync, ext)
        det, locs = ofdm_sync._find_candidates(sync, metric)
        c_at = c[jnp.clip(locs, 0, c.shape[0] - 1)]
        new_state = ofdm_sync.OfdmSyncState(
            tail=ext[ext.shape[0] - sync.overlap:],
            base=state.base + sync.block_size)
        return new_state, jnp.sum(det) + jnp.sum(jnp.abs(c_at))

    step = ofdm_sync.make_sync_step(sync)

    st, _ = detect_state(state, block)
    st2, _ = detect_state_catgather(state, block)
    st3, _ = step(state, block)
    jax.block_until_ready((st, st2, st3))
    t1 = timeit(lambda: detect_state(state, block), n=10)
    t2 = timeit(lambda: detect_state_catgather(state, block), n=10)
    t3 = timeit(lambda: step(state, block), n=10)
    print(f"  detect+state          : {t1*1e3:8.3f} ms")
    print(f"  detect+state+catgather: {t2*1e3:8.3f} ms")
    print(f"  full step (idle)      : {t3*1e3:8.3f} ms")


def batched_vs_scan():
    """Compare scan-of-steps vs the multi-block batched mcrx dispatch."""
    import jax
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    from liquid_usrp_tpu.models.multichannel import (make_mcrx_step,
                                                     make_mcrx_batched_step)

    N = 4
    params = ofdm.make_ofdm_params(48, 6, 4)
    rng = np.random.default_rng(0)
    for bs, nb, mf in ((32768, 4, 16), (131072, 1, 48), (131072, 2, 48)):
        sync = ofdm_sync.make_sync(params, block_size=bs, max_payload=512,
                                   max_frames=mf)
        g = 2 * N * bs
        x = jnp.asarray((rng.normal(size=nb * g) +
                         1j * rng.normal(size=nb * g))
                        .astype(np.complex64) * 0.1)
        init_s, step = make_mcrx_step(N, sync)
        init_b, bstep = make_mcrx_batched_step(N, sync, nb)

        @jax.jit
        def run_scan(state, xs):
            def body(st, b):
                st, r = step(st, b)
                return st, jnp.sum(r.detected)
            return jax.lax.scan(body, state, xs.reshape(nb, g))

        s0 = init_s()
        b0 = init_b()
        r1 = run_scan(s0, x)
        r2 = bstep(b0, x)
        jax.block_until_ready((r1, r2))
        t_scan = timeit(lambda: run_scan(s0, x), n=5)
        t_bat = timeit(lambda: bstep(b0, x), n=5)
        tot = nb * g
        print(f"  bs={bs:6d} nb={nb}: scan {tot/t_scan/1e9:7.2f} GS/s   "
              f"batched {tot/t_bat/1e9:7.2f} GS/s")


if __name__ == "__main__":
    main()
    print("--- granular ---")
    granular()
    print("--- batched vs scan ---")
    batched_vs_scan()
