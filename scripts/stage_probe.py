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


if __name__ == "__main__":
    main()
