"""TPU stage-timing breakdown for the OFDM synchronizer.

Times (a) detection only, (b) the full sync block at several block sizes,
with loaded and idle inputs — the data used to decide where kernel-level
optimization effort goes.  Run on the real chip: ``python
scripts/perf_breakdown.py``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync

    params = ofdm.make_ofdm_params(48, 6, 4)
    rng = np.random.default_rng(0)

    # a loaded stream: back-to-back frames (generated on host CPU)
    props = ofdm.default_props()
    frames = []
    with jax.default_device(jax.devices("cpu")[0]):
        for i in range(40):
            h = rng.integers(0, 256, 8, dtype=np.uint8)
            p = rng.integers(0, 256, 400, dtype=np.uint8)
            frames.append(np.asarray(ofdm.assemble_frame(
                params, props, jnp.asarray(h), jnp.asarray(p))))
            frames.append(np.zeros(500, np.complex64))
    loaded = np.concatenate(frames)

    for bs in (8192, 32768):
        sync = ofdm_sync.make_sync(params, block_size=bs, max_payload=512,
                                   max_frames=8)

        @jax.jit
        def detect_only(state, block):
            ext = jnp.concatenate([state.tail, block])
            metric, c = ofdm_sync._detect_metric(sync, ext)
            det, locs = ofdm_sync._find_candidates(sync, metric)
            return jnp.sum(det) + jnp.sum(locs)

        step = ofdm_sync.make_sync_step(sync)
        state = ofdm_sync.sync_init(sync)

        for name, src in (("idle", None), ("loaded", loaded)):
            if src is None:
                blocks = (0.05 * (rng.normal(size=(8, bs)) +
                                  1j * rng.normal(size=(8, bs)))
                          ).astype(np.complex64)
            else:
                reps = -(-8 * bs // len(src))
                cat = np.tile(src, reps)[: 8 * bs]
                noise = (0.02 * (rng.normal(size=cat.shape) +
                                 1j * rng.normal(size=cat.shape))
                         ).astype(np.complex64)
                blocks = (cat + noise).reshape(8, bs)
            blocks = jnp.asarray(blocks)

            # warm up both graphs
            jax.block_until_ready(detect_only(state, blocks[0]))
            st = state
            st, _ = step(st, blocks[0])
            jax.block_until_ready(st)

            t0 = time.perf_counter()
            for i in range(8):
                r = detect_only(state, blocks[i % 8])
            jax.block_until_ready(r)
            t_det = (time.perf_counter() - t0) / 8

            st = state
            t0 = time.perf_counter()
            for i in range(8):
                st, res = step(st, blocks[i % 8])
            jax.block_until_ready(st)
            t_full = (time.perf_counter() - t0) / 8

            print(f"bs={bs:6d} {name:7s}: detect {t_det*1e3:7.2f} ms  "
                  f"full {t_full*1e3:7.2f} ms  "
                  f"-> {bs/t_full/1e6:8.1f} MS/s", flush=True)


if __name__ == "__main__":
    main()
