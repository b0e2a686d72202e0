"""Benchmark: multichannel channelizer + OFDM demod IQ throughput per chip.

Measures the flagship RX pipeline (NCO mix -> 2N-channel polyphase analyzer
-> N vmapped OFDM flexframe synchronizers) on whatever backend JAX provides
(one real TPU chip under the driver).  This is the BASELINE.json headline
metric: IQ samples/s/chip for channelizer + OFDM demod.

``vs_baseline`` compares against 8 MS/s — the reference system's maximum
real-time operating envelope (USRP single-carrier bandwidth ceiling,
/root/reference/src/flexframe_tx.cc:37 "8MHz max"; its CPU implementation
exists to keep up with that hardware rate).

Prints exactly one JSON line.
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    from liquid_usrp_tpu.models.multichannel import make_mcrx_step

    N = 8                       # channels (2N = 16-bin channelizer)
    params = ofdm.make_ofdm_params(M=48, cp_len=6, taper_len=4)
    sync = ofdm_sync.make_sync(params, block_size=8192, max_payload=1024,
                               max_frames=8)
    init_state, step = make_mcrx_step(N, params, sync)

    # scan over SCAN_BLOCKS steps inside one jit to amortize dispatch
    SCAN_BLOCKS = 4
    g = 2 * N * sync.block_size          # mixture samples per step

    @jax.jit
    def run(state, blocks):
        def body(st, x):
            st, res = step(st, x)
            # reduce results to tiny stats so output transfer is negligible
            return st, (jnp.sum(res.detected), jnp.sum(res.payload_valid))
        return jax.lax.scan(body, state, blocks)

    rng = np.random.default_rng(0)
    noise = (rng.normal(size=(SCAN_BLOCKS, g)) +
             1j * rng.normal(size=(SCAN_BLOCKS, g))).astype(np.complex64)
    blocks = jnp.asarray(noise) * 0.1

    state = init_state()
    # warmup / compile
    state2, _ = run(state, blocks)
    jax.block_until_ready(state2)

    iters = 5
    t0 = time.perf_counter()
    st = state
    for _ in range(iters):
        st, stats = run(st, blocks)
    jax.block_until_ready(st)
    dt = time.perf_counter() - t0

    total_samples = iters * SCAN_BLOCKS * g
    sps = total_samples / dt
    baseline = 8e6   # reference real-time envelope (8 MS/s USRP ceiling)
    print(json.dumps({
        "metric": "mcrx_iq_throughput",
        "value": round(sps, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
