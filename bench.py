"""Benchmark: channelizer + OFDM demod IQ throughput per chip.

Measures the flagship RX pipeline on whatever backend JAX provides (one
real TPU chip under the driver).  This is the BASELINE.json headline
metric: IQ samples/s/chip for channelizer + OFDM demod.

``vs_baseline`` compares against 8 MS/s — the reference system's maximum
real-time operating envelope (USRP single-carrier bandwidth ceiling,
/root/reference/src/flexframe_tx.cc:37 "8MHz max"; its CPU implementation
exists to keep up with that hardware rate).

Robustness: the TPU tunnel backend in this image fails nondeterministically
per process session, so the measurement runs in child subprocesses with
retries and a fallback pipeline (full multichannel RX -> single-channel
OFDM sync).  Prints exactly one JSON line on stdout.
"""
import json
import os
import subprocess
import sys
import time

BASELINE_SPS = 8e6   # reference real-time envelope (8 MS/s USRP ceiling)


def _bench_mcrx(block_size=32768, max_frames=16, scan=2):
    """Full pipeline: NCO -> 2N-bin PFB -> vmapped N-channel OFDM sync."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    from liquid_usrp_tpu.models.multichannel import make_mcrx_step

    N = 4
    params = ofdm.make_ofdm_params(M=48, cp_len=6, taper_len=4)
    # large blocks amortize the per-block fixed cost (measured: 8k->32k
    # block size alone moves a single stream from ~28 to ~70 MS/s)
    sync = ofdm_sync.make_sync(params, block_size=block_size,
                               max_payload=512, max_frames=max_frames)
    init_state, step = make_mcrx_step(N, params, sync)
    g = 2 * N * sync.block_size
    SCAN = scan

    @jax.jit
    def run(state, blocks):
        def body(st, x):
            st, res = step(st, x)
            return st, (jnp.sum(res.detected), jnp.sum(res.payload_valid))
        return jax.lax.scan(body, state, blocks)

    # fully-loaded input: every channel carries back-to-back frames plus
    # noise, so the measurement includes the complete detect+decode load
    # (noise-only input would let the lax.cond decode gate idle the chip).
    # Generated on the host CPU backend — TX generation is setup, not the
    # thing being measured.
    from liquid_usrp_tpu.models.multichannel import MultichannelTx
    rng = np.random.default_rng(0)
    with jax.default_device(jax.devices("cpu")[0]):
        tx = MultichannelTx(N, M=48, cp_len=6, taper_len=4)
        mix = []
        produced = 0
        while produced < SCAN * g:
            for ch in range(N):
                if tx.is_channel_ready(ch):
                    tx.update_data(
                        ch, rng.integers(0, 256, 8, dtype=np.uint8),
                        rng.integers(0, 256, 400, dtype=np.uint8))
            chunk = tx.generate_samples(2048)
            mix.append(chunk)
            produced += len(chunk)
    mixture = np.concatenate(mix)[: SCAN * g]
    noise = (rng.normal(size=mixture.shape) +
             1j * rng.normal(size=mixture.shape)).astype(np.complex64)
    blocks = jnp.asarray((mixture + 0.01 * noise).reshape(SCAN, g))
    state = init_state()
    s2, _ = run(state, blocks)
    jax.block_until_ready(s2)
    iters = 5
    best = float("inf")
    st = state
    for _ in range(3):               # best-of-3 (tunnel transport jitter)
        t0 = time.perf_counter()
        for _ in range(iters):
            st, stats = run(st, blocks)
        jax.block_until_ready(st)
        best = min(best, time.perf_counter() - t0)
    return "mcrx_iq_throughput", iters * SCAN * g / best


def _bench_sync():
    """Fallback: single-channel OFDM flexframe synchronizer throughput."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync

    params = ofdm.make_ofdm_params(M=48, cp_len=6, taper_len=4)
    sync = ofdm_sync.make_sync(params, block_size=32768, max_payload=512,
                               max_frames=16)
    SCAN = 4

    @jax.jit
    def run(state, blocks):
        def body(st, b):
            st, res = ofdm_sync.sync_block(sync, st, b)
            return st, jnp.sum(res.detected)
        return jax.lax.scan(body, state, blocks)

    rng = np.random.default_rng(0)
    blocks = jnp.asarray(
        (rng.normal(size=(SCAN, sync.block_size)) +
         1j * rng.normal(size=(SCAN, sync.block_size)))
        .astype(np.complex64) * 0.1)
    state = ofdm_sync.sync_init(sync)
    s2, _ = run(state, blocks)
    jax.block_until_ready(s2)
    iters = 5
    best = float("inf")
    st = state
    for _ in range(3):               # best-of-3 (tunnel transport jitter)
        t0 = time.perf_counter()
        for _ in range(iters):
            st, _ = run(st, blocks)
        jax.block_until_ready(st)
        best = min(best, time.perf_counter() - t0)
    return "ofdm_sync_iq_throughput", iters * SCAN * sync.block_size / best


def _child(which: str) -> int:
    fn = {
        "mcrx_xl": lambda: _bench_mcrx(131072, 48, 1),
        "mcrx": _bench_mcrx,
        "sync": _bench_sync,
    }[which]
    metric, sps = fn()
    print(json.dumps({
        "metric": metric,
        "value": round(sps, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps / BASELINE_SPS, 3),
    }))
    return 0


def main() -> int:
    if os.environ.get("_BENCH_CHILD"):
        return _child(os.environ["_BENCH_CHILD"])
    # parent: try pipelines in order, fresh subprocess per attempt (the TPU
    # tunnel backend is flaky per session)
    attempts = [("mcrx_xl", 2), ("mcrx", 1), ("sync", 2)]
    for which, tries in attempts:
        for i in range(tries):
            env = dict(os.environ, _BENCH_CHILD=which)
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env, capture_output=True, text=True, timeout=900)
            except subprocess.TimeoutExpired:
                continue
            for line in out.stdout.splitlines():
                line = line.strip()
                if line.startswith("{") and '"metric"' in line:
                    print(line)
                    return 0
    print(json.dumps({"metric": "mcrx_iq_throughput", "value": 0.0,
                      "unit": "samples/s/chip", "vs_baseline": 0.0}))
    return 1


if __name__ == "__main__":
    sys.exit(main())
