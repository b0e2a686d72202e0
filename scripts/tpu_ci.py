"""On-TPU correctness lane: loopback decode asserts on the real chip.

The CPU test suite (336 tests) proves the math; this lane proves the same
decode paths on actual TPU hardware, where FFT/accumulation numerics can
diverge.  Seven lanes, all verification reductions computed ON DEVICE
(only scalars cross the flaky tunnel — ROUND2_NOTES):

  ofdm    : 3-frame OFDM flexframe loopback (AWGN + CFO) — payload-exact
  flex    : single-carrier flexframe loopback (AWGN + CFO) — payload-exact
  gmsk    : GMSK coherent-receiver loopback (AWGN + CFO) — payload-exact
  batched : sync_blocks_batched == scan-of-sync_block on chip (the
            production multi-block dispatch path)
  channels: sync_channels_batched == per-channel scan on chip (the flat
            decode batch behind every multichannel receiver)
  pallas  : fused Mosaic detect front-end (use_pallas=2) decodes the same
            frames payload-exact as the XLA path
  soft    : v27 channel-LLR Viterbi loopback — payload-exact on chip

Prints one JSON line {"ok": bool, "lanes": {...}, "device": str}.
Parent process retries fresh children through the session health gate
(the tunnel fails nondeterministically per session).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def _fingerprint_weights(n, seed=0xF1B5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 32, n, dtype=np.uint32)


def _expected_fp(payloads, weights, max_payload):
    acc = 0
    for p in payloads:
        pad = np.zeros(max_payload, np.uint32)
        pad[: len(p)] = p
        acc = (acc + int((pad * weights).astype(np.uint64).sum())) \
            & 0xFFFFFFFF
    return acc


def _host_c64(thunk):
    """Run a frame-assembly thunk and fetch the waveform as host numpy.

    Prefers the host-CPU backend; when the session refuses to register it
    ("Unknown backend cpu" — order/tunnel-state dependent), runs the
    assembly on the TPU and fetches through float planes
    (ops/iqfmt.py::device_get_c64) so complex never crosses the
    transport either way."""
    import jax
    from liquid_usrp_tpu.ops.iqfmt import device_get_c64
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            return np.asarray(thunk())
    return device_get_c64(thunk())


def _device_decode_fp(step, init_state, stream, bs, overlap, max_payload,
                      weights):
    """Scan the sync over ``stream`` on device; return (count, fp) scalars.

    The payload fingerprint is the order-independent weighted byte sum of
    every payload_valid row — computed on chip, fetched as two scalars.
    """
    import jax
    import jax.numpy as jnp
    flush = (overlap // bs + 2) * bs
    n_blocks = -(-len(stream) // bs) + flush // bs
    padded = np.zeros(n_blocks * bs, np.complex64)
    padded[: len(stream)] = stream
    # float-plane staging: complex64 transport has a tunnel failure mode
    from liquid_usrp_tpu.ops.iqfmt import device_put_c64
    blocks = device_put_c64(padded.reshape(n_blocks, bs))
    w = jnp.asarray(weights)

    @jax.jit
    def run(state, blocks):
        def body(st, b):
            st, res = step(st, b)
            ok = res.payload_valid
            row_fp = jnp.sum(res.payload.astype(jnp.uint32) * w[None, :],
                             axis=-1)
            return st, (jnp.sum(ok).astype(jnp.int32),
                        jnp.sum(jnp.where(ok, row_fp, 0)))
        _, (cnt, fp) = jax.lax.scan(body, state, blocks)
        return jnp.sum(cnt), jnp.sum(fp.astype(jnp.uint32))

    cnt, fp = run(init_state, blocks)
    return int(cnt), int(np.uint32(fp))


def lane_ofdm():
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    params = ofdm.make_ofdm_params(48, 6, 4)
    props = ofdm.default_props()
    sync = ofdm_sync.make_sync(params, block_size=8192, max_payload=256,
                               max_frames=4)
    step = ofdm_sync.make_sync_step(sync)
    rng = np.random.default_rng(10)
    payloads, bursts = [], []
    for _ in range(3):
        h = rng.integers(0, 256, 8, dtype=np.uint8)
        p = rng.integers(0, 256, 180, dtype=np.uint8)
        payloads.append(p)
        bursts.append(_host_c64(lambda: ofdm.assemble_frame(
            params, props, jnp.asarray(h), jnp.asarray(p))))
        bursts.append(np.zeros(2500, np.complex64))
    stream = np.concatenate(bursts)
    n = np.arange(len(stream))
    stream = (stream * np.exp(1j * 2e-4 * n)).astype(np.complex64)
    stream += (0.03 * (rng.normal(size=len(stream)) +
                       1j * rng.normal(size=len(stream)))
               ).astype(np.complex64)
    weights = _fingerprint_weights(sync.max_payload)
    cnt, fp = _device_decode_fp(step, ofdm_sync.sync_init(sync), stream,
                                sync.block_size, sync.overlap,
                                sync.max_payload, weights)
    exp = _expected_fp(payloads, weights, sync.max_payload)
    return cnt == 3 and fp == exp, f"decoded {cnt}/3 fp_ok={fp == exp}"


def lane_flex():
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import flexframe as ff
    from liquid_usrp_tpu.framing import flexframe_sync as ffs
    params = ff.make_flex_params(k=2, m=7, beta=0.3)
    sync = ffs.make_flex_sync(params, block_size=8192, max_payload=256,
                              max_frames=4)
    step = ffs.make_flex_sync_step(sync)
    rng = np.random.default_rng(11)
    payloads, bursts = [], []
    for _ in range(3):
        h = rng.integers(0, 256, ff.FLEX_HEADER_USER, dtype=np.uint8)
        p = rng.integers(0, 256, 150, dtype=np.uint8)
        payloads.append(p)
        bursts.append(_host_c64(lambda: ff.flex_assemble(
            params, ff.default_props(), jnp.asarray(h), jnp.asarray(p))))
        bursts.append(np.zeros(3000, np.complex64))
    stream = np.concatenate(bursts)
    n = np.arange(len(stream))
    stream = (stream * np.exp(1j * 1e-4 * n)).astype(np.complex64)
    stream += (0.02 * (rng.normal(size=len(stream)) +
                       1j * rng.normal(size=len(stream)))
               ).astype(np.complex64)
    weights = _fingerprint_weights(sync.max_payload)
    cnt, fp = _device_decode_fp(step, ffs.flex_sync_init(sync), stream,
                                sync.block_size, sync.overlap,
                                sync.max_payload, weights)
    exp = _expected_fp(payloads, weights, sync.max_payload)
    return cnt == 3 and fp == exp, f"decoded {cnt}/3 fp_ok={fp == exp}"


def lane_gmsk():
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import gmskframe as gf
    params = gf.make_gmsk_params(k=2, m=3, bt=0.5)
    sync = gf.make_gmsk_sync(params, block_size=8192, max_payload=256,
                             max_frames=4)
    step = gf.make_gmsk_sync_step(sync)
    rng = np.random.default_rng(12)
    payloads, bursts = [], []
    for _ in range(3):
        h = rng.integers(0, 256, 8, dtype=np.uint8)
        p = rng.integers(0, 256, 120, dtype=np.uint8)
        payloads.append(p)
        bursts.append(_host_c64(lambda: gf.gmsk_assemble(
            params, gf.gmsk_default_props(), jnp.asarray(h),
            jnp.asarray(p))))
        bursts.append(np.zeros(3000, np.complex64))
    stream = np.concatenate(bursts)
    n = np.arange(len(stream))
    stream = (stream * np.exp(1j * 1e-4 * n)).astype(np.complex64)
    stream += (0.02 * (rng.normal(size=len(stream)) +
                       1j * rng.normal(size=len(stream)))
               ).astype(np.complex64)
    weights = _fingerprint_weights(sync.max_payload)
    cnt, fp = _device_decode_fp(step, gf.gmsk_sync_init(sync), stream,
                                sync.block_size, sync.overlap,
                                sync.max_payload, weights)
    exp = _expected_fp(payloads, weights, sync.max_payload)
    return cnt == 3 and fp == exp, f"decoded {cnt}/3 fp_ok={fp == exp}"


def lane_batched():
    """sync_blocks_batched == scan of sync_block ON CHIP (all result
    fields reduced to a single device-side equality scalar)."""
    import jax
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    params = ofdm.make_ofdm_params(48, 6, 4)
    props = ofdm.default_props()
    sync = ofdm_sync.make_sync(params, block_size=8192, max_payload=256,
                               max_frames=4)
    rng = np.random.default_rng(13)
    n_blocks = 4                      # frames live in blocks 0-2; block 3
    stream = np.zeros(n_blocks * sync.block_size, np.complex64)   # drains
    pos = 900
    n_frames = 3
    for _ in range(n_frames):
        h = rng.integers(0, 256, 8, dtype=np.uint8)
        p = rng.integers(0, 256, 200, dtype=np.uint8)
        w = _host_c64(lambda: ofdm.assemble_frame(
            params, props, jnp.asarray(h), jnp.asarray(p)))
        stream[pos: pos + len(w)] = w
        pos += len(w) + 1200
    assert pos <= 3 * sync.block_size, "frames must fit with drain margin"
    stream += (0.02 * (rng.normal(size=len(stream)) +
                       1j * rng.normal(size=len(stream)))
               ).astype(np.complex64)
    from liquid_usrp_tpu.ops.iqfmt import device_put_c64
    blocks = device_put_c64(stream.reshape(n_blocks, sync.block_size))

    @jax.jit
    def both(state, blocks):
        def body(st, b):
            st, res = ofdm_sync.sync_block(sync, st, b)
            return st, res
        _, r_seq = jax.lax.scan(body, state, blocks)
        _, r_bat = ofdm_sync.sync_blocks_batched(sync, state, blocks)
        # compare detected rows only: the sequential path gates decode per
        # block (skip -> zeros) while the batched path gates across the
        # whole chunk, so only masked rows are defined to match
        eq = jnp.all(r_seq.detected == r_bat.detected)
        mask = r_seq.detected
        for a, b in zip(r_seq, r_bat):
            m = mask
            while m.ndim < a.ndim:
                m = m[..., None]
            if jnp.issubdtype(a.dtype, jnp.floating):
                eq &= jnp.all(jnp.where(m, jnp.abs(a - b), 0.0) < 1e-4)
            else:
                eq &= jnp.all(jnp.where(m, a == b, True))
        n_valid = jnp.sum(r_bat.payload_valid)
        return eq, n_valid

    eq, n_valid = both(ofdm_sync.sync_init(sync), blocks)
    return bool(eq) and int(n_valid) == n_frames, \
        f"equal={bool(eq)} valid={int(n_valid)}/{n_frames}"


def lane_pallas():
    """The fused Mosaic detect front-end (use_pallas=2) decodes the same
    frames payload-exact as the XLA path (compiled Mosaic on TPU,
    interpret mode elsewhere).  Decode outcomes are compared — not raw
    candidate offsets, which may sit a few samples apart on a detection
    plateau (float32 accumulation order; fine timing absorbs it)."""
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    params = ofdm.make_ofdm_params(48, 6, 4)
    props = ofdm.default_props()
    rng = np.random.default_rng(14)
    payloads, bursts = [], []
    for _ in range(3):
        h = rng.integers(0, 256, 8, dtype=np.uint8)
        p = rng.integers(0, 256, 180, dtype=np.uint8)
        payloads.append(p)
        bursts.append(_host_c64(lambda: ofdm.assemble_frame(
            params, props, jnp.asarray(h), jnp.asarray(p))))
        bursts.append(np.zeros(2500, np.complex64))
    stream = np.concatenate(bursts)
    n = np.arange(len(stream))
    stream = (stream * np.exp(1j * 2e-4 * n)).astype(np.complex64)
    stream += (0.03 * (rng.normal(size=len(stream)) +
                       1j * rng.normal(size=len(stream)))
               ).astype(np.complex64)
    details = []
    ok = True
    for up in (0, 2):
        sync = ofdm_sync.make_sync(params, block_size=8192,
                                   max_payload=256, max_frames=4,
                                   use_pallas=up)
        step = ofdm_sync.make_sync_step(sync)
        weights = _fingerprint_weights(sync.max_payload)
        cnt, fp = _device_decode_fp(step, ofdm_sync.sync_init(sync),
                                    stream, sync.block_size, sync.overlap,
                                    sync.max_payload, weights)
        exp = _expected_fp(payloads, weights, sync.max_payload)
        ok &= cnt == 3 and fp == exp
        details.append(f"up={up}: {cnt}/3 fp_ok={fp == exp}")
    return ok, "; ".join(details)


def lane_soft():
    """Soft-LLR conv decode on chip: v27 payloads decode payload-exact
    through the channel-LLR Viterbi branch (enable_conv + soft; LLRs
    reach the inner decoder because fec1=none)."""
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    from liquid_usrp_tpu.ops import crc as crc_mod
    from liquid_usrp_tpu.ops import fec as fec_mod
    from liquid_usrp_tpu.ops import modem as modem_mod
    params = ofdm.make_ofdm_params(48, 6, 4)
    props = ofdm.FrameProps(check=crc_mod.CRC_32,
                            fec0=fec_mod.FEC_CONV_V27,
                            fec1=fec_mod.FEC_NONE,
                            mod=modem_mod.MOD_QPSK)
    sync = ofdm_sync.make_sync(params, block_size=8192, max_payload=128,
                               max_frames=4, enable_conv=True, soft=True)
    step = ofdm_sync.make_sync_step(sync)
    rng = np.random.default_rng(15)
    payloads, bursts = [], []
    for _ in range(3):
        h = rng.integers(0, 256, 8, dtype=np.uint8)
        p = rng.integers(0, 256, 100, dtype=np.uint8)
        payloads.append(p)
        bursts.append(_host_c64(lambda: ofdm.assemble_frame(
            params, props, jnp.asarray(h), jnp.asarray(p))))
        bursts.append(np.zeros(2500, np.complex64))
    stream = np.concatenate(bursts)
    stream += (0.05 * (rng.normal(size=len(stream)) +
                       1j * rng.normal(size=len(stream)))
               ).astype(np.complex64)
    weights = _fingerprint_weights(sync.max_payload)
    cnt, fp = _device_decode_fp(step, ofdm_sync.sync_init(sync), stream,
                                sync.block_size, sync.overlap,
                                sync.max_payload, weights)
    exp = _expected_fp(payloads, weights, sync.max_payload)
    return cnt == 3 and fp == exp, f"decoded {cnt}/3 fp_ok={fp == exp}"


def lane_channels():
    """sync_channels_batched == per-channel scan of sync_block ON CHIP
    (the flat channels x blocks x candidates decode batch behind one
    global gate that backs every multichannel receiver since round 3)."""
    import jax
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    params = ofdm.make_ofdm_params(48, 6, 4)
    props = ofdm.default_props()
    sync = ofdm_sync.make_sync(params, block_size=8192, max_payload=256,
                               max_frames=4)
    rng = np.random.default_rng(15)
    N, n_blocks = 3, 2
    chans = np.zeros((N, n_blocks * sync.block_size), np.complex64)
    n_frames = 0
    for ch in range(N):
        h = rng.integers(0, 256, 8, dtype=np.uint8)
        p = rng.integers(0, 256, 150, dtype=np.uint8)
        w = _host_c64(lambda: ofdm.assemble_frame(
            params, props, jnp.asarray(h), jnp.asarray(p)))
        pos = 700 + 900 * ch
        chans[ch, pos: pos + len(w)] = w
        n_frames += 1
    chans += (0.02 * (rng.normal(size=chans.shape) +
                      1j * rng.normal(size=chans.shape))
              ).astype(np.complex64)
    from liquid_usrp_tpu.ops.iqfmt import device_put_c64
    blocks = device_put_c64(
        chans.reshape(N, n_blocks, sync.block_size))

    @jax.jit
    def both(blocks):
        one = ofdm_sync.sync_init(sync)
        states = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (N,) + x.shape), one)
        _, r_bat = ofdm_sync.sync_channels_batched(sync, states, blocks)

        def per_channel(bl):
            def body(st, b):
                st, res = ofdm_sync.sync_block(sync, st, b)
                return st, res
            _, r = jax.lax.scan(body, one, bl)
            return r
        r_seq = jax.vmap(per_channel)(blocks)
        eq = jnp.all(r_seq.detected == r_bat.detected)
        mask = r_seq.detected
        for a, b in zip(r_seq, r_bat):
            m = mask
            while m.ndim < a.ndim:
                m = m[..., None]
            if jnp.issubdtype(a.dtype, jnp.floating):
                eq &= jnp.all(jnp.where(m, jnp.abs(a - b), 0.0) < 1e-4)
            else:
                eq &= jnp.all(jnp.where(m, a == b, True))
        return eq, jnp.sum(r_bat.payload_valid)

    eq, n_valid = both(blocks)
    return bool(eq) and int(n_valid) == n_frames, \
        f"equal={bool(eq)} valid={int(n_valid)}/{n_frames}"


def _healthy(timeout_s: float = 150.0) -> bool:
    """Shared tunnel-session gate (liquid_usrp_tpu/utils/tpu_session.py)."""
    from liquid_usrp_tpu.utils.tpu_session import session_healthy
    return session_healthy(timeout_s)


LANES = {"ofdm": lane_ofdm, "flex": lane_flex, "gmsk": lane_gmsk,
         "batched": lane_batched, "channels": lane_channels,
         "pallas": lane_pallas, "soft": lane_soft}


def _child() -> int:
    if not _healthy():
        os._exit(3)
    import jax
    device = jax.devices()[0].device_kind
    lanes = {}
    ok = True
    for name, fn in LANES.items():
        t0 = time.time()
        try:
            passed, detail = fn()
        except Exception as e:  # noqa: BLE001 — lane isolation
            passed, detail = False, f"{type(e).__name__}: {str(e)[:120]}"
        lanes[name] = {"ok": passed, "detail": detail,
                       "seconds": round(time.time() - t0, 1)}
        ok &= passed
        print(f"  lane {name:8s}: {'PASS' if passed else 'FAIL'} "
              f"({detail})", file=sys.stderr, flush=True)
    print(json.dumps({"ok": ok, "lanes": lanes, "device": device}))
    return 0 if ok else 1


def main() -> int:
    if os.environ.get("_TPUCI_CHILD"):
        return _child()
    for i in range(8):
        env = dict(os.environ, _TPUCI_CHILD="1")
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=1500)
        except subprocess.TimeoutExpired:
            print(f"attempt {i}: timeout", file=sys.stderr, flush=True)
            continue
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return 0 if json.loads(line)["ok"] else 1
        print(f"attempt {i}: rc={out.returncode} err={out.stderr[-200:]}",
              file=sys.stderr, flush=True)
        time.sleep(10 if out.returncode == 3 else 20)
    print(json.dumps({"ok": False, "lanes": {}, "device": "unavailable"}))
    return 1


if __name__ == "__main__":
    sys.exit(main())
