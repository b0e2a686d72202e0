"""BER/PER-vs-SNR sweep harness.

The quantitative version of the reference's loopback-pair validation
(SURVEY.md §4): TX chain -> AWGN/CFO channel -> RX chain at each SNR,
reporting frame-detection rate, header error rate, packet error rate and
residual payload BER.  Usable for any of the three frame families.

Usage:
  python scripts/ber_sweep.py [ofdm|flex|gmsk] [--snrs 0,2,...,20]
          [--frames 20] [--payload 200] [--json out.json]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # this image's sitecustomize pins a TPU backend; honor an explicit
    # cpu request by overriding the live config too
    import jax
    jax.config.update("jax_platforms", "cpu")


def run_sweep(family: str, snrs, n_frames: int, payload_len: int,
              cfo: float = 0.001, seed: int = 0):
    import jax
    import jax.numpy as jnp
    from liquid_usrp_tpu.io import channel_model as chan

    if family == "ofdm":
        from liquid_usrp_tpu.framing import ofdm, ofdm_sync
        params = ofdm.make_ofdm_params(48, 6, 4)
        props = ofdm.default_props()
        sync = ofdm_sync.make_sync(params, block_size=8192,
                                   max_payload=max(payload_len, 64),
                                   max_frames=4)
        step = ofdm_sync.make_sync_step(sync)
        init = lambda: ofdm_sync.sync_init(sync)
        assemble = lambda h, p: ofdm.assemble_frame(
            params, props, jnp.asarray(h), jnp.asarray(p))
    elif family == "flex":
        from liquid_usrp_tpu.framing import flexframe as ff
        from liquid_usrp_tpu.framing import flexframe_sync as ffs
        params = ff.make_flex_params()
        props = ff.default_props()
        sync = ffs.make_flex_sync(params, block_size=8192,
                                  max_payload=max(payload_len, 64),
                                  max_frames=4)
        step = ffs.make_flex_sync_step(sync)
        init = lambda: ffs.flex_sync_init(sync)
        assemble = lambda h, p: ff.flex_assemble(
            params, props, jnp.asarray(h), jnp.asarray(p))
    elif family == "gmsk":
        from liquid_usrp_tpu.framing import gmskframe as gf
        params = gf.make_gmsk_params()
        props = gf.gmsk_default_props()
        sync = gf.make_gmsk_sync(params, block_size=8192,
                                 max_payload=max(payload_len, 64),
                                 max_frames=4)
        step = gf.make_gmsk_sync_step(sync)
        init = lambda: gf.gmsk_sync_init(sync)
        assemble = lambda h, p: gf.gmsk_assemble(
            params, props, jnp.asarray(h), jnp.asarray(p))
    else:
        raise ValueError(family)

    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, payload_len, dtype=np.uint8)
                for _ in range(n_frames)]
    headers = [rng.integers(0, 256, 8, dtype=np.uint8)
               for _ in range(n_frames)]
    frames = [np.asarray(assemble(h, p))
              for h, p in zip(headers, payloads)]
    gap = 600
    stream = np.zeros(sum(len(f) + gap for f in frames) + gap,
                      np.complex64)
    positions = []
    pos = gap
    for f in frames:
        stream[pos:pos + len(f)] = f
        positions.append(pos)
        pos += len(f) + gap
    sig_pwr = float(np.mean(np.abs(stream) ** 2))

    bs = sync.block_size
    flush = int(np.ceil(sync.overlap / bs)) + 1
    total = (-(-len(stream) // bs) + flush) * bs

    results = []
    for snr in snrs:
        ch = chan.Channel(snr_db=float(snr), cfo=cfo)
        noisy = np.asarray(chan.channel_apply(
            ch, jax.random.PRNGKey(int(snr * 10) + 1),
            jnp.asarray(stream), signal_power=sig_pwr))
        noisy = np.concatenate(
            [noisy, np.zeros(total - len(noisy), np.complex64)])
        state = init()
        det, hok, pok, bit_errs, bits_tot = 0, 0, 0, 0, 0
        got = {}
        for b in range(total // bs):
            state, res = step(state, jnp.asarray(noisy[b * bs:(b + 1) * bs]))
            d = np.asarray(res.detected)
            for i in np.nonzero(d)[0]:
                det += 1
                if bool(res.header_valid[i]):
                    hok += 1
                if bool(res.payload_valid[i]):
                    pok += 1
                t = int(res.t_start[i])
                # match to the nearest transmitted frame for BER
                j = int(np.argmin([abs(t - p) for p in positions]))
                if abs(t - positions[j]) < 50:
                    dec = np.asarray(res.payload[i])[:payload_len]
                    if len(dec) == payload_len:
                        bit_errs += int(np.unpackbits(
                            dec ^ payloads[j]).sum())
                        bits_tot += payload_len * 8
                        got[j] = True
        results.append({
            "snr_db": float(snr),
            "frames_sent": n_frames,
            "frames_detected": det,
            "header_errors": det - hok,
            "packet_error_rate": 1.0 - pok / n_frames,
            "payload_ber": (bit_errs / bits_tot) if bits_tot else 1.0,
        })
        print("snr %5.1f dB: det %3d/%3d  hdr_ok %3d  PER %.3f  BER %.2e" %
              (snr, det, n_frames, hok,
               results[-1]["packet_error_rate"], results[-1]["payload_ber"]))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("family", choices=["ofdm", "flex", "gmsk"])
    ap.add_argument("--snrs", default="4,8,12,16,20,25")
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--payload", type=int, default=200)
    ap.add_argument("--cfo", type=float, default=0.001)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    snrs = [float(s) for s in args.snrs.split(",")]
    res = run_sweep(args.family, snrs, args.frames, args.payload, args.cfo)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(res, f, indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
