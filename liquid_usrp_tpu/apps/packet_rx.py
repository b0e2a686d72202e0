"""packet_rx — fixed Frame64 RX from an IQ file.

CLI re-creation of /root/reference/src/packet_rx.cc (framesync64 RX,
:190-243).  Shares the flexframe synchronizer engine but enforces the
Frame64 contract the way ``framesync64`` does structurally: a decoded
frame only counts when its header advertises exactly the fixed Frame64
properties (64-byte payload, CRC32, Golay(24,12), QPSK) — anything else
is reported as a foreign frame.
"""
from __future__ import annotations

import sys
import time

import jax.numpy as jnp
import numpy as np

from ..framing import flexframe as ff
from ..framing import flexframe_sync as ffs
from ..io.streams import read_iq
from ..ops import resamp as resamp_mod
from .common import (occupied_power, RxStats, apply_channel, iter_sync_results,
                     parse_args)

USAGE = """packet_rx -i in.iq [options]
  h : usage              i : input IQ file (required)
  r : input resampling rate applied (0.5 default; 1.0 = none)
  q : quiet
  --snr/--cfo/--delay : virtual channel impairments
"""


def main(argv=None) -> int:
    flags, _ = parse_args(argv if argv is not None else sys.argv[1:],
                          "hi:r:q")
    if "h" in flags:
        print(USAGE)
        return 0
    path = flags.get("i")
    if not path:
        print(USAGE)
        return 1
    rate = float(flags.get("r", 0.5))
    verbose = "q" not in flags

    stream = read_iq(path)
    stream = apply_channel(
        stream, flags,
        signal_power=occupied_power(stream))
    if rate != 1.0:
        ms = resamp_mod.msresamp_create(rate)
        st = resamp_mod.msresamp_state(ms)
        div = 2 ** ms.num_halfband if not ms.is_interp else 1
        n = len(stream) - len(stream) % max(div, 1)
        st, y, valid, count = resamp_mod.msresamp_block(
            ms, st, jnp.asarray(stream[:n]))
        stream = np.asarray(y)[: int(count)]

    f64 = ff.frame64_props()
    params = ff.make_flex_params()
    sync = ffs.make_flex_sync(params, block_size=8192,
                              max_payload=ff.FRAME64_PAYLOAD,
                              max_frames=4,
                              header_user=ff.FRAME64_HEADER_USER)
    step = ffs.make_flex_sync_step(sync)
    stats = RxStats()
    foreign = 0
    t0 = time.time()
    for res in iter_sync_results(
            step, ffs.flex_sync_init(sync), stream, sync.block_size,
            sync.overlap,
            batched_fn=lambda st, blks: ffs.flex_sync_blocks_batched(
                sync, st, blks)):
        for i in np.nonzero(np.asarray(res.detected))[0]:
            hv = bool(res.header_valid[i])
            # Frame64 contract: the fixed format admits exactly one
            # payload length and coding (framesync64 parity)
            is_f64 = (hv and int(res.payload_len[i]) == ff.FRAME64_PAYLOAD
                      and int(res.mod[i]) == f64.mod
                      and int(res.fec0[i]) == f64.fec0
                      and int(res.fec1[i]) == f64.fec1
                      and int(res.check[i]) == f64.check)
            if hv and not is_f64:
                foreign += 1
                if verbose:
                    print("  rx non-frame64 burst ignored (len=%d)" %
                          int(res.payload_len[i]))
                continue
            row = {"header_valid": hv,
                   "payload_valid": bool(res.payload_valid[i]),
                   "payload_len": int(res.payload_len[i])}
            stats.update(row)
            if verbose:
                hdr = np.asarray(res.header[i])
                pid = (int(hdr[0]) << 8) | int(hdr[1])
                print("  rx frame64: pid=%5u, rssi=%6.1f dB, evm=%6.1f dB, "
                      "cfo=%8.5f, hdr:%s, pay:%s" %
                      (pid, float(res.rssi[i]), float(res.evm[i]),
                       float(res.cfo[i]),
                       "ok" if row["header_valid"] else "FAIL",
                       "ok" if row["payload_valid"] else "FAIL"))
    print("packet_rx results:")
    stats.report(time.time() - t0)
    if foreign:
        print("    non-frame64 bursts  : %6u" % foreign)
    return 0


if __name__ == "__main__":
    sys.exit(main())
