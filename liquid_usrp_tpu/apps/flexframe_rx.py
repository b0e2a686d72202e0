"""flexframe_rx — single-carrier flexframe RX from an IQ file.

CLI re-creation of /root/reference/src/flexframe_rx.cc: input stream is
resampled back to 2 samples/symbol with msresamp (:179,240) and fed to the
synchronizer; reports the standard stats block (:260-272).
"""
from __future__ import annotations

import sys
import time

import jax.numpy as jnp
import numpy as np

from ..framing import flexframe as ff
from ..framing import flexframe_sync as ffs
from ..framing.payload import EXPANSION
from ..io.streams import read_iq
from ..ops import resamp as resamp_mod
from .common import (occupied_power, RxStats, apply_channel, iter_sync_results,
                     parse_args)

USAGE = """flexframe_rx -i in.iq [options]
  h : usage              i : input IQ file (required)
  r : input resampling rate applied (0.5 default; 1.0 = none)
  q : quiet
  e : decode budget (expansion), default 3 (TX prints the needed value)
  --conv/--soft : enable conv/RS FEC branches / soft-decision decode
  --snr/--cfo/--delay : virtual channel impairments
"""


def main(argv=None) -> int:
    flags, _ = parse_args(argv if argv is not None else sys.argv[1:],
                          "hi:r:p:e:q",
                          ["snr=", "cfo=", "delay=", "seed=",
                           "conv", "soft"])
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

    params = ff.make_flex_params()
    sync = ffs.make_flex_sync(params, block_size=8192,
                              max_payload=int(flags.get("p", 2048)),
                              max_frames=4,
                              enable_conv="conv" in flags,
                              soft="soft" in flags,
                              expansion=int(flags.get("e", EXPANSION)))
    step = ffs.make_flex_sync_step(sync)
    stats = RxStats()
    t0 = time.time()
    for res in iter_sync_results(
            step, ffs.flex_sync_init(sync), stream, sync.block_size,
            sync.overlap,
            batched_fn=lambda st, blks: ffs.flex_sync_blocks_batched(
                sync, st, blks)):
        for i in np.nonzero(np.asarray(res.detected))[0]:
            row = {"header_valid": bool(res.header_valid[i]),
                   "payload_valid": bool(res.payload_valid[i]),
                   "payload_len": int(res.payload_len[i])}
            stats.update(row)
            if verbose:
                hdr = np.asarray(res.header[i])
                pid = (int(hdr[0]) << 8) | int(hdr[1])
                print("  rx frame: pid=%5u, rssi=%6.1f dB, evm=%6.1f dB, "
                      "cfo=%8.5f, hdr:%s, pay:%s" %
                      (pid, float(res.rssi[i]), float(res.evm[i]),
                       float(res.cfo[i]),
                       "ok" if row["header_valid"] else "FAIL",
                       "ok" if row["payload_valid"] else "FAIL"))
    print("flexframe_rx results:")
    stats.report(time.time() - t0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
