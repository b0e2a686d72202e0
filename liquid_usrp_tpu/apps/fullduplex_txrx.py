"""fullduplex_txrx — simultaneous TX + RX over a virtual air.

CLI re-creation of /root/reference/src/fullduplex_txrx.cc: two OFDM
endpoints stream frames at each other concurrently (the reference offsets
RX by +100 MHz, :71; here the duplex separation is the two independent
virtual-air directions, with ``-R`` swapping roles preserved as a no-op for
symmetry).
"""
from __future__ import annotations

import sys

import numpy as np

from ..models.ofdmtxrx import OfdmTxRx
from .common import RxStats, apply_channel, parse_args

USAGE = """fullduplex_txrx [options]
  h : usage                     N : frames each direction (5)
  P : payload bytes (800)       M : subcarriers (48)
  C : cyclic prefix (6)         q : quiet
  --snr/--cfo : virtual air impairments
"""


def main(argv=None) -> int:
    flags, _ = parse_args(argv if argv is not None else sys.argv[1:],
                          "hN:P:M:C:Rq")
    if "h" in flags:
        print(USAGE)
        return 0
    num_frames = int(flags.get("N", 5))
    P = int(flags.get("P", 800))
    M = int(flags.get("M", 48))
    cp = int(flags.get("C", 6))
    verbose = "q" not in flags
    rng = np.random.default_rng(13)

    a = OfdmTxRx(M=M, cp_len=cp, taper_len=min(4, cp), max_payload=2048)
    b = OfdmTxRx(M=M, cp_len=cp, taper_len=min(4, cp), max_payload=2048)
    a.start_rx()
    b.start_rx()
    stats_ab, stats_ba = RxStats(), RxStats()

    for pid in range(num_frames):
        for src, dst, stats, seed in ((a, b, stats_ab, 0),
                                      (b, a, stats_ba, 1)):
            header = np.empty(8, np.uint8)
            header[0] = (pid >> 8) & 0xFF
            header[1] = pid & 0xFF
            header[2:] = rng.integers(0, 256, 6, dtype=np.uint8)
            payload = rng.integers(0, 256, P, dtype=np.uint8)
            air = src.transmit_packet(header, payload)
            src.drain_tx()
            air = apply_channel(air, flags, seed=pid * 2 + seed,
                                signal_power=float(
                                    np.mean(np.abs(air) ** 2)) or 1.0)
            for f in dst.run_rx(air, flush=True):
                stats.update(f)
                if verbose:
                    print("  %s->%s pid=%5u pay:%s" %
                          ("a" if src is a else "b",
                           "b" if dst is b else "a",
                           (int(f["header"][0]) << 8) | int(f["header"][1]),
                           "ok" if f["payload_valid"] else "FAIL"))
    print("fullduplex_txrx results (a->b):")
    stats_ab.report(float(num_frames))
    print("fullduplex_txrx results (b->a):")
    stats_ba.report(float(num_frames))
    return 0


if __name__ == "__main__":
    sys.exit(main())
