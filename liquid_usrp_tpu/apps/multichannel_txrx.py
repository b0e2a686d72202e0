"""multichannel_txrx — ping-pong burst TDD exerciser over a virtual air.

CLI re-creation of /root/reference/src/multichannel_txrx.cc (behavior
documented in its header comment :20-43): TX bursts of random-length
packets on all channels (:242), drain (``wait_for_tx_to_complete`` :255),
then listen, looping for ``-R`` rounds (the reference's 0.25 s TX / 2.5 s RX
/ 30 s schedule, :135-137, becomes round-based in file time).
"""
from __future__ import annotations

import sys

import numpy as np

from ..models.multichannel import MultichannelTxRx
from .common import RxStats, apply_channel, parse_args

USAGE = """multichannel_txrx [options]
  h : usage                     n : number of channels (2)
  R : TDD rounds (2)            P : max payload bytes (200)
  M : subcarriers (48)          C : cyclic prefix (6)
  q : quiet
  --snr/--cfo : virtual air impairments
"""


def main(argv=None) -> int:
    flags, _ = parse_args(argv if argv is not None else sys.argv[1:],
                          "hn:R:P:M:C:q")
    if "h" in flags:
        print(USAGE)
        return 0
    N = int(flags.get("n", 2))
    rounds = int(flags.get("R", 2))
    P = int(flags.get("P", 200))
    M = int(flags.get("M", 48))
    cp = int(flags.get("C", 6))
    verbose = "q" not in flags
    rng = np.random.default_rng(7)

    txrx = MultichannelTxRx(N, M=M, cp_len=cp, taper_len=min(4, cp),
                            block_size=4096, max_payload=1024)
    stats = RxStats()
    pid = 0
    for rd in range(rounds):
        # TX burst: one random-length packet per channel (reference :242)
        sent = []
        for ch in range(N):
            header = np.empty(8, np.uint8)
            header[0] = (pid >> 8) & 0xFF
            header[1] = pid & 0xFF
            header[2] = ch
            header[3:] = rng.integers(0, 256, 5, dtype=np.uint8)
            plen = int(rng.integers(1, P + 1))
            payload = rng.integers(0, 256, plen, dtype=np.uint8)
            assert txrx.transmit_packet(ch, header, payload)
            sent.append((ch, pid, payload))
            pid += 1
        air = txrx.wait_for_tx_to_complete()
        air = apply_channel(air, flags, seed=rd,
                            signal_power=float(
                                np.mean(np.abs(air) ** 2)) or 1.0)
        # RX listen: loop the burst back through our own receiver
        frames = txrx.rx.execute(air) + txrx.rx.flush()
        for f in frames:
            stats.update(f)
            if verbose:
                hdr = f["header"]
                print("  round %d rx ch %2d: pid=%5u pay:%s len=%d" %
                      (rd, f["channel"],
                       (int(hdr[0]) << 8) | int(hdr[1]),
                       "ok" if f["payload_valid"] else "FAIL",
                       f["payload_len"]))
    print("multichannel_txrx results:")
    stats.report(float(rounds))
    return 0


if __name__ == "__main__":
    sys.exit(main())
