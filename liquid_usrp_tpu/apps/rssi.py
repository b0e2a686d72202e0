"""rssi — receive-power meter over an IQ file.

CLI re-creation of /root/reference/src/rssi.cc: AGC tracking (bandwidth
0.01, :115-116), periodic RSSI printout (:200-203), ring-logged rssi/IQ and
an executable octave plot script dump on exit (:217-247).
"""
from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from ..io.streams import read_iq
from ..ops import agc as agc_mod
from ..ops import window as window_mod
from .common import apply_channel, apply_msresamp, parse_args

USAGE = """rssi -i in.iq [options]
  h : usage              i : input IQ file (required)
  b : AGC bandwidth (0.01)
  r : msresamp rate before the AGC (1.0 = off; reference rssi.cc:112)
  L : print interval in samples (10000)
  o : octave dump file (optional, e.g. rssi_log.m)
"""


def main(argv=None) -> int:
    flags, _ = parse_args(argv if argv is not None else sys.argv[1:],
                          "hi:b:r:L:o:")
    if "h" in flags:
        print(USAGE)
        return 0
    path = flags.get("i")
    if not path:
        print(USAGE)
        return 1
    bw = float(flags.get("b", 0.01))
    interval = int(flags.get("L", 10000))
    dump = flags.get("o")

    stream = read_iq(path)
    stream = apply_channel(stream, flags)
    stream = apply_msresamp(stream, float(flags.get("r", 1.0)))
    state = agc_mod.agc_init(bandwidth=bw)
    rssi_log = window_mod.ring_init(1024, dtype=jnp.float32)
    iq_log = window_mod.ring_init(1024)
    printed = 0
    did_print = False
    block = 4096
    # zero-pad to a whole block: the tail (or a sub-block file) must
    # still be measured, not silently dropped.  Prints and logs stay
    # clamped to the real samples — measuring the padding would report
    # a meaningless -200 dB floor.
    orig_len = len(stream)
    if orig_len % block:
        stream = np.concatenate(
            [stream, np.zeros(block - orig_len % block, np.complex64)])
    last = max(orig_len - 1, 0)
    for i in range(0, len(stream) - block + 1, block):
        x = jnp.asarray(stream[i:i + block])
        state, y, level, rssi = agc_mod.agc_block(state, x)
        n_real = min(block, orig_len - i)
        if n_real > 0:
            rssi_log = window_mod.ring_push(rssi_log, rssi[:n_real:16])
            iq_log = window_mod.ring_push(iq_log, x[:n_real:16])
        while printed + interval <= i + block:
            printed += interval
            j = printed - i - 1
            if 0 <= j < min(block, orig_len - i):
                print("  rssi = %8.2f dB" % float(rssi[j]))
                did_print = True
    if not did_print and orig_len > 0:
        # file shorter than one print interval: report the level at the
        # last real sample once (rssi still holds the final block)
        print("  rssi = %8.2f dB" % float(rssi[last - (len(stream) -
                                                       block)]))
    if dump:
        r = np.asarray(window_mod.ring_read(rssi_log))
        q = np.asarray(window_mod.ring_read(iq_log))
        with open(dump, "w") as f:
            f.write("%% auto-generated rssi log (octave)\nclear all;\n")
            f.write("rssi = [" + " ".join("%.3f" % v for v in r) + "];\n")
            f.write("x = [" + " ".join(
                "(%.5f+%.5fj)" % (v.real, v.imag) for v in q) + "];\n")
            f.write("figure; plot(rssi); ylabel('RSSI [dB]');\n")
        print(f"octave log written to {dump}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
