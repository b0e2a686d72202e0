"""packet_tx — fixed Frame64 TX to an IQ file.

CLI re-creation of /root/reference/src/packet_tx.cc: fixed 64-byte-payload
framegen64 bursts (:143-181), msresamp toward the hardware rate.
"""
from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from ..framing import flexframe as ff
from ..io.streams import write_iq
from ..ops import resamp as resamp_mod
from .common import parse_args

USAGE = """packet_tx -o out.iq [options]
  h : usage                     o : output IQ file (required)
  g : soft gain dB (-12)        N : number of frames (10)
  r : output resampling rate (2.0)
  s : RNG seed (42)
"""


def main(argv=None) -> int:
    flags, _ = parse_args(argv if argv is not None else sys.argv[1:],
                          "ho:g:N:r:s:")
    if "h" in flags:
        print(USAGE)
        return 0
    out = flags.get("o")
    if not out:
        print(USAGE)
        return 1
    gain = 10 ** (float(flags.get("g", -12.0)) / 20.0)
    num_frames = int(flags.get("N", 10))
    rate = float(flags.get("r", 2.0))
    rng = np.random.default_rng(int(flags.get("s", 42)))

    params = ff.make_flex_params()
    gap = np.zeros(300, np.complex64)
    chunks = [gap]
    for pid in range(num_frames):
        header = np.empty(8, np.uint8)
        header[0] = (pid >> 8) & 0xFF
        header[1] = pid & 0xFF
        header[2:] = rng.integers(0, 256, 6, dtype=np.uint8)
        payload = rng.integers(0, 256, ff.FRAME64_PAYLOAD, dtype=np.uint8)
        frame = np.asarray(ff.frame64_assemble(
            params, jnp.asarray(header), jnp.asarray(payload)))
        assert len(frame) == ff.FRAME64_LEN
        chunks.append(frame * gain)
        chunks.append(gap)
    baseband = np.concatenate(chunks)
    if rate != 1.0:
        ms = resamp_mod.msresamp_create(rate)
        st = resamp_mod.msresamp_state(ms)
        # decimation requires input divisible by the half-band factor
        div = 2 ** ms.num_halfband if not ms.is_interp else 1
        n = len(baseband) - len(baseband) % max(div, 1)
        st, y, valid, count = resamp_mod.msresamp_block(
            ms, st, jnp.asarray(baseband[:n]))
        baseband = np.asarray(y)[: int(count)]
    write_iq(out, baseband)
    print(f"packet_tx: wrote {num_frames} frame64 bursts "
          f"({len(baseband)} samples) to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
