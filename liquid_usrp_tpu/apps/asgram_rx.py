"""asgram_rx — ASCII spectrogram (FFT waterfall) over an IQ file.

CLI re-creation of /root/reference/src/asgram_rx.cc: nfft=64 default,
-65 dB offset, 5 dB/char scale (:70-74), rows printed with peak value and
frequency annotation (:213-224).
"""
from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from ..io.streams import read_iq
from ..ops import spectrum as spec_mod
from .common import apply_channel, apply_msresamp, parse_args

USAGE = """asgram_rx -i in.iq [options]
  h : usage              i : input IQ file (required)
  n : FFT size (64)      L : rows to print (20)
  o : dB offset (-65)    S : dB per character (5)
  r : msresamp rate before the FFT (1.0 = off; reference asgram_rx.cc:131)
  O : IQ ring-log dump file (.m octave, like the reference's SIGINT dump)
"""


def main(argv=None) -> int:
    flags, _ = parse_args(argv if argv is not None else sys.argv[1:],
                          "hi:n:L:o:S:O:r:")
    if "h" in flags:
        print(USAGE)
        return 0
    path = flags.get("i")
    if not path:
        print(USAGE)
        return 1
    nfft = int(flags.get("n", 64))
    rows = int(flags.get("L", 20))
    offset = float(flags.get("o", -65.0))
    scale = float(flags.get("S", 5.0))

    stream = read_iq(path)
    stream = apply_channel(stream, flags)
    stream = apply_msresamp(stream, float(flags.get("r", 1.0)))
    sg = spec_mod.spectrogram_create(nfft=nfft, ref_level=offset,
                                     scale=scale)
    n_frames = len(stream) // nfft
    take = min(rows, n_frames)
    stride = max(n_frames // max(take, 1), 1)
    # only the `take` strided display frames are computed/transferred —
    # FFT-ing every frame of a long capture to print ~20 rows would be
    # thousands of times more compute + a huge host copy
    sel = np.concatenate([stream[i * stride * nfft:
                                 i * stride * nfft + nfft]
                          for i in range(take)]) if take else \
        np.zeros(0, np.complex64)
    psd, peak_db, peak_f = spec_mod.spectrogram_block(
        sg, jnp.asarray(sel))
    psd = np.asarray(psd)
    for r in range(take):
        row = spec_mod.ascii_row(sg, psd[r])
        print("[%s] peak: %6.1f dB @ f=%+.3f" %
              (row, float(peak_db[r]), float(peak_f[r])))
    if flags.get("O"):
        # IQ ring-log dump (the reference writes raw IQ on SIGINT,
        # /root/reference/src/asgram_rx.cc:233-253)
        from ..ops import window as window_mod
        ring = window_mod.ring_init(1024)
        ring = window_mod.ring_push(ring, jnp.asarray(stream))
        q = np.asarray(window_mod.ring_read(ring))
        with open(flags["O"], "w") as f:
            f.write("%% asgram_rx IQ capture (octave)\nclear all;\n")
            f.write("x = [" + " ".join(
                "(%.5g%+.5gj)" % (v.real, v.imag) for v in q) + "];\n")
            f.write("figure; plot(real(x)); hold on; plot(imag(x));\n")
        print(f"IQ log written to {flags['O']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
