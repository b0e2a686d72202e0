"""gmskframe_tx — GMSK frame TX to an IQ file.

CLI re-creation of /root/reference/src/gmskframe_tx.cc: defaults CRC16 /
FEC none + Hamming(7,4) (:63-66 — the usage text says h74; the code default
fec1=h74), 200 B payload, k=2 samples/symbol (:173); the reference's
resamp2 interp + arbitrary resampler chain (:156-160) is an optional output
rate here.
"""
from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from ..framing import gmskframe as gf
from ..io.streams import write_iq
from ..ops import crc as crc_mod
from ..ops import fec as fec_mod
from ..ops import resamp as resamp_mod
from .common import budget_note, parse_args, print_usage_schemes

USAGE = """gmskframe_tx -o out.iq [options]
  h : usage                     o : output IQ file (required)
  g : soft gain dB (-12)        N : number of frames (10)
  P : payload bytes (200)       v : CRC scheme crc16|crc32 (crc16)
  c : inner FEC (none)          k : outer FEC (h74)
  r : output resampling rate (1.0)
  s : RNG seed (42)
"""


def main(argv=None) -> int:
    flags, _ = parse_args(argv if argv is not None else sys.argv[1:],
                          "ho:g:N:P:v:c:k:r:s:")
    if "h" in flags:
        print(USAGE)
        print_usage_schemes()
        return 0
    out = flags.get("o")
    if not out:
        print(USAGE)
        return 1
    gain = 10 ** (float(flags.get("g", -12.0)) / 20.0)
    num_frames = int(flags.get("N", 10))
    P = int(flags.get("P", 200))
    check = {"none": crc_mod.CRC_NONE, "crc16": crc_mod.CRC_16,
             "crc32": crc_mod.CRC_32}[flags.get("v", "crc16")]
    props = gf.gmsk_default_props()._replace(
        check=check,
        fec0=fec_mod.fec_from_name(flags.get("c", "none")),
        fec1=fec_mod.fec_from_name(flags.get("k", "h74")))
    rate = float(flags.get("r", 1.0))
    rng = np.random.default_rng(int(flags.get("s", 42)))

    params = gf.make_gmsk_params()
    expansion = budget_note(props, P)
    gap = np.zeros(300, np.complex64)
    chunks = [gap]
    for pid in range(num_frames):
        header = np.empty(8, np.uint8)
        header[0] = (pid >> 8) & 0xFF
        header[1] = pid & 0xFF
        header[2:] = rng.integers(0, 256, 6, dtype=np.uint8)
        payload = rng.integers(0, 256, P, dtype=np.uint8)
        frame = np.asarray(gf.gmsk_assemble(
            params, props, jnp.asarray(header), jnp.asarray(payload),
            expansion=expansion))
        chunks.append(frame * gain)
        chunks.append(gap)
    baseband = np.concatenate(chunks)
    if rate != 1.0 and 0.5 < rate <= 2.0:
        # the reference chain: half-band interp-by-2 FIRST (so the
        # arbitrary stage never filters a full-band signal), then the
        # arbitrary resampler created and immediately rate-mutated to <= 1
        # (resamp2 at :160, resamp_crcf_create + _set_rate at :156-157,
        # interp forced so the arb rate <= 1.0 at :131)
        hb = resamp_mod.resamp2_create(7, 60.0)
        st2 = resamp_mod.resamp2_state(hb)
        st2, up = resamp_mod.resamp2_interp_block(
            hb, st2, jnp.asarray(baseband))
        rs = resamp_mod.resamp_create(1.0)
        rs = resamp_mod.resamp_set_rate(rs, rate / 2.0)
        st = resamp_mod.resamp_state(rs)
        st, y, valid, count = resamp_mod.resamp_block(rs, st, up)
        baseband = np.asarray(y)[: int(count)]
    elif rate != 1.0:
        ms = resamp_mod.msresamp_create(rate)
        st = resamp_mod.msresamp_state(ms)
        st, y, valid, count = resamp_mod.msresamp_block(
            ms, st, jnp.asarray(baseband))
        baseband = np.asarray(y)[: int(count)]
    write_iq(out, baseband)
    print(f"gmskframe_tx: wrote {num_frames} frames "
          f"({len(baseband)} samples) to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
