"""RX gain vs decimation calibration for the resampler chain.

The analog of the reference's USRP gain calibration artifacts
(/root/reference/scripts/usrp_rx_gain.dat — 30 rows of bandwidth / noise /
signal level — and usrp_rx_gain_correction_plot.m's piecewise-log2
polynomial fit): measures the msresamp chain's signal and noise gain at
each decimation factor, writes the same-shaped table plus an octave fit
script.  On real hardware the numbers characterize the front-end; here they
characterize the framework's own multi-stage filters so applications can
apply the identical correction model.

Usage: python scripts/rx_gain_cal.py [--out scripts_out] [--rates 4..512]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")


def measure(decim: int, n: int = 1 << 16, seed: int = 0):
    import jax.numpy as jnp
    from liquid_usrp_tpu.ops import resamp as resamp_mod

    rng = np.random.default_rng(seed)
    rate = 1.0 / decim
    f_tone = 0.1 * rate            # in-band tone after decimation
    t = np.arange(n)
    tone = np.exp(2j * np.pi * f_tone * t).astype(np.complex64)
    noise = ((rng.normal(size=n) + 1j * rng.normal(size=n)) *
             np.sqrt(0.5)).astype(np.complex64)

    ms = resamp_mod.msresamp_create(rate)
    div = 2 ** ms.num_halfband
    n_use = n - n % div

    def level(x):
        st = resamp_mod.msresamp_state(ms)
        st, y, valid, count = resamp_mod.msresamp_block(
            ms, st, jnp.asarray(x[:n_use]))
        y = np.asarray(y)[: int(count)]
        y = y[len(y) // 4:]
        return float(np.mean(np.abs(y) ** 2))

    return level(tone), level(noise)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.dirname(__file__))
    ap.add_argument("--max-decim", type=int, default=256)
    args = ap.parse_args()

    rows = []
    d = 4
    while d <= args.max_decim:
        sig, noi = measure(d)
        # table shape mirrors usrp_rx_gain.dat: bandwidth-like column,
        # noise level, signal level (dB)
        bw = 16e6 / d              # 16 MHz ref clock convention
        rows.append((bw, 10 * np.log10(max(noi, 1e-12)),
                     10 * np.log10(max(sig, 1e-12))))
        print("decim %4d (bw %10.1f Hz): signal %7.3f dB, noise %7.3f dB" %
              (d, bw, rows[-1][2], rows[-1][1]))
        d *= 2

    os.makedirs(args.out, exist_ok=True)
    dat = os.path.join(args.out, "rx_gain.dat")
    with open(dat, "w") as f:
        f.write("# bandwidth_hz noise_db signal_db "
                "(msresamp chain calibration)\n")
        for bw, noi, sig in rows:
            f.write("%12.1f %10.4f %10.4f\n" % (bw, noi, sig))

    m = os.path.join(args.out, "rx_gain_correction_plot.m")
    with open(m, "w") as f:
        f.write("%% gain-vs-decimation correction fit (octave)\n")
        f.write("d = load('rx_gain.dat');\n")
        f.write("bw = d(:,1); noise = d(:,2); sig = d(:,3);\n")
        f.write("p = polyfit(log2(bw), sig, 2);\n")
        f.write("fit = polyval(p, log2(bw));\n")
        f.write("figure; semilogx(bw, sig, 'o', bw, fit, '-');\n")
        f.write("xlabel('bandwidth [Hz]'); ylabel('gain [dB]');\n")
        f.write("legend('measured','log2 polynomial fit');\n")
    print("wrote", dat, "and", m)


if __name__ == "__main__":
    main()
