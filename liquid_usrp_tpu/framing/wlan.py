"""802.11a OFDM frame generation (wlanframegen parity).

Capability parity: the reference's optional ``wlanframe_tx`` app drives
``liquid-wlan``'s ``wlanframegen`` (/root/reference/src/wlanframe_tx.cc:
174-231 — 80-sample symbols, rates 6-54 Mb/s; excluded from its default
build at makefile.in:114).  This module implements the 802.11a (1999) PHY
transmit chain from the public standard:

* 64-subcarrier OFDM, 48 data + 4 pilot carriers (+-7, +-21), 16-sample CP,
* short + long training preambles (160 + 160 samples),
* SIGNAL field (rate/length, BPSK, rate-1/2 conv, 1 symbol),
* DATA: service+PSDU+tail+pad, frame-synchronous scrambler (x^7+x^4+1),
  K=7 (133,171) convolutional coding with 2/3 and 3/4 puncturing,
  per-symbol block interleaver, BPSK/QPSK/16-QAM/64-QAM mapping, pilot
  polarity PN.

Everything is batched: one pass builds all symbols, one IFFT, CP via
slicing.  TX-only, mirroring the reference app's scope.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["WLAN_RATES", "wlan_frame_length", "wlan_assemble",
           "wlan_decode", "wlan_sync"]

# rate Mb/s -> (bits/subcarrier BPSC, coding rate (num, den),
#               coded bits/symbol NCBPS, data bits/symbol NDBPS)
WLAN_RATES = {
    6: (1, (1, 2), 48, 24),
    9: (1, (3, 4), 48, 36),
    12: (2, (1, 2), 96, 48),
    18: (2, (3, 4), 96, 72),
    24: (4, (1, 2), 192, 96),
    36: (4, (3, 4), 192, 144),
    48: (6, (2, 3), 288, 192),
    54: (6, (3, 4), 288, 216),
}

_N_FFT = 64
_CP = 16
_DATA_IDX = [k for k in range(-26, 27)
             if k != 0 and abs(k) != 7 and abs(k) != 21]  # 48 carriers
_PILOT_IDX = [-21, -7, 7, 21]


def _fftshift_index(k: int) -> int:
    return k % _N_FFT


@functools.lru_cache(maxsize=None)
def _tables():
    # short training: standard S values on every 4th carrier
    s_set = {
        -24: 1 + 1j, -20: -1 - 1j, -16: 1 + 1j, -12: -1 - 1j, -8: -1 - 1j,
        -4: 1 + 1j, 4: -1 - 1j, 8: -1 - 1j, 12: 1 + 1j, 16: 1 + 1j,
        20: 1 + 1j, 24: 1 + 1j}
    S = np.zeros(_N_FFT, dtype=np.complex128)
    for k, v in s_set.items():
        S[_fftshift_index(k)] = np.sqrt(13.0 / 6.0) * v
    short = np.fft.ifft(S) * _N_FFT / np.sqrt(52)

    # long training: standard L sequence on carriers -26..26
    L_seq = [1, 1, -1, -1, 1, 1, -1, 1, -1, 1, 1, 1, 1, 1, 1, -1, -1, 1, 1,
             -1, 1, -1, 1, 1, 1, 1,
             0,
             1, -1, -1, 1, 1, -1, 1, -1, 1, -1, -1, -1, -1, -1, 1, 1, -1,
             -1, 1, -1, 1, -1, 1, 1, 1, 1]
    L = np.zeros(_N_FFT, dtype=np.complex128)
    for i, k in enumerate(range(-26, 27)):
        L[_fftshift_index(k)] = L_seq[i]
    long_t = np.fft.ifft(L) * _N_FFT / np.sqrt(52)

    # pilot polarity PN: the SAME x^7 + x^4 + 1 sequence as the
    # scrambler, seeded all-ones, as +-1 (standard 17.3.5.9)
    pn = 1.0 - 2.0 * _scramble_seq(0x7F).astype(np.float32)
    return short.astype(np.complex64), long_t.astype(np.complex64), \
        pn.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _scramble_seq(seed: int) -> np.ndarray:
    """One period (127 bits) of the x^7 + x^4 + 1 scrambler output."""
    state = seed & 0x7F
    seq = np.empty(127, np.uint8)
    for i in range(127):
        s = ((state >> 6) ^ (state >> 3)) & 1
        seq[i] = s
        state = ((state << 1) | s) & 0x7F
    return seq


def _scramble_bits(bits: np.ndarray, seed: int = 0x5D) -> np.ndarray:
    """Frame-synchronous scrambler x^7 + x^4 + 1 (vectorized: the output
    sequence is data-independent and 127-periodic)."""
    seq = _scramble_seq(seed)
    reps = -(-len(bits) // 127)
    return bits ^ np.tile(seq, reps)[: len(bits)]


# taps[j] multiplies b[i-j].  The 802.11a generators g0=133, g1=171
# (IEEE 802.11-1999 17.3.5.5) are written MSB = delay 0, so tap j is
# polynomial bit (6-j): delays {0,2,3,5,6} and {0,1,2,3,6}.  (Reading
# the octal LSB-first yields the reciprocal code — self-consistent in
# loopback but not wire-compatible with compliant equipment.)
_G0_TAPS = np.array([(0o133 >> (6 - j)) & 1 for j in range(7)], np.uint8)
_G1_TAPS = np.array([(0o171 >> (6 - j)) & 1 for j in range(7)], np.uint8)


def _conv_encode_bits(bits: np.ndarray) -> np.ndarray:
    """K=7 (133, 171) rate-1/2; zero-state start (tail bits included by
    the caller).  Vectorized: each output is a GF(2) convolution."""
    b = np.asarray(bits, np.uint8)
    o0 = np.convolve(b, _G0_TAPS)[: len(b)] & 1
    o1 = np.convolve(b, _G1_TAPS)[: len(b)] & 1
    out = np.empty(2 * len(b), np.uint8)
    out[0::2] = o0
    out[1::2] = o1
    return out


def _puncture(bits: np.ndarray, num: int, den: int) -> np.ndarray:
    if (num, den) == (1, 2):
        return bits
    if (num, den) == (2, 3):
        # keep pattern per 4 coded bits: [1 1 1 0]
        keep = np.tile([1, 1, 1, 0], len(bits) // 4 + 1)[: len(bits)]
    elif (num, den) == (3, 4):
        # keep pattern per 6: [1 1 1 0 0 1]
        keep = np.tile([1, 1, 1, 0, 0, 1], len(bits) // 6 + 1)[: len(bits)]
    else:
        raise ValueError((num, den))
    return bits[keep.astype(bool)]


@functools.lru_cache(maxsize=None)
def _interleave_perm(ncbps: int, bpsc: int) -> np.ndarray:
    """perm[k] = output position of input bit k (17.3.5.6 two-step)."""
    s = max(bpsc // 2, 1)
    k = np.arange(ncbps)
    i = (ncbps // 16) * (k % 16) + k // 16
    j = s * (i // s) + (i + ncbps - (16 * i // ncbps)) % s
    return j


def _interleave(bits: np.ndarray, ncbps: int, bpsc: int) -> np.ndarray:
    """Per-symbol two-permutation block interleaver (vectorized scatter)."""
    perm = _interleave_perm(ncbps, bpsc)
    sym = bits.reshape(-1, ncbps)
    out = np.empty_like(sym)
    out[:, perm] = sym
    return out.reshape(-1)


def _deinterleave(bits: np.ndarray, ncbps: int, bpsc: int) -> np.ndarray:
    perm = _interleave_perm(ncbps, bpsc)
    sym = bits.reshape(-1, ncbps)
    return sym[:, perm].reshape(-1)


def _map_bits(bits: np.ndarray, bpsc: int) -> np.ndarray:
    """Standard 802.11a gray constellation mapping."""
    n = len(bits) // bpsc
    b = bits.reshape(n, bpsc)
    if bpsc == 1:
        return (2.0 * b[:, 0] - 1.0).astype(np.complex64)
    if bpsc == 2:
        return ((2.0 * b[:, 0] - 1) + 1j * (2.0 * b[:, 1] - 1)) / np.sqrt(2)
    if bpsc == 4:
        lut = np.array([-3, -1, 3, 1], dtype=np.float64)
        re = lut[b[:, 0] * 2 + b[:, 1]]
        im = lut[b[:, 2] * 2 + b[:, 3]]
        return ((re + 1j * im) / np.sqrt(10)).astype(np.complex64)
    if bpsc == 6:
        lut = np.array([-7, -5, -1, -3, 7, 5, 1, 3], dtype=np.float64)
        re = lut[b[:, 0] * 4 + b[:, 1] * 2 + b[:, 2]]
        im = lut[b[:, 3] * 4 + b[:, 4] * 2 + b[:, 5]]
        return ((re + 1j * im) / np.sqrt(42)).astype(np.complex64)
    raise ValueError(bpsc)


def _symbols_to_time(freq_syms: np.ndarray) -> np.ndarray:
    """[n_sym, 64] freq grids -> [n_sym * 80] time samples with CP."""
    time = np.fft.ifft(freq_syms, axis=-1) * _N_FFT / np.sqrt(52)
    with_cp = np.concatenate([time[:, -_CP:], time], axis=-1)
    return with_cp.reshape(-1).astype(np.complex64)


def wlan_n_symbols(rate: int, length: int) -> int:
    ndbps = WLAN_RATES[rate][3]
    return -(-(16 + 8 * length + 6) // ndbps)


def wlan_frame_length(rate: int, length: int) -> int:
    """Total samples: short(160) + long(160) + SIGNAL(80) + data syms*80."""
    return 160 + 160 + 80 + wlan_n_symbols(rate, length) * 80


def wlan_assemble(rate: int, psdu: np.ndarray,
                  seed: int = 0x5D) -> jnp.ndarray:
    """Assemble one 802.11a frame -> complex64 ``[wlan_frame_length]``.

    ``rate``: 6/9/12/18/24/36/48/54 Mb/s; ``psdu``: payload bytes.
    """
    if rate not in WLAN_RATES:
        raise ValueError(f"invalid rate {rate}; one of {list(WLAN_RATES)}")
    bpsc, (num, den), ncbps, ndbps = WLAN_RATES[rate]
    psdu = np.asarray(psdu, dtype=np.uint8)
    length = len(psdu)
    short, long_t, pilot_pn = _tables()

    # --- preambles ---
    short_pre = np.tile(short[:16], 10)                    # 160 samples
    long_pre = np.concatenate([long_t[-32:], long_t, long_t])  # 160

    # --- SIGNAL field: 24 bits, BPSK r=1/2, own symbol ---
    rate_bits = {6: [1, 1, 0, 1], 9: [1, 1, 1, 1], 12: [0, 1, 0, 1],
                 18: [0, 1, 1, 1], 24: [1, 0, 0, 1], 36: [1, 0, 1, 1],
                 48: [0, 0, 0, 1], 54: [0, 0, 1, 1]}[rate]
    len_bits = [(length >> i) & 1 for i in range(12)]      # LSB first
    sig = np.array(rate_bits + [0] + len_bits, dtype=np.uint8)
    parity = int(sig.sum()) & 1
    sig = np.concatenate([sig, [parity], np.zeros(6, np.uint8)])
    sig_coded = _conv_encode_bits(sig)                     # 48 bits
    sig_inter = _interleave(sig_coded, 48, 1)
    sig_pts = _map_bits(sig_inter, 1)

    # --- DATA field ---
    n_sym = wlan_n_symbols(rate, length)
    n_data_bits = n_sym * ndbps
    service = np.zeros(16, np.uint8)
    psdu_bits = np.unpackbits(psdu[:, None], axis=1,
                              bitorder="little").reshape(-1)
    data = np.concatenate([
        service, psdu_bits,
        np.zeros(n_data_bits - 16 - 8 * length, np.uint8)])
    scrambled = _scramble_bits(data, seed)
    # zero the tail bits after scrambling (standard 17.3.5.2)
    tail_at = 16 + 8 * length
    scrambled[tail_at:tail_at + 6] = 0
    coded = _puncture(_conv_encode_bits(scrambled), num, den)
    inter = _interleave(coded, ncbps, bpsc)
    pts = _map_bits(inter, bpsc)                           # [n_sym * 48]

    # --- OFDM grids ---
    grids = np.zeros((1 + n_sym, _N_FFT), dtype=np.complex64)
    didx = [_fftshift_index(k) for k in _DATA_IDX]
    pidx = [_fftshift_index(k) for k in _PILOT_IDX]
    grids[0, didx] = sig_pts
    grids[0, pidx] = np.array([1, 1, 1, -1]) * pilot_pn[0]
    # all DATA symbols in two vectorized assignments
    grids[1:, didx] = pts.reshape(n_sym, 48)
    grids[1:, pidx] = (np.array([1, 1, 1, -1])[None, :] *
                       pilot_pn[(1 + np.arange(n_sym)) % 127][:, None])
    body = _symbols_to_time(grids)

    return jnp.asarray(np.concatenate([short_pre, long_pre, body]))


# ---------------------------------------------------------------------------
# RX (offline, known frame start) — SIGNAL + DATA decode
# ---------------------------------------------------------------------------

def _axis_llr(x: np.ndarray, levels: np.ndarray, nbits: int) -> np.ndarray:
    """Max-log per-bit soft metrics for one gray-coded PAM axis.

    ``levels[idx]`` is the amplitude for axis-bit index ``idx`` (as used by
    ``_map_bits``).  Returns ``[len(x), nbits]``; positive => bit 1.
    """
    d = (x[:, None] - levels[None, :]) ** 2        # [n, L]
    idx = np.arange(len(levels))
    out = np.empty((len(x), nbits))
    for t in range(nbits):
        bit = (idx >> (nbits - 1 - t)) & 1
        d0 = np.min(np.where(bit == 0, d, np.inf), axis=-1)
        d1 = np.min(np.where(bit == 1, d, np.inf), axis=-1)
        out[:, t] = d0 - d1
    return out


def _demap_soft(pts: np.ndarray, bpsc: int) -> np.ndarray:
    """Equalized constellation points -> per-bit LLRs (positive => 1),
    inverting ``_map_bits``'s axis layout."""
    if bpsc == 1:
        return 2.0 * pts.real.reshape(-1, 1)
    if bpsc == 2:
        s = np.sqrt(2)
        return np.stack([pts.real * s, pts.imag * s], axis=-1)
    if bpsc == 4:
        lut = np.array([-3, -1, 3, 1]) / np.sqrt(10)
        re = _axis_llr(pts.real, lut, 2)
        im = _axis_llr(pts.imag, lut, 2)
        return np.concatenate([re, im], axis=-1)
    if bpsc == 6:
        lut = np.array([-7, -5, -1, -3, 7, 5, 1, 3]) / np.sqrt(42)
        re = _axis_llr(pts.real, lut, 3)
        im = _axis_llr(pts.imag, lut, 3)
        return np.concatenate([re, im], axis=-1)
    raise ValueError(bpsc)


def _depuncture(llr: np.ndarray, num: int, den: int,
                n_coded: int) -> np.ndarray:
    """Re-insert zeros (erasures) at punctured positions -> [n_coded]."""
    if (num, den) == (1, 2):
        return llr[:n_coded]
    pattern = {(2, 3): [1, 1, 1, 0],
               (3, 4): [1, 1, 1, 0, 0, 1]}[(num, den)]
    keep = np.tile(pattern, n_coded // len(pattern) + 1)[:n_coded]
    out = np.zeros(n_coded)
    out[keep.astype(bool)] = llr[: int(keep.sum())]
    return out


@functools.lru_cache(maxsize=None)
def _viterbi_tables():
    """(next_state[64,2], out0[64,2], out1[64,2]) for K=7 (133,171)."""
    ns = np.empty((64, 2), np.int32)
    o0 = np.empty((64, 2), np.float64)
    o1 = np.empty((64, 2), np.float64)
    for s in range(64):
        for b in range(2):
            reg = ((s << 1) | b) & 0x7F
            ns[s, b] = reg & 0x3F
            # reg bit d = input delayed d -> mask = bit-reversed octal
            # generator (delay sets {0,2,3,5,6} / {0,1,2,3,6}; see
            # _G0_TAPS note)
            o0[s, b] = 2.0 * (bin(reg & 0o155).count("1") & 1) - 1.0
            o1[s, b] = 2.0 * (bin(reg & 0o117).count("1") & 1) - 1.0
    return ns, o0, o1


def _viterbi_decode(llr: np.ndarray) -> np.ndarray:
    """Soft Viterbi for the zero-state-started K=7 (133,171) code.

    ``llr``: coded-bit metrics (positive => bit 1, 0 = erasure), length
    even; returns the decoded bits.  Vectorized over the 64 states.
    """
    ns, o0, o1 = _viterbi_tables()
    n = len(llr) // 2
    pm = np.full(64, -np.inf)
    pm[0] = 0.0
    choices = np.empty((n, 64), np.int8)
    # transition gather: for each destination state, its two predecessors
    pred = np.empty((64, 2), np.int32)
    pred_b = np.empty((64, 2), np.int32)
    fill = np.zeros(64, np.int32)
    for s in range(64):
        for b in range(2):
            d = ns[s, b]
            pred[d, fill[d]] = s
            pred_b[d, fill[d]] = b
            fill[d] += 1
    bm_out0 = o0[pred, pred_b]                    # [64, 2]
    bm_out1 = o1[pred, pred_b]
    for t in range(n):
        m = (pm[pred] + llr[2 * t] * bm_out0 + llr[2 * t + 1] * bm_out1)
        choices[t] = np.argmax(m, axis=-1)
        pm = m[np.arange(64), choices[t]]
    state = int(np.argmax(pm))
    bits = np.empty(n, np.uint8)
    for t in range(n - 1, -1, -1):
        c = choices[t, state]
        bits[t] = pred_b[state, c]
        state = pred[state, c]
    return bits


def _descramble(bits: np.ndarray) -> np.ndarray:
    """Self-synchronizing descramble: the SERVICE field's first 7 bits are
    transmitted zero, so the received scrambled bits ARE the scrambler
    output and seed the LFSR directly (17.3.5.5)."""
    state = 0
    for i in range(7):
        state = ((state << 1) | int(bits[i])) & 0x7F
    out = bits.copy()
    out[:7] = 0
    seq = np.empty(len(bits) - 7, np.uint8)
    for i in range(len(seq)):
        s = ((state >> 6) ^ (state >> 3)) & 1
        seq[i] = s
        state = ((state << 1) | s) & 0x7F
    out[7:] = bits[7:] ^ seq
    return out


def wlan_sync(stream: np.ndarray, max_frames: int = 8,
              thresh: float = 0.5) -> list:
    """Streaming 802.11a receiver front-end: detect frames anywhere in
    ``stream``, estimate and correct CFO, align, and decode each.

    Detection is the classic short-training structure metric (Schmidl &
    Cox over the 16-sample ST period): ``M(t) = |P(t)|^2 / R(t)^2`` with
    ``P`` the lag-16 autocorrelation and ``R`` the window energy, both as
    vectorized windowed cumulative sums.  A sustained plateau marks the
    short preamble; coarse CFO comes from ``angle(P)/16`` on the plateau
    (range ±1/32 cycles/sample), timing from cross-correlating the
    coarse-corrected stream against the known long-training symbol, and
    fine CFO from the lag-64 product of the two long symbols (the classic
    two-stage estimator).  Each aligned, CFO-corrected frame goes through
    :func:`wlan_decode` (LT channel EQ + pilot tracking + soft Viterbi).

    Returns a list of :func:`wlan_decode` dicts, each with added
    ``start`` (sample index of the frame's first ST sample) and ``cfo``
    (radians/sample applied).  The reference's liquid-wlan has no
    receiver at all; this is the capability its TX side implies.
    """
    x = np.asarray(stream).astype(np.complex64)
    n = len(x)
    short, long_t, _ = _tables()
    W = 48                                     # metric window
    results: list = []
    pos = 0
    min_tail = 480                             # preamble + SIGNAL
    while len(results) < max_frames and n - pos >= min_tail:
        seg = x[pos:]
        c = seg[16:] * np.conj(seg[:-16])
        e = np.abs(seg[16:]) ** 2
        cw = np.cumsum(np.concatenate([[0], c]))
        ew = np.cumsum(np.concatenate([[0], e]))
        m = len(c) - W
        if m <= 0:
            break
        P = cw[W:W + m] - cw[:m]
        R = (ew[W:W + m] - ew[:m]).real
        M = np.abs(P) ** 2 / np.maximum(R, 1e-12) ** 2
        # sustained plateau: metric above threshold for >= 64 consecutive
        # samples (rejects single-sample noise spikes)
        above = M > thresh
        run = np.convolve(above.astype(np.int32), np.ones(64, np.int32),
                          "valid")
        hits = np.nonzero(run >= 64)[0]
        if len(hits) == 0:
            break
        t0 = int(hits[0])                      # inside the short preamble
        # coarse CFO from the plateau autocorrelation phase
        cfo_c = float(np.angle(P[t0 + 32] if t0 + 32 < m else P[t0])) / 16.0
        # LT cross-correlation on the coarse-corrected stream: search a
        # window that must contain the first long symbol
        lo = pos + t0
        hi = min(n, lo + 420)
        win = x[lo:hi] * np.exp(-1j * cfo_c * np.arange(lo, hi))
        if len(win) < 64 + 64:
            break
        lt = long_t / np.linalg.norm(long_t)
        num = np.abs(np.convolve(win, np.conj(lt[::-1]), "valid"))
        den = np.sqrt(np.convolve(np.abs(win) ** 2, np.ones(64), "valid"))
        corr = num / np.maximum(den, 1e-9)
        # two LT peaks 64 apart: score joint alignment
        if len(corr) < 65:
            break
        joint = corr[:-64] + corr[64:]
        p1 = int(np.argmax(joint))
        if joint[p1] < 1.0:                    # each peak ~1 when aligned
            pos = lo + 160
            continue
        start = lo + p1 - 192                  # LT1 begins 192 in
        if start < 0:
            pos = lo + 160
            continue
        # fine CFO from the two long symbols (lag 64), after coarse
        lt1 = x[start + 192:start + 256] * np.exp(
            -1j * cfo_c * np.arange(start + 192, start + 256))
        lt2 = x[start + 256:start + 320] * np.exp(
            -1j * cfo_c * np.arange(start + 256, start + 320))
        if len(lt2) < 64:
            break
        cfo = cfo_c + float(np.angle(np.vdot(lt1, lt2))) / 64.0
        # correct + decode as much of the stream as could be one frame
        frame = x[start:] * np.exp(
            -1j * cfo * np.arange(start, n))
        d = wlan_decode(frame)
        d["start"] = start
        d["cfo"] = cfo
        if d["signal_valid"]:
            results.append(d)
            pos = start + wlan_frame_length(d["rate"], d["length"])
        else:
            pos = start + 320                  # skip past this preamble
    return results


def wlan_decode(samples: np.ndarray) -> dict:
    """Decode one 802.11a frame whose preamble starts at ``samples[0]``.

    Channel estimation from the long training symbols, pilot common-phase
    tracking, soft demap, depuncture-with-erasures, soft Viterbi, and
    self-synchronizing descramble.  Returns rate/length/psdu + validity
    flags.  (The reference's liquid-wlan is TX-only, like wlanframe_tx —
    this receive path exists for loopback verification and completeness.)
    """
    samples = np.asarray(samples)
    if len(samples) < 400:
        # too short for preamble + channel estimate + SIGNAL symbol:
        # report an invalid frame instead of crashing on the FFT windows
        return {"rate": 0, "length": 0, "signal_valid": False,
                "psdu": None, "psdu_valid": False}
    short, long_t, pilot_pn = _tables()
    scale = _N_FFT / np.sqrt(52)
    didx = [_fftshift_index(k) for k in _DATA_IDX]
    pidx = [_fftshift_index(k) for k in _PILOT_IDX]
    ppol = np.array([1, 1, 1, -1], np.float64)

    # channel estimate from the two long-training symbols
    L_ref = np.fft.fft(long_t) / scale
    act = np.abs(L_ref) > 0.1
    L1 = np.fft.fft(samples[192:256]) / scale
    L2 = np.fft.fft(samples[256:320]) / scale
    H = np.where(act, (L1 + L2) / 2.0 * np.conj(L_ref) /
                 np.maximum(np.abs(L_ref) ** 2, 1e-12), 1.0)

    def eq_symbol(sym_samples):
        Y = np.fft.fft(sym_samples) / scale
        Yeq = Y / np.where(np.abs(H) > 1e-6, H, 1.0)
        return Yeq

    def pilot_corr(Yeq, sym_index):
        ref = ppol * pilot_pn[sym_index % 127]
        rot = np.mean(Yeq[pidx] * ref)          # ref is +-1 real
        rot = rot / max(abs(rot), 1e-12)
        return Yeq * np.conj(rot)

    # SIGNAL
    Ys = pilot_corr(eq_symbol(samples[336:400]), 0)
    sig_llr = _demap_soft(Ys[didx], 1).reshape(-1)
    sig_bits = _viterbi_decode(_deinterleave(sig_llr, 48, 1))
    rate_code = tuple(int(b) for b in sig_bits[:4])
    rate_map = {(1, 1, 0, 1): 6, (1, 1, 1, 1): 9, (0, 1, 0, 1): 12,
                (0, 1, 1, 1): 18, (1, 0, 0, 1): 24, (1, 0, 1, 1): 36,
                (0, 0, 0, 1): 48, (0, 0, 1, 1): 54}
    rate = rate_map.get(rate_code)
    length = int(sum(int(sig_bits[5 + i]) << i for i in range(12)))
    parity_ok = (int(sig_bits[:17].sum()) & 1) == int(sig_bits[17])
    sig_ok = (rate is not None and parity_ok and
              0 < length <= 4095 and not sig_bits[18:24].any())
    out = {"rate": rate, "length": length, "signal_valid": bool(sig_ok),
           "psdu": None, "psdu_valid": False}
    if not sig_ok:
        return out

    bpsc, (num, den), ncbps, ndbps = WLAN_RATES[rate]
    n_sym = wlan_n_symbols(rate, length)
    if len(samples) < 400 + n_sym * 80:
        return out
    llrs = []
    for s in range(n_sym):
        base = 400 + s * 80 + 16
        Y = pilot_corr(eq_symbol(samples[base:base + 64]), 1 + s)
        llr = _demap_soft(Y[didx], bpsc).reshape(-1)
        llrs.append(_deinterleave(llr, ncbps, bpsc))
    llr = np.concatenate(llrs)
    n_data_bits = n_sym * ndbps
    coded = _depuncture(llr, num, den, 2 * n_data_bits)
    scrambled = _viterbi_decode(coded)
    data = _descramble(scrambled)
    psdu_bits = data[16:16 + 8 * length]
    psdu = np.packbits(psdu_bits.reshape(-1, 8), axis=-1,
                       bitorder="little").reshape(-1)
    out["psdu"] = psdu
    # the tail bits are zeroed post-scramble by the transmitter
    # (17.3.5.2), so the Viterbi output must be zero there — the only
    # structural validity check the DATA field offers
    tail_at = 16 + 8 * length
    out["psdu_valid"] = bool(not scrambled[tail_at:tail_at + 6].any())
    return out
