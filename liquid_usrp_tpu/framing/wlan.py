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

__all__ = ["WLAN_RATES", "wlan_frame_length", "wlan_assemble"]

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

    # pilot polarity PN (127-periodic, standard sequence generator
    # x^7 + x^4 + 1 seeded all-ones)
    state = 0x7F
    pn = []
    for _ in range(127):
        b = ((state >> 6) ^ (state >> 3)) & 1
        state = ((state << 1) | b) & 0x7F
        pn.append(1.0 - 2.0 * b)
    return short.astype(np.complex64), long_t.astype(np.complex64), \
        np.array(pn, dtype=np.float32)


def _scramble_bits(bits: np.ndarray, seed: int = 0x5D) -> np.ndarray:
    """Frame-synchronous scrambler x^7 + x^4 + 1."""
    state = seed & 0x7F
    out = np.empty_like(bits)
    for i, b in enumerate(bits):
        s = ((state >> 6) ^ (state >> 3)) & 1
        out[i] = b ^ s
        state = ((state << 1) | s) & 0x7F
    return out


def _conv_encode_bits(bits: np.ndarray) -> np.ndarray:
    """K=7 (133, 171) rate-1/2; zero-state start (tail bits included by
    the caller)."""
    g0, g1 = 0o133, 0o171
    reg = 0
    out = np.empty(2 * len(bits), dtype=np.uint8)
    for i, b in enumerate(bits):
        reg = ((reg << 1) | int(b)) & 0x7F
        out[2 * i] = bin(reg & g0).count("1") & 1
        out[2 * i + 1] = bin(reg & g1).count("1") & 1
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


def _interleave(bits: np.ndarray, ncbps: int, bpsc: int) -> np.ndarray:
    """Per-symbol two-permutation block interleaver (17-17)."""
    out = np.empty_like(bits)
    s = max(bpsc // 2, 1)
    for base in range(0, len(bits), ncbps):
        for k in range(ncbps):
            i = (ncbps // 16) * (k % 16) + k // 16
            j = s * (i // s) + (i + ncbps - (16 * i // ncbps)) % s
            out[base + j] = bits[base + k]
    return out


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
    n_sym = -(-(16 + 8 * length + 6) // ndbps)
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
    for s in range(n_sym):
        grids[1 + s, didx] = pts[s * 48:(s + 1) * 48]
        grids[1 + s, pidx] = (np.array([1, 1, 1, -1]) *
                              pilot_pn[(1 + s) % 127])
    body = _symbols_to_time(grids)

    return jnp.asarray(np.concatenate([short_pre, long_pre, body]))
