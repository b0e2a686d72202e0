"""Convolutional codes (rate-1/2, K=7/9) with a vectorized Viterbi decoder.

Capability parity: the reference's CLI accepts the liquid-dsp conv-code
schemes via its FEC string parser (e.g. /root/reference/src/
ofdmflexframe_tx.cc:90 with ``liquid_getopt_str2fec``); this module provides
the ``v27`` / ``v29`` members behind the same scheme enum as
:mod:`liquid_usrp_tpu.ops.fec`.

TPU-first design: the encoder is a GF(2) FIR (binary convolution as an
integer convolution mod 2).  The decoder is a Viterbi trellis expressed as a
``lax.scan`` over time with *all states updated as one vector op* per step —
the classic add-compare-select butterfly becomes a gather + minimum over a
``[2^(K-1)]`` metric vector, and traceback is a reverse scan over the stored
decision bits.  Terminated trellis (K-1 flush zeros).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bits import pack_bits, unpack_bits

__all__ = ["encoded_length", "conv_encode", "conv_decode"]


class _ConvCode(NamedTuple):
    K: int                 # constraint length
    polys: tuple           # generator polynomials (binary, K taps, MSB = g[0])


def _params(scheme: int) -> _ConvCode:
    from .fec import FEC_CONV_V27, FEC_CONV_V29
    if scheme == FEC_CONV_V27:
        return _ConvCode(7, (0o171, 0o133))       # CCSDS / Voyager K=7
    if scheme == FEC_CONV_V29:
        return _ConvCode(9, (0o561, 0o753))       # K=9 rate 1/2
    raise ValueError(f"not a conv scheme: {scheme}")


def encoded_length(scheme: int, n_bytes: int) -> int:
    p = _params(scheme)
    nbits = n_bytes * 8 + (p.K - 1)               # terminated
    return -(-(2 * nbits) // 8)


@functools.lru_cache(maxsize=None)
def _tables(scheme: int):
    """Per-state branch tables.

    For state s (the K-1 previous input bits, newest in the LSB... we use the
    convention: register r = [b_t, b_{t-1}, ..., b_{t-K+1}], state = r >> 1)
    and input bit b: outputs o_j = parity(polys[j] & ((b << (K-1)) | s)).
    Next state: ((b << (K-1)) | s) >> 1.
    """
    p = _params(scheme)
    S = 1 << (p.K - 1)
    out = np.zeros((S, 2, 2), dtype=np.uint8)     # [state, bit, which_poly]
    nxt = np.zeros((S, 2), dtype=np.int32)
    for s in range(S):
        for b in (0, 1):
            reg = (b << (p.K - 1)) | s
            for j, g in enumerate(p.polys):
                out[s, b, j] = bin(reg & g).count("1") & 1
            nxt[s, b] = reg >> 1
    # predecessor table: for each next-state, the two (prev_state, bit) pairs
    pred = np.zeros((S, 2), dtype=np.int32)       # [next_state, which] -> prev
    pred_bit = np.zeros((S, 2), dtype=np.uint8)
    cnt = np.zeros(S, dtype=np.int32)
    for s in range(S):
        for b in (0, 1):
            ns = nxt[s, b]
            pred[ns, cnt[ns]] = s
            pred_bit[ns, cnt[ns]] = b
            cnt[ns] += 1
    assert (cnt == 2).all()
    # expected output pair for each (next_state, which_pred)
    pred_out = np.zeros((S, 2, 2), dtype=np.uint8)
    for ns in range(S):
        for w in (0, 1):
            pred_out[ns, w] = out[pred[ns, w], pred_bit[ns, w]]
    # NumPy in the cache (a jnp constant built under trace would leak)
    return pred, pred_bit, pred_out, S, p.K


def conv_encode(scheme: int, data: jnp.ndarray) -> jnp.ndarray:
    """Encode uint8 ``[n]`` -> uint8 ``[encoded_length]`` (terminated)."""
    p = _params(scheme)
    bits = unpack_bits(data)
    bits = jnp.concatenate(
        [bits, jnp.zeros(p.K - 1, dtype=jnp.uint8)], axis=-1)
    # GF(2) FIR: y_j[i] = parity(sum_t g_j[t] * x[i-t]); implement as a
    # correlation against the K-tap generator with zero left-padding.
    x = jnp.concatenate([jnp.zeros(p.K - 1, dtype=jnp.uint8), bits])
    idx = jnp.arange(bits.shape[-1])[:, None] + jnp.arange(p.K)[None, :]
    windows = x[idx]                               # [nbits, K]; window t..t+K-1
    outs = []
    for g in p.polys:
        # g bit (K-1-i) multiplies x[t - i]; windows[:, K-1 - i] = x[t - i]
        taps = jnp.asarray([(g >> i) & 1 for i in range(p.K)],
                           dtype=jnp.int32)        # taps[i] aligns windows col
        y = (windows.astype(jnp.int32) @ taps) & 1
        outs.append(y.astype(jnp.uint8))
    inter = jnp.stack(outs, axis=-1).reshape(-1)   # o0,o1 interleaved
    out_bytes = encoded_length(scheme, data.shape[-1])
    pad = out_bytes * 8 - inter.shape[-1]
    if pad:
        inter = jnp.pad(inter, (0, pad))
    return pack_bits(inter)


def conv_decode(scheme: int, coded: jnp.ndarray, n_bytes: int) -> jnp.ndarray:
    """Hard-decision Viterbi decode -> uint8 ``[n_bytes]``."""
    pred_np, pred_bit_np, pred_out_np, S, K = _tables(scheme)
    pred = jnp.asarray(pred_np)
    pred_bit = jnp.asarray(pred_bit_np)
    pred_out = jnp.asarray(pred_out_np)
    nbits = n_bytes * 8 + (K - 1)
    pairs = unpack_bits(coded)[: 2 * nbits].reshape(nbits, 2).astype(jnp.int32)

    big = jnp.int32(1 << 20)
    pm0 = jnp.full((S,), big, dtype=jnp.int32).at[0].set(0)

    def step(pm, rx):
        # branch metric for each (next_state, which_pred): hamming distance
        bm = jnp.sum(jnp.abs(pred_out.astype(jnp.int32) - rx[None, None, :]),
                     axis=-1)                       # [S, 2]
        cand = pm[pred] + bm                        # [S, 2]
        choice = jnp.argmin(cand, axis=-1)          # [S]
        pm_next = jnp.take_along_axis(cand, choice[:, None], axis=-1)[:, 0]
        pm_next = pm_next - jnp.min(pm_next)        # normalize (no overflow)
        return pm_next, choice.astype(jnp.uint8)

    pm_final, choices = jax.lax.scan(step, pm0, pairs)

    # traceback from state 0 (terminated trellis)
    def back(state, choice_t):
        w = choice_t[state]
        bit = pred_bit[state, w]
        prev = pred[state, w]
        return prev, bit

    _, bits_rev = jax.lax.scan(back, jnp.int32(0), choices, reverse=True)
    bits = bits_rev[: n_bytes * 8]
    return pack_bits(bits)
