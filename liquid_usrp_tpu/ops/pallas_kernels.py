"""Pallas TPU kernels for hot streaming ops.

The XLA-generated pipeline already exceeds 700x the reference's real-time
envelope (bench.py); these kernels target the remaining per-block fixed
cost.  First kernel: the S0 detection front-end — the XLA version
materializes the lag product, three cumulative sums, windowed differences
and the normalized metric as separate HBM-level ops; the Pallas version
keeps the cumulative sums resident in VMEM and computes all windowed sums +
the normalized metric in one fused pass per tile.

Each kernel has a reference jnp implementation and is validated against it
in interpret mode on CPU (tests) and compiled on TPU; callers opt in via
``use_pallas=True`` flags (default off until the numerics are pinned on
real hardware in CI).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["detect_metric_fused"]

_TILE = 1024


def _detect_kernel(lag: int, span: int, floor_ref, re_ref, im_ref, p_ref,
                   metric_ref, cre_ref, cim_ref):
    """Grid step i computes metric[i*TILE : (i+1)*TILE].

    The cumulative-sum arrays live whole in VMEM; windowed sums are two
    dynamic slices + a subtract each (fused with the normalization).
    """
    i = pl.program_id(0)
    t0 = i * _TILE
    floor = floor_ref[0]
    cre = re_ref[pl.ds(t0 + span, _TILE)] - re_ref[pl.ds(t0, _TILE)]
    cim = im_ref[pl.ds(t0 + span, _TILE)] - im_ref[pl.ds(t0, _TILE)]
    e1 = p_ref[pl.ds(t0 + span, _TILE)] - p_ref[pl.ds(t0, _TILE)]
    e2 = p_ref[pl.ds(t0 + span + lag, _TILE)] - \
        p_ref[pl.ds(t0 + lag, _TILE)]
    c2 = cre * cre + cim * cim
    denom = jnp.maximum(e1 * e2, 1e-12)
    metric = jnp.where(jnp.minimum(e1, e2) > floor, c2 / denom, 0.0)
    metric_ref[...] = metric
    cre_ref[...] = cre
    cim_ref[...] = cim


def detect_metric_fused(ext: jnp.ndarray, lag: int, span: int,
                        floor_scale: float = 1e-4,
                        interpret: bool = False):
    """S0 periodicity metric (fused): returns ``(metric, c)`` matching
    ``ofdm_sync._detect_metric``.

    ``metric[n] = |sum_{i<span} x[n+i] conj(x[n+i+lag])|^2 / (E1 E2)`` with
    the silence floor applied; ``c`` is the complex lag correlation.
    """
    n_out = ext.shape[-1] - span - lag + 1
    n_tiles = -(-n_out // _TILE)
    padded_out = n_tiles * _TILE

    # stage 1 (XLA): lag product + cumsums (log-depth scans XLA handles
    # well); stage 2 (Pallas): fused windowed sums + normalization
    prod = ext[:-lag] * jnp.conj(ext[lag:])
    p = jnp.abs(ext) ** 2
    zero = jnp.zeros((1,), jnp.float32)
    cre = jnp.concatenate([zero, jnp.cumsum(prod.real)])
    cim = jnp.concatenate([zero, jnp.cumsum(prod.imag)])
    cp = jnp.concatenate([zero, jnp.cumsum(p)])
    need_c = padded_out + span + 1
    need_p = padded_out + span + lag + 1
    cre = jnp.pad(cre, (0, max(0, need_c - cre.shape[0])), mode="edge")
    cim = jnp.pad(cim, (0, max(0, need_c - cim.shape[0])), mode="edge")
    cp = jnp.pad(cp, (0, max(0, need_p - cp.shape[0])), mode="edge")
    floor = (floor_scale * span * (jnp.mean(p) + 1e-12)).reshape(1)

    kernel = functools.partial(_detect_kernel, lag, span)
    metric, out_re, out_im = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TILE,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded_out,), jnp.float32),
            jax.ShapeDtypeStruct((padded_out,), jnp.float32),
            jax.ShapeDtypeStruct((padded_out,), jnp.float32),
        ],
        interpret=interpret,
    )(floor.astype(jnp.float32), cre.astype(jnp.float32),
      cim.astype(jnp.float32), cp.astype(jnp.float32))
    c = (out_re + 1j * out_im).astype(jnp.complex64)
    return metric[:n_out], c[:n_out]
