"""Semantic locks for the round-5 TPU-lowering rewrites.

Each of these ops replaced a form that lowered catastrophically on TPU
(traced index-array gathers under the candidate vmap; O(window)
reduce_window NMS — ROUND5_NOTES.md).  The rewrites are only legal
because they are exactly equivalent to the forms they replaced; these
tests pin that equivalence against the direct reference formulations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liquid_usrp_tpu.framing import payload as payload_codec
from liquid_usrp_tpu.ops import modem as modem_mod
from liquid_usrp_tpu.ops.corr import _sliding_max_vanherk, sliding_max


@pytest.mark.parametrize("n,radius", [(5, 1), (97, 48), (1000, 3),
                                      (4096, 96), (65633, 48)])
def test_sliding_max_equals_reduce_window(n, radius):
    """Both dispatch targets must match reduce_window exactly (the CPU
    lane's sliding_max IS reduce_window, so the van Herk core — the TPU
    form — is asserted explicitly)."""
    rng = np.random.default_rng(n + radius)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    want = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (2 * radius + 1,), (1,), "SAME")
    np.testing.assert_array_equal(np.asarray(want),
                                  np.asarray(sliding_max(x, radius)))
    np.testing.assert_array_equal(
        np.asarray(want), np.asarray(_sliding_max_vanherk(x, radius)))


@pytest.mark.parametrize("scheme", [1, 2, 9, 17, 24, 40])  # bps 1,2,4,6...
def test_bits_from_syms_equals_gather_form(scheme):
    """The per-static-bps layout select must reproduce the direct
    ``sym[j // bps + off]`` gather for every in-range bit."""
    rng = np.random.default_rng(scheme)
    bps = modem_mod.bits_per_symbol(scheme)
    n = 257
    max_bits = (n - 2) * bps          # stays within the symbol stream
    sym = jnp.asarray(rng.integers(0, 1 << bps, n), jnp.int32)
    for off_v in (0, 1):
        off = jnp.int32(off_v)
        got = payload_codec._bits_from_syms(
            sym, off, jnp.int32(bps), max_bits)
        j = np.arange(max_bits)
        src = np.clip(j // bps + off_v, 0, n - 1)
        want = (np.asarray(sym)[src] >> (bps - 1 - j % bps)) & 1
        np.testing.assert_array_equal(np.asarray(got), want.astype(np.uint8))


@pytest.mark.parametrize("scheme", [2, 9, 17, 31, 40])
def test_nearest_point_equals_table_gather(scheme):
    """Value-carrying argmin == tab[argmin] (incl. tie-breaking by
    first occurrence, which the shared strict-< update guarantees)."""
    rng = np.random.default_rng(scheme + 7)
    tab = jnp.asarray(payload_codec._stacked_tables())[scheme]
    x = jnp.asarray((rng.standard_normal(500) +
                     1j * rng.standard_normal(500)).astype(np.complex64))
    sym, dmin_s = payload_codec._nearest_sym(x, tab)
    dec, dmin_p = payload_codec._nearest_point(x, tab)
    np.testing.assert_array_equal(np.asarray(tab)[np.asarray(sym)],
                                  np.asarray(dec))
    np.testing.assert_allclose(np.asarray(dmin_s), np.asarray(dmin_p),
                               rtol=0, atol=0)


def test_nearest_point_exact_tie_breaks_first():
    # two identical table entries: both forms must pick the first
    tab = jnp.asarray(np.array([1 + 1j, 1 + 1j, -1 - 1j] + [1e6 + 0j] * 13,
                               np.complex64))
    x = jnp.asarray(np.array([1 + 1j, -1 - 1j, 0.1 + 0.1j], np.complex64))
    sym, _ = payload_codec._nearest_sym(x, tab)
    dec, _ = payload_codec._nearest_point(x, tab)
    assert np.asarray(sym).tolist() == [0, 2, 0]
    np.testing.assert_array_equal(np.asarray(tab)[np.asarray(sym)],
                                  np.asarray(dec))
