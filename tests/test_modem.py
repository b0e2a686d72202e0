"""Modem constellation tests: roundtrip, energy, gray coding, soft demap."""
import numpy as np
import pytest

import jax.numpy as jnp

from liquid_usrp_tpu.ops import modem

ALL = [getattr(modem, n) for n in dir(modem) if n.startswith("MOD_")]


@pytest.mark.parametrize("scheme", ALL)
def test_roundtrip(scheme):
    M = 1 << modem.bits_per_symbol(scheme)
    syms = jnp.arange(M)
    x = modem.modulate(scheme, syms)
    back = modem.demodulate(scheme, x)
    np.testing.assert_array_equal(np.asarray(back), np.arange(M))


@pytest.mark.parametrize("scheme", ALL)
def test_unit_energy(scheme):
    table = np.asarray(modem.constellation(scheme))
    np.testing.assert_allclose(np.mean(np.abs(table) ** 2), 1.0, rtol=1e-5)
    # all points distinct
    M = table.shape[0]
    d = np.abs(table[:, None] - table[None, :]) + np.eye(M)
    assert d.min() > 1e-3


@pytest.mark.parametrize("scheme", [modem.MOD_QPSK, modem.MOD_PSK8,
                                    modem.MOD_QAM16, modem.MOD_QAM64])
def test_roundtrip_with_noise(scheme):
    rng = np.random.default_rng(0)
    n = 4096
    M = 1 << modem.bits_per_symbol(scheme)
    syms = rng.integers(0, M, size=n)
    x = np.asarray(modem.modulate(scheme, jnp.asarray(syms)))
    noise = (rng.normal(size=n) + 1j * rng.normal(size=n)) * 0.02
    back = np.asarray(modem.demodulate(scheme, jnp.asarray(x + noise)))
    np.testing.assert_array_equal(back, syms)


def test_qpsk_gray_neighbors():
    # adjacent angular QPSK points differ in exactly one bit
    table = np.asarray(modem.constellation(modem.MOD_QPSK))
    ang = np.angle(table)
    order = np.argsort(ang)
    for i in range(4):
        a, b = order[i], order[(i + 1) % 4]
        assert bin(a ^ b).count("1") == 1


def test_bits_symbols_roundtrip():
    rng = np.random.default_rng(2)
    bits = jnp.asarray(rng.integers(0, 2, size=60, dtype=np.uint8))
    syms = modem.bits_to_symbols(bits, 4)
    back = modem.symbols_to_bits(syms, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(bits))


def test_soft_demod_signs():
    # strong noiseless symbols: LLR sign must match transmitted bits
    scheme = modem.MOD_QAM16
    bps = 4
    syms = jnp.arange(16)
    x = modem.modulate(scheme, syms)
    llr = np.asarray(modem.demodulate_soft(scheme, x, noise_var=0.1))
    bits = np.asarray(modem.symbols_to_bits(syms, bps))
    hard = (llr > 0).astype(np.uint8).reshape(-1)
    np.testing.assert_array_equal(hard, bits)


def test_evm_zero_for_exact():
    syms = jnp.arange(4)
    x = modem.modulate(modem.MOD_QPSK, syms)
    e = float(modem.evm(modem.MOD_QPSK, x, syms))
    assert e < -100.0


@pytest.mark.parametrize("scheme", [modem.MOD_DPSK2, modem.MOD_DPSK4,
                                    modem.MOD_DPSK8])
def test_dpsk_differential_roundtrip(scheme):
    """Differential PSK survives an arbitrary constant phase rotation
    without any carrier recovery."""
    rng = np.random.default_rng(scheme)
    M = 1 << modem.bits_per_symbol(scheme)
    syms = rng.integers(0, M, 256)
    pts, ref = modem.dpsk_modulate(scheme, jnp.asarray(syms))
    rotated = pts * np.exp(1j * 1.234)      # unknown constant phase
    back, _ = modem.dpsk_demodulate(scheme, jnp.asarray(rotated))
    # symbol 0 differentiates against the (unrotated) initial reference, so
    # only symbols 1.. are phase-invariant — real systems send a reference
    # symbol first
    np.testing.assert_array_equal(np.asarray(back)[1:], syms[1:])


def test_dpsk_streaming_blocks():
    scheme = modem.MOD_DPSK4
    rng = np.random.default_rng(0)
    syms = rng.integers(0, 4, 100)
    pts_a, ref = modem.dpsk_modulate(scheme, jnp.asarray(syms[:60]))
    pts_b, _ = modem.dpsk_modulate(scheme, jnp.asarray(syms[60:]), ref)
    full = np.concatenate([np.asarray(pts_a), np.asarray(pts_b)])
    back, _ = modem.dpsk_demodulate(scheme, jnp.asarray(full))
    np.testing.assert_array_equal(np.asarray(back), syms)
