"""FEC roundtrip + error-correction tests (block codes and Viterbi)."""
import numpy as np
import pytest

import jax.numpy as jnp

from liquid_usrp_tpu.ops import fec

BLOCK_SCHEMES = [
    fec.FEC_NONE, fec.FEC_REP3, fec.FEC_REP5,
    fec.FEC_HAMMING74, fec.FEC_HAMMING84, fec.FEC_HAMMING128,
    fec.FEC_GOLAY2412,
    fec.FEC_SECDED2216, fec.FEC_SECDED3932, fec.FEC_SECDED7264,
]
CONV_SCHEMES = [fec.FEC_CONV_V27, fec.FEC_CONV_V29]


@pytest.mark.parametrize("scheme", BLOCK_SCHEMES + CONV_SCHEMES)
@pytest.mark.parametrize("n", [1, 8, 37])
def test_roundtrip_clean(scheme, n):
    rng = np.random.default_rng(scheme * 100 + n)
    data = rng.integers(0, 256, size=n, dtype=np.uint8)
    enc = fec.fec_encode(scheme, jnp.asarray(data))
    assert enc.shape[-1] == fec.encoded_length(scheme, n)
    dec = fec.fec_decode(scheme, enc, n)
    np.testing.assert_array_equal(np.asarray(dec), data)


def _flip_bits(buf: np.ndarray, bit_idx):
    out = buf.copy()
    for b in bit_idx:
        out[b // 8] ^= 1 << (7 - (b % 8))
    return out


@pytest.mark.parametrize("scheme,errs_per_block,blockbits", [
    (fec.FEC_HAMMING74, 1, 7),
    (fec.FEC_HAMMING84, 1, 8),
    (fec.FEC_HAMMING128, 1, 12),
    (fec.FEC_GOLAY2412, 3, 24),
    (fec.FEC_SECDED2216, 1, 22),
    (fec.FEC_REP3, 1, None),
])
def test_corrects_errors(scheme, errs_per_block, blockbits):
    rng = np.random.default_rng(42)
    n = 24
    data = rng.integers(0, 256, size=n, dtype=np.uint8)
    enc = np.asarray(fec.fec_encode(scheme, jnp.asarray(data)))
    if blockbits is None:
        corrupted = _flip_bits(enc, [5])  # single bit in first copy
    else:
        # flip errs_per_block bits inside the first and the last full block
        nblocks = (n * 8 + 1) // 1  # upper bound; pick two safe blocks
        first = list(range(errs_per_block))
        total_blocks = (n * 8) // (blockbits if blockbits <= 8 else 8)
        last_block = (enc.shape[0] * 8) // blockbits - 1
        last = [last_block * blockbits + i for i in range(errs_per_block)]
        corrupted = _flip_bits(enc, first + last)
    dec = fec.fec_decode(scheme, jnp.asarray(corrupted), n)
    np.testing.assert_array_equal(np.asarray(dec), data)


def test_golay_soft_ml_beats_hard_syndrome():
    """Exact-ML soft Golay (codeword-correlation matmul): identical to
    the message on clean LLRs, and strictly fewer word errors than hard
    syndrome decoding at moderate noise (the ~2 dB soft gain)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    c = fec._block_code(fec.FEC_GOLAY2412)
    msg = rng.integers(0, 2, (60, 12)).astype(np.uint8)
    cw = (msg @ c.G) % 2
    clean = (2.0 * cw - 1.0).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(fec.golay_decode_soft(jnp.asarray(clean))), msg)
    L = clean + 0.9 * rng.standard_normal(cw.shape).astype(np.float32)
    soft = np.asarray(fec.golay_decode_soft(jnp.asarray(L)))
    hard_bits = (L > 0).astype(np.uint8)
    syn = (hard_bits @ c.H.T) % 2
    s_idx = (syn * (1 << np.arange(11, -1, -1))).sum(1)
    hard = (hard_bits ^ c.syn_table[s_idx])[:, :12]
    errs_soft = int((soft != msg).any(1).sum())
    errs_hard = int((hard != msg).any(1).sum())
    assert errs_soft <= errs_hard - 5, (errs_soft, errs_hard)


def test_golay_fails_beyond_capacity_detected():
    # 5 errors in one 24-bit block: decode must not crash; result may differ
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, size=3, dtype=np.uint8)
    enc = np.asarray(fec.fec_encode(fec.FEC_GOLAY2412, jnp.asarray(data)))
    corrupted = _flip_bits(enc, [0, 3, 7, 11, 15])
    _ = fec.fec_decode(fec.FEC_GOLAY2412, jnp.asarray(corrupted), 3)


@pytest.mark.parametrize("scheme", CONV_SCHEMES)
def test_viterbi_corrects_scattered_errors(scheme):
    rng = np.random.default_rng(scheme)
    n = 32
    data = rng.integers(0, 256, size=n, dtype=np.uint8)
    enc = np.asarray(fec.fec_encode(scheme, jnp.asarray(data)))
    # scattered single-bit errors, well separated (> constraint length spacing)
    nbits = enc.shape[0] * 8
    errs = list(range(3, nbits - 16, 40))
    corrupted = _flip_bits(enc, errs)
    dec = fec.fec_decode(scheme, jnp.asarray(corrupted), n)
    np.testing.assert_array_equal(np.asarray(dec), data)


def test_name_parser():
    assert fec.fec_from_name("g2412") == fec.FEC_GOLAY2412
    assert fec.fec_from_name("Hamming128") == fec.FEC_HAMMING128
    assert fec.fec_from_name("v27") == fec.FEC_CONV_V27
    with pytest.raises(ValueError):
        fec.fec_from_name("nope")
    for s in BLOCK_SCHEMES + CONV_SCHEMES:
        assert fec.fec_from_name(fec.fec_name(s)) == s


def test_batched_block_decode():
    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, size=(4, 16), dtype=np.uint8)
    enc = fec.fec_encode(fec.FEC_HAMMING128, jnp.asarray(data))
    dec = fec.fec_decode(fec.FEC_HAMMING128, enc, 16)
    np.testing.assert_array_equal(np.asarray(dec), data)


@pytest.mark.slow
def test_rs8_roundtrip_and_correction():
    """RS(255,223): multi-block roundtrip + up to 16 byte errors/block."""
    rng = np.random.default_rng(8)
    for n in (10, 223, 300, 500):
        data = rng.integers(0, 256, n, dtype=np.uint8)
        enc = fec.fec_encode(fec.FEC_RS8, jnp.asarray(data))
        assert enc.shape[-1] == fec.encoded_length(fec.FEC_RS8, n)
        dec = fec.fec_decode(fec.FEC_RS8, enc, n)
        np.testing.assert_array_equal(np.asarray(dec), data)
        # inject 12 byte errors into the first block
        bad = np.asarray(enc).copy()
        first_block = min(n, 223) + 32
        pos = rng.choice(first_block, size=min(12, first_block), replace=False)
        for p in pos:
            bad[p] ^= int(rng.integers(1, 256))
        dec2 = fec.fec_decode(fec.FEC_RS8, jnp.asarray(bad), n)
        np.testing.assert_array_equal(np.asarray(dec2), data)


def test_rs8_name():
    assert fec.fec_from_name("rs8") == fec.FEC_RS8


@pytest.mark.parametrize("scheme", [
    fec.FEC_CONV_V39, fec.FEC_CONV_V27P23, fec.FEC_CONV_V27P34,
    fec.FEC_CONV_V27P56, fec.FEC_CONV_V27P78, fec.FEC_CONV_V29P23,
    fec.FEC_CONV_V29P45, fec.FEC_CONV_V29P67,
])
def test_conv_variants_roundtrip(scheme):
    rng = np.random.default_rng(scheme)
    data = rng.integers(0, 256, 24, dtype=np.uint8)
    enc = fec.fec_encode(scheme, jnp.asarray(data))
    assert enc.shape[-1] == fec.encoded_length(scheme, 24)
    dec = fec.fec_decode(scheme, enc, 24)
    np.testing.assert_array_equal(np.asarray(dec), data)


def test_punctured_corrects_errors():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 32, dtype=np.uint8)
    enc = np.asarray(fec.fec_encode(fec.FEC_CONV_V27P23, jnp.asarray(data)))
    nbits = enc.shape[0] * 8
    bad = _flip_bits(enc, list(range(5, nbits - 16, 60)))
    dec = fec.fec_decode(fec.FEC_CONV_V27P23, jnp.asarray(bad), 32)
    np.testing.assert_array_equal(np.asarray(dec), data)


def test_v615_roundtrip():
    """K=15 rate-1/6 deep-space code (16384-state trellis)."""
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, 8, dtype=np.uint8)
    enc = fec.fec_encode(fec.FEC_CONV_V615, jnp.asarray(data))
    dec = fec.fec_decode(fec.FEC_CONV_V615, enc, 8)
    np.testing.assert_array_equal(np.asarray(dec), data)


def test_soft_viterbi_beats_hard():
    """Soft-decision Viterbi decodes noise levels where hard decode fails."""
    from liquid_usrp_tpu.ops import conv
    rng = np.random.default_rng(4)
    data = rng.integers(0, 256, 64, dtype=np.uint8)
    enc = np.asarray(fec.fec_encode(fec.FEC_CONV_V27, jnp.asarray(data)))
    bits = np.unpackbits(enc).astype(np.float32)
    nbits = (64 * 8 + 6) * 2
    # BPSK channel around the hard/soft crossover; deterministic trials
    tx = 2 * bits[:nbits] - 1
    soft_fails = hard_fails = 0
    for _ in range(5):
        rx = tx + rng.normal(size=nbits) * 0.7
        soft = np.asarray(conv.conv_decode_soft(
            fec.FEC_CONV_V27, jnp.asarray(rx, dtype=jnp.float32), 64))
        hard_bytes = np.packbits((rx > 0).astype(np.uint8))
        hard = np.asarray(fec.fec_decode(
            fec.FEC_CONV_V27, jnp.asarray(hard_bytes), 64))
        soft_fails += int((soft != data).any())
        hard_fails += int((hard != data).any())
    assert soft_fails == 0, soft_fails
    assert hard_fails >= 2, hard_fails


@pytest.mark.slow
def test_rs_conv_batched_dispatch():
    """fec_decode honors its documented [..., n] contract for the 1-D
    RS/Viterbi cores by auto-vmapping the batch axes."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    for s in (fec.FEC_RS8, fec.FEC_CONV_V27):
        data = rng.integers(0, 256, (3, 20), dtype=np.uint8)
        enc = jax.vmap(lambda d: fec.fec_encode(s, d))(jnp.asarray(data))
        dec = fec.fec_decode(s, enc, 20)
        assert dec.shape == (3, 20)
        np.testing.assert_array_equal(np.asarray(dec), data)
