"""Model-layer surface tests: batched TX, rx transform hook, write_symbol."""
import numpy as np
import pytest

import jax.numpy as jnp

from liquid_usrp_tpu.framing import ofdm
from liquid_usrp_tpu.models.ofdmtxrx import OfdmTxRx


@pytest.mark.slow
def test_batched_assembly_matches_single():
    params = ofdm.make_ofdm_params(48, 6, 4)
    props = ofdm.default_props()
    rng = np.random.default_rng(0)
    headers = rng.integers(0, 256, (3, 8), dtype=np.uint8)
    payloads = rng.integers(0, 256, (3, 100), dtype=np.uint8)
    batch = np.asarray(ofdm.assemble_frames(
        params, props, jnp.asarray(headers), jnp.asarray(payloads)))
    for i in range(3):
        single = np.asarray(ofdm.assemble_frame(
            params, props, jnp.asarray(headers[i]),
            jnp.asarray(payloads[i])))
        np.testing.assert_allclose(batch[i], single, atol=1e-6)


def test_rx_transform_hook():
    """The composable mid-pipeline transform (blocking-RX handshake parity):
    a transform that derotates a known phase lets an intentionally rotated
    stream decode."""
    phase = 1.3
    calls = []

    def derotate(blk):
        calls.append(1)
        return blk * np.exp(-1j * phase).astype(np.complex64)

    txrx = OfdmTxRx(max_payload=256, rx_transform=derotate)
    rng = np.random.default_rng(1)
    header = rng.integers(0, 256, 8, dtype=np.uint8)
    payload = rng.integers(0, 256, 64, dtype=np.uint8)
    air = txrx.transmit_packet(header, payload)
    txrx.drain_tx()
    air = air * np.exp(1j * phase).astype(np.complex64)
    txrx.start_rx()
    frames = txrx.run_rx(air, flush=True)
    assert calls, "transform not invoked"
    ok = [f for f in frames if f["payload_valid"]]
    assert len(ok) == 1
    np.testing.assert_array_equal(ok[0]["payload"], payload)


def test_write_symbol_drains_whole_frame():
    txrx = OfdmTxRx(max_payload=256)
    rng = np.random.default_rng(2)
    header = rng.integers(0, 256, 8, dtype=np.uint8)
    payload = rng.integers(0, 256, 64, dtype=np.uint8)
    whole = txrx.transmit_packet(header, payload)
    txrx.drain_tx()
    txrx.assemble_frame(header, payload)
    chunks = []
    while True:
        c, last = txrx.write_symbol()
        chunks.append(c)
        if last:
            break
    np.testing.assert_allclose(np.concatenate(chunks), whole, atol=1e-6)


def test_symbol_tx_reset_and_end_transmit_frame():
    """reset_tx drops queued + partial frames; end_transmit_frame drains
    the remainder in one chunk (lib/ofdmtxrx.cc:290-294, 437-449)."""
    txrx = OfdmTxRx(max_payload=256)
    rng = np.random.default_rng(3)
    header = rng.integers(0, 256, 8, dtype=np.uint8)
    payload = rng.integers(0, 256, 64, dtype=np.uint8)
    whole = txrx.transmit_packet(header, payload)
    txrx.assemble_frame(header, payload)
    c0, last = txrx.write_symbol()
    assert not last
    rest = txrx.end_transmit_frame()
    np.testing.assert_allclose(np.concatenate([c0, rest]), whole,
                               atol=1e-6)
    assert len(txrx.end_transmit_frame()) == 0      # idempotent drain
    # reset_tx drops both the packet queue and a partial assembly
    txrx.assemble_frame(header, payload)
    txrx.write_symbol()
    txrx.reset_tx()
    assert len(txrx.drain_tx()) == 0
    with pytest.raises(RuntimeError):
        txrx.write_symbol()


def test_debug_capture_roundtrip(tmp_path):
    """debug_enable retains the last RX block; debug_print writes the
    octave dump (the ofdmflexframesync_debug_print surface)."""
    txrx = OfdmTxRx(max_payload=256, block_size=2048)
    txrx.set_tx_antenna("TX/RX")
    txrx.set_rx_antenna("RX2")
    assert txrx.radio.tx_antenna == "TX/RX"
    txrx.debug_enable()
    txrx.start_rx()
    rng = np.random.default_rng(4)
    noise = (0.1 * (rng.normal(size=4096) + 1j * rng.normal(size=4096))
             ).astype(np.complex64)
    txrx.run_rx(noise)
    path = txrx.debug_print(str(tmp_path / "cap"))
    text = open(path).read()
    assert "metric = [" in text and "x = [" in text
    txrx.debug_disable()
    with pytest.raises(RuntimeError):
        txrx.debug_print(str(tmp_path / "cap2"))


def test_virtual_air_frequency_mistuning():
    """Mistuned radios: the air derives CFO from the RadioConfigs and the
    synchronizer recovers it (the fullduplex over-the-air idiom)."""
    from liquid_usrp_tpu.io.radio import VirtualAir
    a = OfdmTxRx(max_payload=256)
    b = OfdmTxRx(max_payload=256)
    a.set_tx_freq(462.0e6 + 200.0)     # 200 Hz mistuning at 500 kS/s
    b.set_rx_freq(462.0e6)
    air = VirtualAir(snr_db=30.0)
    rng = np.random.default_rng(0)
    header = rng.integers(0, 256, 8, dtype=np.uint8)
    payload = rng.integers(0, 256, 64, dtype=np.uint8)
    tx = a.transmit_packet(header, payload)
    a.drain_tx()
    rx_samples = air.propagate(a.radio, b.radio, tx)
    b.start_rx()
    frames = b.run_rx(rx_samples, flush=True)
    ok = [f for f in frames if f["payload_valid"]]
    assert len(ok) == 1
    np.testing.assert_array_equal(ok[0]["payload"], payload)
    expected_cfo = 2 * np.pi * 200.0 / 500e3
    np.testing.assert_allclose(ok[0]["stats"]["cfo"], expected_cfo,
                               atol=5e-4)


@pytest.mark.slow
def test_run_rx_batched_dispatch_matches_per_block():
    """run_rx with batch_blocks>1 (sync_blocks_batched dispatch) returns the
    same frames as per-block stepping on a multi-frame stream spanning many
    blocks."""
    rng = np.random.default_rng(3)
    tx = OfdmTxRx(max_payload=256, block_size=8192)
    bursts = []
    truth = []
    for i in range(6):
        header = rng.integers(0, 256, 8, dtype=np.uint8)
        payload = rng.integers(0, 256, 96, dtype=np.uint8)
        truth.append((header, payload))
        bursts.append(tx.transmit_packet(header, payload))
        bursts.append(np.zeros(3000, np.complex64))
    tx.drain_tx()
    air = np.concatenate(bursts)
    air = air + (0.02 * (rng.normal(size=air.shape) +
                         1j * rng.normal(size=air.shape))).astype(np.complex64)

    def decode(batch_blocks, chunks):
        rx = OfdmTxRx(max_payload=256, block_size=8192,
                      batch_blocks=batch_blocks)
        rx.start_rx()
        frames = []
        for lo in range(0, len(air), chunks):
            frames += rx.run_rx(air[lo:lo + chunks])
        frames += rx.run_rx(np.zeros(0, np.complex64), flush=True)
        return [f for f in frames if f["payload_valid"]]

    seq = decode(1, 40000)
    bat = decode(4, 40000)
    assert len(seq) == 6 and len(bat) == 6
    for s, b in zip(seq, bat):
        assert s["t"] == b["t"]
        np.testing.assert_array_equal(s["payload"], b["payload"])
        np.testing.assert_array_equal(s["header"], b["header"])
        assert s["stats"] == b["stats"]
    for (h, p), f in zip(truth, sorted(bat, key=lambda r: r["t"])):
        np.testing.assert_array_equal(f["payload"], p)


@pytest.mark.slow
def test_run_rx_ingest_formats_decode_identically():
    """rx_ingest="bf16" and "sc8" recover the same frames payload-exact
    as the complex64 path (quantization floors far above channel SNR)."""
    rng = np.random.default_rng(7)
    tx = OfdmTxRx(max_payload=128, block_size=8192)
    header = rng.integers(0, 256, 8, dtype=np.uint8)
    payload = rng.integers(0, 256, 80, dtype=np.uint8)
    burst = tx.transmit_packet(header, payload)
    tx.drain_tx()
    air = np.concatenate([np.zeros(2000, np.complex64), burst,
                          np.zeros(2000, np.complex64)])
    air = air + (0.01 * (rng.normal(size=air.shape) +
                         1j * rng.normal(size=air.shape))
                 ).astype(np.complex64)
    air = air / np.abs(np.stack([air.real, air.imag])).max()  # sc8 AGC

    def decode(ingest):
        rx = OfdmTxRx(max_payload=128, block_size=8192, rx_ingest=ingest)
        rx.start_rx()
        frames = rx.run_rx(air, flush=True)
        return [f for f in frames if f["payload_valid"]]

    for ingest in ("c64", "bf16", "sc8"):
        frames = decode(ingest)
        assert len(frames) == 1, ingest
        np.testing.assert_array_equal(frames[0]["payload"], payload)
        np.testing.assert_array_equal(frames[0]["header"], header)
