"""Virtual air: connects transceiver endpoints through a derived channel.

The reference's duplex apps tune two real radios and the air supplies the
impairments (462 MHz defaults, +100 MHz RX offset in fullduplex_txrx,
/root/reference/src/fullduplex_txrx.cc:71).  The virtual air derives the
channel between two endpoints from their ``RadioConfig``s:

* carrier frequency mismatch -> CFO in radians/sample at the RX rate,
* TX soft gain is already applied by the transmitter; UHD gains become a
  link budget scale,
* AWGN at a configurable link SNR.

This closes the loop for duplex experiments without hand-specifying
``--cfo`` flags: mistune one radio and the synchronizer must recover it,
exactly like over-the-air operation.
"""
from __future__ import annotations

import numpy as np

__all__ = ["VirtualAir"]


class VirtualAir:
    """Impairment channel between two transceiver endpoints."""

    def __init__(self, snr_db: float = 40.0, delay: int = 0, seed: int = 0):
        self.snr_db = snr_db
        self.delay = delay
        self._seed = seed
        self._uses = 0

    def propagate(self, tx_radio, rx_radio, samples: np.ndarray,
                  ppm_error: float = 0.0) -> np.ndarray:
        """Carry ``samples`` from a TX front-end to an RX front-end.

        ``tx_radio``/``rx_radio``: RadioConfig-like objects (``tx_freq``,
        ``rx_freq``, ``rx_rate`` attributes).  Frequency mistuning between
        the endpoints becomes CFO; ``ppm_error`` adds reference-oscillator
        offset on top (ppm of the carrier).
        """
        import jax
        import jax.numpy as jnp
        from .channel_model import Channel, channel_apply

        f_err = (tx_radio.tx_freq - rx_radio.rx_freq +
                 tx_radio.tx_freq * ppm_error * 1e-6)
        cfo = 2.0 * np.pi * f_err / rx_radio.rx_rate
        power = (float(np.mean(np.abs(samples) ** 2))
                 if samples.size else 1.0) or 1.0
        ch = Channel(snr_db=self.snr_db, cfo=float(cfo), delay=self.delay)
        self._uses += 1
        key = jax.random.PRNGKey(self._seed + self._uses)
        return np.asarray(channel_apply(ch, key, jnp.asarray(samples),
                                        signal_power=power))
