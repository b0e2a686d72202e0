"""End-to-end app-pair tests: the reference's paired-loopback validation
idiom (SURVEY.md §4.1) over IQ files and virtual-air channels."""
import io
import contextlib

import numpy as np
import pytest


def _capture(fn, argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = fn(argv)
    return rc, buf.getvalue()


def test_flexframe_pair(tmp_path):
    from liquid_usrp_tpu.apps import flexframe_rx, flexframe_tx
    f = str(tmp_path / "flex.iq")
    rc, _ = _capture(flexframe_tx.main,
                     ["-o", f, "-N", "3", "-P", "80", "-r", "2.0"])
    assert rc == 0
    rc, out = _capture(flexframe_rx.main,
                       ["-i", f, "-r", "0.5", "-p", "256",
                        "--snr", "25"])
    assert rc == 0
    assert "valid packets       :      3 (100.00%)" in out


def test_packet_pair(tmp_path):
    from liquid_usrp_tpu.apps import packet_rx, packet_tx
    f = str(tmp_path / "pkt.iq")
    rc, _ = _capture(packet_tx.main, ["-o", f, "-N", "2", "-r", "2.0"])
    assert rc == 0
    rc, out = _capture(packet_rx.main,
                       ["-i", f, "-r", "0.5", "-p", "256"])
    assert rc == 0
    assert "valid packets       :      2 (100.00%)" in out


def test_gmsk_pair(tmp_path):
    from liquid_usrp_tpu.apps import gmskframe_rx, gmskframe_tx
    f = str(tmp_path / "gmsk.iq")
    rc, _ = _capture(gmskframe_tx.main,
                     ["-o", f, "-N", "2", "-P", "100"])
    assert rc == 0
    rc, out = _capture(gmskframe_rx.main,
                       ["-i", f, "-p", "256", "--snr", "22"])
    assert rc == 0
    assert "valid packets       :      2 (100.00%)" in out
    assert "packet error rate" in out


def test_multichannel_pair(tmp_path):
    from liquid_usrp_tpu.apps import multichannel_rx, multichannel_tx
    f = str(tmp_path / "mc.iq")
    rc, _ = _capture(multichannel_tx.main,
                     ["-o", f, "-n", "2", "-N", "1", "-P", "64"])
    assert rc == 0
    rc, out = _capture(multichannel_rx.main, ["-i", f, "-n", "2"])
    assert rc == 0
    assert "valid packets       :      2 (100.00%)" in out


def test_narrowband_asgram_rssi(tmp_path):
    from liquid_usrp_tpu.apps import asgram_rx, narrowband_tx, rssi
    f = str(tmp_path / "nb.iq")
    rc, out = _capture(narrowband_tx.main,
                       ["-o", f, "-n", "2048", "-t", "rrcos"])
    assert rc == 0
    rc, out = _capture(asgram_rx.main, ["-i", f, "-L", "4"])
    assert rc == 0
    assert "peak:" in out
    m = str(tmp_path / "rssi_log.m")
    rc, out = _capture(rssi.main, ["-i", f, "-L", "2048", "-o", m])
    assert rc == 0
    assert "rssi =" in out
    assert "figure; plot(rssi)" in open(m).read()


def test_halfduplex(tmp_path):
    from liquid_usrp_tpu.apps import halfduplex_txrx
    rc, out = _capture(halfduplex_txrx.main,
                       ["-N", "2", "-P", "32", "--snr", "30"])
    assert rc == 0
    assert "2/2 delivered" in out


def test_usage_screens():
    """Every app prints usage with -h and exits 0 (getopt parity)."""
    from liquid_usrp_tpu.apps import (asgram_rx, flexframe_rx, flexframe_tx,
                                      fullduplex_txrx, gmskframe_rx,
                                      gmskframe_tx, halfduplex_txrx,
                                      multichannel_rx, multichannel_tx,
                                      multichannel_txrx, narrowband_tx,
                                      ofdmflexframe_rx, ofdmflexframe_tx,
                                      packet_rx, packet_tx, rssi)
    for mod in (asgram_rx, flexframe_rx, flexframe_tx, fullduplex_txrx,
                gmskframe_rx, gmskframe_tx, halfduplex_txrx,
                multichannel_rx, multichannel_tx, multichannel_txrx,
                narrowband_tx, ofdmflexframe_rx, ofdmflexframe_tx,
                packet_rx, packet_tx, rssi):
        rc, out = _capture(mod.main, ["-h"])
        assert rc == 0, mod.__name__
        assert "usage" in out or "options" in out, mod.__name__
