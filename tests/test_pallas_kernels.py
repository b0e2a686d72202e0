"""Pallas kernel validation against the jnp reference (interpret mode)."""
import numpy as np
import pytest

import jax.numpy as jnp

from liquid_usrp_tpu.framing import ofdm, ofdm_sync
from liquid_usrp_tpu.ops.pallas_kernels import (detect_metric_fused,
                                                detect_metric_fused_2d,
                                                detect_metric_onepass)


def _loaded_ext(sync, params, rng):
    props = ofdm.default_props()
    frame = np.asarray(ofdm.assemble_frame(
        params, props,
        jnp.asarray(rng.integers(0, 256, 8, dtype=np.uint8)),
        jnp.asarray(rng.integers(0, 256, 64, dtype=np.uint8))))
    ext = np.zeros(sync.overlap + 4096, np.complex64)
    ext[2000:2000 + len(frame)] = frame
    ext += 0.02 * (rng.normal(size=len(ext)) +
                   1j * rng.normal(size=len(ext)))
    return jnp.asarray(ext.astype(np.complex64))


@pytest.mark.parametrize("fused", [detect_metric_fused,
                                   detect_metric_fused_2d,
                                   detect_metric_onepass])
def test_detect_metric_matches_reference(fused):
    params = ofdm.make_ofdm_params(48, 6, 4)
    _check_detect(fused, params)


@pytest.mark.parametrize("M,cp", [(64, 8), (128, 16), (256, 32)])
def test_onepass_large_m(M, cp):
    """The one-pass kernel generalizes past span+lag=128 via whole-row
    rolls (fused_2d cannot): exercise every production-scale M."""
    _check_detect(detect_metric_onepass, ofdm.make_ofdm_params(M, cp, 4))


def _check_detect(fused, params):
    sync = ofdm_sync.make_sync(params, block_size=4096, max_payload=128,
                               max_frames=4)
    rng = np.random.default_rng(0)
    ext = _loaded_ext(sync, params, rng)

    want_m, want_c = ofdm_sync._detect_metric(sync, ext)
    M = params.M
    lag = M // 4
    span = ofdm.NUM_S0 * M - lag
    got_m, got_c = fused(ext, lag, span, interpret=True)
    # float32 cumsum association noise: tolerance is on the metric's
    # 0..1 scale; detection thresholds at 0.5
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               atol=2e-3)
