"""Pallas kernel validation against the jnp reference (interpret mode)."""
import numpy as np
import pytest

import jax.numpy as jnp

from liquid_usrp_tpu.framing import ofdm, ofdm_sync
from liquid_usrp_tpu.ops.pallas_kernels import (detect_candidates_onepass,
                                                detect_metric_fused,
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


@pytest.mark.parametrize("M,cp", [(48, 6), (128, 16)])
def test_fused_candidates_match_xla(M, cp):
    """detect_candidates_onepass == _detect_metric + _find_candidates
    (detected mask exact; plateau argmax within a few samples; c_at
    within kernel tolerance)."""
    params = ofdm.make_ofdm_params(M, cp, 4)
    sync = ofdm_sync.make_sync(params, block_size=4096, max_payload=128,
                               max_frames=4)
    rng = np.random.default_rng(2)
    ext = _loaded_ext(sync, params, rng)

    metric, c = ofdm_sync._detect_metric(sync, ext)
    want_det, want_locs = ofdm_sync._find_candidates(sync, metric)
    want_c = c[jnp.clip(want_locs, 0, c.shape[0] - 1)]

    d = M // 4
    L = ofdm.NUM_S0 * M - d
    vals, locs, c_at = detect_candidates_onepass(
        ext, d, L, M, sync.block_size, sync.threshold, sync.max_frames,
        interpret=True)
    got_det = np.asarray(vals > 0)
    np.testing.assert_array_equal(got_det, np.asarray(want_det))
    assert got_det.any()
    for i in np.nonzero(got_det)[0]:
        assert abs(int(locs[i]) - int(want_locs[i])) <= 3, \
            (int(locs[i]), int(want_locs[i]))
        scale = float(jnp.abs(want_c[i]))
        assert float(jnp.abs(c_at[i] - want_c[i])) < 5e-3 * scale


@pytest.mark.slow
def test_sync_block_fused_pallas_end_to_end():
    """Full sync_block with use_pallas=2 (interpret) decodes payload-
    exact and finds the same frames as the XLA path."""
    params = ofdm.make_ofdm_params(48, 6, 4)
    rng = np.random.default_rng(3)
    header = rng.integers(0, 256, 8, dtype=np.uint8)
    payload = rng.integers(0, 256, 96, dtype=np.uint8)
    frame = np.asarray(ofdm.assemble_frame(
        params, ofdm.default_props(), jnp.asarray(header),
        jnp.asarray(payload)))
    results = {}
    for up in (0, 2):
        sync = ofdm_sync.make_sync(params, block_size=4096,
                                   max_payload=128, max_frames=4,
                                   use_pallas=up)
        stream = np.zeros(3 * sync.block_size, np.complex64)
        stream[2500:2500 + len(frame)] = frame
        stream += 0.02 * (rng.standard_normal(len(stream)) +
                          1j * rng.standard_normal(len(stream))
                          ).astype(np.complex64)
        st = ofdm_sync.sync_init(sync)
        rows = []
        for b in range(3 + sync.overlap // sync.block_size + 1):
            blk = (stream[b * 4096:(b + 1) * 4096]
                   if b < 3 else np.zeros(4096, np.complex64))
            st, r = ofdm_sync.sync_block(sync, st, jnp.asarray(blk))
            for k in range(sync.max_frames):
                if r.payload_valid[k]:
                    rows.append((int(r.t_start[k]),
                                 np.asarray(r.payload[k])
                                 [: int(r.payload_len[k])]))
        results[up] = rows
    assert len(results[0]) == len(results[2]) == 1
    np.testing.assert_array_equal(results[2][0][1], payload)
    assert abs(results[0][0][0] - results[2][0][0]) <= 3


@pytest.mark.slow
def test_batched_dispatch_composes_with_fused_kernel():
    """sync_blocks_batched vmaps the detect front-end over the block
    axis; with use_pallas=2 that is a vmap over the fused Mosaic
    pallas_call (batching rule must hold) — the frame still decodes
    payload-exact."""
    import numpy as np
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    params = ofdm.make_ofdm_params(48, 6, 4)
    sync = ofdm_sync.make_sync(params, block_size=4096, max_payload=64,
                               max_frames=2, use_pallas=2)
    rng = np.random.default_rng(2)
    h = rng.integers(0, 256, 8, dtype=np.uint8)
    p = rng.integers(0, 256, 40, dtype=np.uint8)
    f = np.asarray(ofdm.assemble_frame(
        params, ofdm.default_props(), jnp.asarray(h), jnp.asarray(p)))
    stream = np.zeros(3 * 4096, np.complex64)
    stream[500:500 + len(f)] = f
    _, res = ofdm_sync.sync_blocks_batched(
        sync, ofdm_sync.sync_init(sync),
        jnp.asarray(stream.reshape(3, 4096)))
    ok = np.nonzero(np.asarray(res.payload_valid))
    assert len(ok[0]) == 1
    b, k = int(ok[0][0]), int(ok[1][0])
    np.testing.assert_array_equal(
        np.asarray(res.payload[b, k])[:40], p)


def test_xcorr_onepass_matches_xla_metric():
    """The segmented-xcorr Mosaic kernel (the PRODUCTION detector as a
    one-pass kernel) matches ofdm_sync._detect_metric_xcorr to f32/FFT
    rounding across M configs, same peak."""
    import numpy as np
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    from liquid_usrp_tpu.framing.ofdm_sync import NUM_S0, _xc_span
    from liquid_usrp_tpu.ops.pallas_kernels import \
        detect_metric_xcorr_onepass
    for M, cp, tp, bs in ((48, 6, 4, 8192), (16, 4, 2, 2048)):
        params = ofdm.make_ofdm_params(M, cp, tp)
        sync = ofdm_sync.make_sync(params, block_size=bs, max_payload=64,
                                   max_frames=4)
        rng = np.random.default_rng(M)
        h = rng.integers(0, 256, 8, dtype=np.uint8)
        p = rng.integers(0, 256, 48, dtype=np.uint8)
        w = np.asarray(ofdm.assemble_frame(
            params, ofdm.default_props(), jnp.asarray(h), jnp.asarray(p)))
        buf = np.zeros(bs + sync.overlap, np.complex64)
        buf[1500:1500 + len(w)] = w
        buf += 0.02 * (rng.normal(size=len(buf)) +
                       1j * rng.normal(size=len(buf))
                       ).astype(np.complex64)
        ext = jnp.asarray(buf)
        ref = np.asarray(ofdm_sync._detect_metric_xcorr(sync, ext))
        tmpl = np.tile(np.asarray(params.s0_time), NUM_S0)
        got = np.asarray(detect_metric_xcorr_onepass(
            ext, tmpl, _xc_span(len(tmpl)), len(ref), interpret=True))
        assert np.abs(got - ref).max() < 2e-3
        assert got.argmax() == ref.argmax()


def test_use_pallas1_xcorr_decodes_identically():
    """use_pallas=1 with xcorr_detect routes detection through the
    Mosaic xcorr kernel and must decode the same frame payload-exact at
    the same offset as the XLA path."""
    import numpy as np
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    params = ofdm.make_ofdm_params(48, 6, 4)
    rng = np.random.default_rng(7)
    h = rng.integers(0, 256, 8, dtype=np.uint8)
    p = rng.integers(0, 256, 40, dtype=np.uint8)
    f = np.asarray(ofdm.assemble_frame(
        params, ofdm.default_props(), jnp.asarray(h), jnp.asarray(p)))
    stream = np.zeros(3 * 4096, np.complex64)
    stream[700:700 + len(f)] = f
    stream += (0.01 * (rng.normal(size=len(stream)) +
                       1j * rng.normal(size=len(stream)))
               ).astype(np.complex64)
    rows = {}
    for up in (0, 1):
        sync = ofdm_sync.make_sync(params, block_size=4096, max_payload=64,
                                   max_frames=2, use_pallas=up)
        st = ofdm_sync.sync_init(sync)
        got = []
        for b in range(3 + sync.overlap // 4096 + 1):
            blk = stream[b * 4096:(b + 1) * 4096] if b < 3 else \
                np.zeros(4096, np.complex64)
            st, r = ofdm_sync.sync_block(sync, st, jnp.asarray(blk))
            for k in range(sync.max_frames):
                if r.payload_valid[k]:
                    got.append((int(r.t_start[k]),
                                np.asarray(r.payload[k])[:40]))
        rows[up] = got
    assert len(rows[0]) == len(rows[1]) == 1
    assert rows[0][0][0] == rows[1][0][0] == 700
    np.testing.assert_array_equal(rows[1][0][1], p)
