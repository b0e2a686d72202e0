"""Planar-complex transform tests (ops/planar.py).

The planar path must agree with the complex path: float outputs to
re-association tolerance, integer decode outputs (frame counts, payload
fingerprints, carried counters) **exactly**.  The integration tests run
the real OFDM flexframe synchronizer and the flagship mcrx pipeline both
ways on the same loaded stream.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from liquid_usrp_tpu.ops.planar import (Planar, from_planar, planarize,
                                        to_planar)


def _rc(rng, *shape):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


def _assert_close(ref, got, tol):
    for r, g in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        r, g = np.asarray(r), np.asarray(g)
        if r.dtype.kind in "fc":
            scale = max(np.abs(r).max(), 1e-12)
            assert np.abs(r - g).max() / scale < tol, (
                f"rel err {np.abs(r - g).max() / scale:.3g}")
        else:
            assert np.array_equal(r, g)


def _check(fn, *args, tol=1e-5):
    ref = jax.jit(fn)(*args)
    got = from_planar(jax.jit(planarize(fn))(*to_planar(args)))
    _assert_close(ref, got, tol)


CASES = {
    "mul": lambda a, b: a * b,
    "div": lambda a, b: a / b,
    "conj_mix": lambda a, b: jnp.conj(a) * b + 1j * a,
    "exp_phase": lambda a, b: jnp.exp(1j * jnp.real(a)) * b,
    "abs_angle": lambda a, b: (jnp.abs(a), jnp.angle(a * b)),
    "power2": lambda a, b: a ** 2 + b ** 2,
    "matvec": lambda a, b: jnp.outer(a, b) @ jnp.conj(b),
    "where": lambda a, b: jnp.where(jnp.real(a) > 0, a, 1j * b),
    "reductions": lambda a, b: (jnp.sum(a), jnp.cumsum(b), jnp.mean(a * b)),
    "structural": lambda a, b: jnp.concatenate(
        [jnp.pad(a, (2, 1)), b[::-1]])[jnp.arange(0, 16, 2)],
    "nested_jit": lambda a, b: jax.jit(lambda v: v * (0.5 - 2j))(a + b),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_planar_elementary(name):
    rng = np.random.default_rng(hash(name) % (1 << 32))
    _check(CASES[name], _rc(rng, 16), _rc(rng, 16))


@pytest.mark.parametrize("n,tol", [(8, 1e-5), (48, 1e-5), (64, 1e-5),
                                   (500, 2e-5), (1024, 5e-5),
                                   (65536, 3e-4)])
def test_planar_fft_roundtrip(n, tol):
    rng = np.random.default_rng(n)
    x = _rc(rng, 3, n)
    _check(lambda a: jnp.fft.fft(a, axis=-1), x, tol=tol)
    _check(lambda a: jnp.fft.ifft(a, axis=-1), x, tol=tol)


def test_planar_control_flow():
    rng = np.random.default_rng(7)
    c0, xs = _rc(rng), _rc(rng, 12)

    def scan_fn(c, xs):
        def body(carry, x):
            return carry * x + 0.1j, jnp.abs(carry)
        return lax.scan(body, c, xs)
    _check(scan_fn, c0, xs)

    def cond_fn(a):
        return lax.cond(jnp.real(a).sum() > 0,
                        lambda v: v * 2.0, lambda v: jnp.conj(v), a)
    _check(cond_fn, xs)

    def while_fn(a):
        def body(st):
            i, v = st
            return i + 1, v * a[0]
        return lax.while_loop(lambda st: st[0] < 5, body,
                              (jnp.int32(0), a))[1]
    _check(while_fn, xs)


def test_planar_int_outputs_exact():
    rng = np.random.default_rng(3)
    x = _rc(rng, 64)

    def fn(a):
        m = jnp.abs(a)
        return jnp.argmax(m), (m > 1.0).sum(), jnp.argsort(m)[:4]
    ref = jax.jit(fn)(x)
    got = from_planar(jax.jit(planarize(fn))(*to_planar((x,))))
    for r, g in zip(ref, got):
        assert np.array_equal(np.asarray(r), np.asarray(g))


def test_planar_tree_roundtrip():
    rng = np.random.default_rng(5)
    tree = {"a": _rc(rng, 4), "b": np.arange(3), "c": [_rc(rng, 2, 2), 1.5]}
    p = to_planar(tree)
    assert isinstance(p["a"], Planar)
    assert p["b"] is tree["b"]
    back = from_planar(p)
    np.testing.assert_array_equal(back["a"], tree["a"])
    np.testing.assert_array_equal(back["c"][0], tree["c"][0])


def test_planar_ofdm_sync_block_decodes_equal():
    """Single-channel OFDM sync: planar path decodes the same frames with
    identical payload bytes and validity flags."""
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync

    params = ofdm.make_ofdm_params(M=48, cp_len=6, taper_len=4)
    sync = ofdm_sync.make_sync(params, block_size=8192, max_payload=256,
                               max_frames=4)
    props = ofdm.default_props()
    rng = np.random.default_rng(11)
    hdr = rng.integers(0, 256, 8, dtype=np.uint8)
    pay = rng.integers(0, 256, 200, dtype=np.uint8)
    w = np.asarray(ofdm.assemble_frame(params, props, jnp.asarray(hdr),
                                       jnp.asarray(pay)))
    stream = np.zeros(2 * sync.block_size, np.complex64)
    stream[700:700 + len(w)] = w
    noise = (rng.standard_normal(stream.shape)
             + 1j * rng.standard_normal(stream.shape)).astype(np.complex64)
    blocks = (stream + 0.005 * noise).reshape(2, sync.block_size)

    def run(state, blocks):
        def body(st, b):
            st, res = ofdm_sync.sync_block(sync, st, b)
            return st, (res.payload_valid, res.payload, res.header_valid)
        return lax.scan(body, state, blocks)

    state = ofdm_sync.sync_init(sync)
    _, (ref_ok, ref_pay, ref_hok) = jax.jit(run)(state, blocks)
    _, (p_ok, p_pay, p_hok) = jax.jit(planarize(run))(
        *to_planar((state, blocks)))
    assert np.array_equal(np.asarray(ref_ok), np.asarray(p_ok))
    assert np.array_equal(np.asarray(ref_hok), np.asarray(p_hok))
    # payload bytes of the valid rows must agree exactly
    ok = np.asarray(ref_ok)
    assert ok.sum() >= 1
    np.testing.assert_array_equal(
        np.asarray(ref_pay)[ok], np.asarray(p_pay)[ok])


@pytest.mark.slow
def test_planar_mcrx_fingerprints_exact():
    """Flagship pipeline (NCO -> PFB -> vmapped N-channel sync): planar
    decode counts and payload fingerprints equal the complex path."""
    from bench import _build_loaded_mixture
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    from liquid_usrp_tpu.models.multichannel import make_mcrx_batched_step

    N = 4
    params = ofdm.make_ofdm_params(M=48, cp_len=6, taper_len=4)
    sync = ofdm_sync.make_sync(params, block_size=8192, max_payload=512,
                               max_frames=8)
    init_state, step = make_mcrx_batched_step(N, sync, 2)
    state = init_state()
    g = 2 * N * sync.block_size * 2
    rng = np.random.default_rng(0)
    weights = rng.integers(0, 1 << 32, sync.max_payload, dtype=np.uint32)

    def run_fn(state, blocks):
        w = jnp.asarray(weights)

        def body(st, x):
            st, res = step(st, x)
            ok = res.payload_valid
            row_fp = jnp.sum(res.payload.astype(jnp.uint32) * w, axis=-1)
            red = tuple(range(1, ok.ndim))
            fp = jnp.sum(jnp.where(ok, row_fp, 0), axis=red)
            return st, (jnp.sum(ok, axis=red).astype(jnp.int32), fp)
        return lax.scan(body, state, blocks)

    props = ofdm.default_props()
    margin = sync.overlap + 8 * params.M
    total = 2 * sync.block_size * 2
    mixture, _ = _build_loaded_mixture(N, params, props, 300, total, margin,
                                       np.random.default_rng(0))
    noise = (rng.standard_normal(mixture.shape)
             + 1j * rng.standard_normal(mixture.shape)).astype(np.complex64)
    blocks = (mixture + 0.01 * noise).reshape(2, g)

    _, (ref_cnt, ref_fp) = jax.jit(run_fn)(state, blocks)
    _, (p_cnt, p_fp) = jax.jit(planarize(run_fn))(
        *to_planar((state, blocks)))
    assert int(np.asarray(ref_cnt).sum()) > 0
    np.testing.assert_array_equal(np.asarray(ref_cnt), np.asarray(p_cnt))
    np.testing.assert_array_equal(np.asarray(ref_fp), np.asarray(p_fp))


@pytest.mark.parametrize("family", ["flex", "gmsk", "wlan"])
def test_planar_family_sync_decodes_equal(family):
    """Every frame family's synchronizer planarizes with exact decode
    equality — the transform covers the whole framework surface, not
    just the flagship OFDM pipeline."""
    rng = np.random.default_rng(17)
    bs = 8192
    if family == "flex":
        from liquid_usrp_tpu.framing import flexframe as ff
        from liquid_usrp_tpu.framing import flexframe_sync as ffs
        params = ff.make_flex_params()
        hdr = rng.integers(0, 256, 14, dtype=np.uint8)
        pay = rng.integers(0, 256, 120, dtype=np.uint8)
        w = np.asarray(ff.flex_assemble(params, ff.default_props(),
                                        jnp.asarray(hdr), jnp.asarray(pay)))
        sync = ffs.make_flex_sync(params, block_size=bs, max_payload=256,
                                  max_frames=4, header_user=14)
        sync_block, sync_init = (
            lambda st, b: ffs.flex_sync_block(sync, st, b),
            lambda: ffs.flex_sync_init(sync))
        ok_of = lambda res: res.payload_valid    # noqa: E731
        pay_of = lambda res: res.payload         # noqa: E731
    elif family == "gmsk":
        from liquid_usrp_tpu.framing import gmskframe as gf
        params = gf.make_gmsk_params(k=2, m=3, bt=0.5)
        hdr = rng.integers(0, 256, 8, dtype=np.uint8)
        pay = rng.integers(0, 256, 100, dtype=np.uint8)
        w = np.asarray(gf.gmsk_assemble(params, gf.gmsk_default_props(),
                                        jnp.asarray(hdr), jnp.asarray(pay)))
        sync = gf.make_gmsk_sync(params, block_size=bs, max_payload=256,
                                 max_frames=4)
        sync_block, sync_init = (
            lambda st, b: gf.gmsk_sync_block(sync, st, b),
            lambda: gf.gmsk_sync_init(sync))
        ok_of = lambda res: res.payload_valid    # noqa: E731
        pay_of = lambda res: res.payload         # noqa: E731
    else:
        from liquid_usrp_tpu.framing import wlan
        sync = wlan.make_wlan_sync(block_size=bs, max_psdu=256,
                                   max_frames=4)
        psdu = rng.integers(0, 256, 100, dtype=np.uint8)
        w = np.asarray(wlan.wlan_assemble(36, psdu))
        sync_block, sync_init = (
            lambda st, b: wlan.wlan_sync_block(sync, st, b),
            lambda: wlan.wlan_sync_init(sync))
        ok_of = lambda res: res.psdu_valid       # noqa: E731
        pay_of = lambda res: res.psdu            # noqa: E731

    stream = np.zeros(2 * bs, np.complex64)
    stream[600:600 + len(w)] = w
    stream += 0.005 * (rng.standard_normal(stream.shape)
                       + 1j * rng.standard_normal(stream.shape)
                       ).astype(np.complex64)
    blocks = stream.reshape(2, bs)

    def run(state, blocks):
        def body(st, b):
            st, res = sync_block(st, b)
            return st, (ok_of(res), pay_of(res))
        return lax.scan(body, state, blocks)

    st0 = sync_init()
    _, (rok, rpay) = jax.jit(run)(st0, blocks)
    _, (pok, ppay) = jax.jit(planarize(run))(*to_planar((st0, blocks)))
    rok_ = np.asarray(rok)
    assert rok_.sum() >= 1
    assert np.array_equal(rok_, np.asarray(pok))
    np.testing.assert_array_equal(np.asarray(rpay)[rok_],
                                  np.asarray(ppay)[rok_])
