"""On-TPU attribution of the candidate-refine stage (1.79 ms/block,
docs/tpu_runs/r05_planar_stage_v4.json) — isolates the suspect ops with
probe-grade timing (fori_loop N-differencing, scripts/planar_stage_probe).

Suspects, each under the 24-candidate vmap:
* win_mf    — the [search, M] static-index window gather + S1 matched
              filter matmul (fine timing)
* golay_hdr — soft/hard Golay header decode (+ the iter_header repeat)
* eq_pay    — _equalized_symbols over the full max_psym payload budget
* dd_tab    — the decision-directed pass's tab[sym] traced gather
* win_cfo   — wraw gather + coarse/fine CFO + full-window derotate
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from planar_stage_probe import (_code_key, _enable_compile_cache,  # noqa: E402
                                make_looped, timeit)


def main():
    bs = int(os.environ.get("BS", 65536))
    maxf = int(os.environ.get("MAXF", 24))
    cache = (f"/tmp/planar_stage_inputs_bs{bs}_mf{maxf}"
             f"_{_code_key()}.npz")
    if not os.path.exists(cache):
        import subprocess
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__),
                                     "planar_stage_probe.py"),
                        "--build", cache], check=True,
                       env=dict(os.environ, JAX_PLATFORMS="cpu"))
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from liquid_usrp_tpu.framing import ofdm, ofdm_sync
    from liquid_usrp_tpu.framing import payload as payload_codec
    from liquid_usrp_tpu.ops import modem as modem_mod
    from liquid_usrp_tpu.ops.planar import planarize, to_planar

    print("backend:", jax.devices(), file=sys.stderr, flush=True)
    params = ofdm.make_ofdm_params(48, 6, 4)
    sync = ofdm_sync.make_sync(params, block_size=bs, max_payload=512,
                               max_frames=maxf)
    data = np.load(cache)
    ext_p = jax.device_put(to_planar(data["stream"]))
    locs = jnp.asarray(data["locs"])
    c_at_p = jax.device_put(to_planar(data["c_at"]))
    M, cp = params.M, params.cp_len
    W = sync.overlap
    K = maxf
    NUM_S0 = ofdm_sync.NUM_S0
    rng = np.random.default_rng(5)

    # shared synthetic per-candidate windows / grids (realistic shapes)
    w_np = (rng.standard_normal((K, W)) + 1j * rng.standard_normal((K, W))
            ).astype(np.complex64)
    w_p = jax.device_put(to_planar(w_np))
    n_data = len(params.data_idx)
    pd_np = (rng.standard_normal((K, sync.max_psym, n_data))
             + 1j * rng.standard_normal((K, sync.max_psym, n_data))
             ).astype(np.complex64)
    pd_p = jax.device_put(to_planar(pd_np))
    H_np = (rng.standard_normal((K, M)) + 1j *
            rng.standard_normal((K, M))).astype(np.complex64)
    H_p = jax.device_put(to_planar(H_np))
    mod = jnp.asarray(data["mod"])

    def win_cfo(t, ext, c_at_):
        def one(n0, ca):
            wraw = ofdm_sync._window_gather(ext + t, n0, W)
            cfo = -jnp.angle(ca) / (M // 4)
            c_fine = jnp.sum(wraw[:M] * jnp.conj(wraw[M:2 * M])) * \
                jnp.exp(1j * cfo * M)
            cfo = cfo - jnp.angle(c_fine) / M
            tt = jnp.arange(W, dtype=jnp.float32)
            w = wraw * jnp.exp(-1j * cfo * tt)
            return jnp.sum(jnp.abs(w))
        return jnp.sum(jax.vmap(one)(locs, c_at_))

    def win_mf(t, w):
        s1 = jnp.conj(jnp.asarray(params.s1_time))

        def one(wr):
            search = (NUM_S0 + 2) * M
            seg = wr[:search + M]
            idx = jnp.arange(search)[:, None] + jnp.arange(M)[None, :]
            wins = seg[idx]
            corr = wins @ s1
            energy = jnp.sqrt(jnp.maximum(
                jnp.sum(jnp.abs(wins) ** 2, axis=-1), 1e-12))
            return jnp.argmax(jnp.abs(corr) / energy).astype(jnp.float32)
        return jnp.sum(jax.vmap(one)(w + t))

    def golay_hdr(t, w):
        def one(wr):
            hdata = wr[:ofdm_sync.HEADER_SYMS].reshape(-1)
            hsym = modem_mod.demodulate(ofdm_sync._HEADER_MOD, hdata)
            hbits = modem_mod.symbols_to_bits(hsym, 1)
            hbytes = payload_codec.header_bits_to_bytes(hbits)
            outs = payload_codec.decode_header(hbytes, sync.max_payload,
                                               len(sync.fecs))
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
        return jnp.sum(jax.vmap(one)(w + t))

    def eq_pay(t, w):
        n_hsym = ofdm_sync.header_symbol_count(params)

        def one(wr):
            pd = ofdm_sync._equalized_symbols(
                sync, wr, jnp.int32(3 * M), jnp.ones((M,), jnp.complex64),
                sync.max_psym, n_hsym,
                n_valid_sym=jnp.int32(sync.max_psym))
            return jnp.sum(jnp.abs(pd))
        return jnp.sum(jax.vmap(one)(w + t))

    def dd_tab(t, pd):
        dd = min(64, sync.max_psym)

        def one(sub, m):
            tab = jnp.asarray(payload_codec._stacked_tables())[m]
            sym, _ = payload_codec._nearest_sym(sub.reshape(-1), tab)
            dec = tab[sym].reshape(sub.shape)
            num = jnp.sum(sub * jnp.conj(dec), axis=0)
            return jnp.sum(jnp.abs(num))
        return jnp.sum(jax.vmap(one)(pd[:, :dd] + t, mod))

    def chan_est(t, w):
        s1f = jnp.asarray(params.s1_freq)
        s0f = jnp.asarray(params.s0_freq)
        order = np.argsort([k - M if k > M // 2 else k
                            for k in sorted(set(params.data_idx.tolist()) |
                                            set(params.pilot_idx.tolist()))])
        act_sorted = np.array(sorted(set(params.data_idx.tolist()) |
                                     set(params.pilot_idx.tolist())))[order]

        def one(wr):
            t1 = jnp.int32(2 * M + 3)
            r1 = jax.lax.dynamic_slice(wr, (t1,), (M,))
            R1 = jnp.fft.fft(r1) / jnp.sqrt(jnp.float32(M))
            active = jnp.abs(s1f) > 1e-6
            H = jnp.where(active, R1 * jnp.conj(s1f) /
                          jnp.maximum(jnp.abs(s1f) ** 2, 1e-12), 1.0)
            r0 = jax.lax.dynamic_slice(
                wr, (jnp.maximum(t1 - 2 * M, 0),), (2 * M,))
            R0 = (jnp.fft.fft(r0[:M]) + jnp.fft.fft(r0[M:])) / \
                (2.0 * jnp.sqrt(jnp.float32(M)))
            act0 = (jnp.abs(s0f) > 1e-6) & (t1 >= 2 * M)
            H0 = R0 * jnp.conj(s0f) / jnp.maximum(jnp.abs(s0f) ** 2, 1e-12)
            H = jnp.where(act0, (H + 2.0 * H0) / 3.0, H)
            Ha = H[jnp.asarray(act_sorted)]
            Hpad = jnp.concatenate([Ha[:1], Ha, Ha[-1:]])
            Hs = 0.25 * Hpad[:-2] + 0.5 * Hpad[1:-1] + 0.25 * Hpad[2:]
            H = H.at[jnp.asarray(act_sorted)].set(Hs)
            return jnp.sum(jnp.abs(H))
        return jnp.sum(jax.vmap(one)(w + t))

    def eq_hdr(t, w):
        n_hsym = ofdm_sync.header_symbol_count(params)

        def one(wr):
            hd = ofdm_sync._equalized_symbols(
                sync, wr, jnp.int32(3 * M), jnp.ones((M,), jnp.complex64),
                n_hsym, 0)
            return jnp.sum(jnp.abs(hd))
        return jnp.sum(jax.vmap(one)(w + t))

    def dd_new(t, pd):
        dd = min(64, sync.max_psym)

        def one(sub, m):
            tab = jnp.asarray(payload_codec._stacked_tables())[m]
            dec, _ = payload_codec._nearest_point(sub.reshape(-1), tab)
            dec = dec.reshape(sub.shape)
            num = jnp.sum(sub * jnp.conj(dec), axis=0)
            return jnp.sum(jnp.abs(num))
        return jnp.sum(jax.vmap(one)(pd[:, :dd] + t, mod))

    def decode_all(t, ext, c_at_):
        outs = ofdm_sync._gated_decode(
            sync, ext + t, jnp.bool_(True), locs, c_at_)
        acc = 0.0
        for o in outs:
            acc = acc + jnp.sum(jnp.abs(o.astype(jnp.float32))
                                if o.dtype != jnp.complex64
                                else jnp.abs(o))
        return acc

    def decode_nocond(t, ext, c_at_):
        """The same decode pipeline composed WITHOUT the lax.cond gate —
        isolates the cond join's cost from the parts' inherent cost."""
        exta = ext + t
        win = jax.vmap(lambda n0: ofdm_sync._window_gather(
            exta, n0, sync.overlap))(locs)
        (user, points, plen, mod_, f0_, f1_, check_, hvalid_, rssi,
         hevm_, cfo) = jax.vmap(
            lambda w_, ca: ofdm_sync._decode_window(sync, w_, ca))(
            win, c_at_)
        payload, pvalid = payload_codec.decode_payload_batch(
            sync.enc_max, sync.dec_max, sync.max_payload, points, mod_,
            f0_, f1_, check_, plen, hvalid_, sync.fecs)
        used = payload_codec.payload_points_used(
            sync.fecs, sync.dec_max, sync.enc_max, plen, mod_, f0_, f1_,
            check_)
        evm = payload_codec.frame_evm_db(
            hevm_, payload_codec.payload_evm_mse(points, mod_, used),
            used)
        acc = 0.0
        for o in (user, payload, plen, mod_, f0_, f1_, check_, hvalid_,
                  pvalid, rssi, evm, cfo):
            acc = acc + jnp.sum(jnp.abs(o.astype(jnp.float32)))
        return acc

    stages = {
        "win_cfo": (win_cfo, (ext_p, c_at_p)),
        "win_mf": (win_mf, (w_p,)),
        "chan_est": (chan_est, (w_p,)),
        "eq_hdr": (eq_hdr, (w_p,)),
        "golay_hdr": (golay_hdr, (w_p,)),
        "eq_pay": (eq_pay, (w_p,)),
        "dd_tab": (dd_tab, (pd_p,)),
        "dd_new": (dd_new, (pd_p,)),
        "decode_all": (decode_all, (ext_p, c_at_p)),
        "decode_nocond": (decode_nocond, (ext_p, c_at_p)),
    }
    only = os.environ.get("STAGES")
    if only:
        keep = set(only.split(","))
        stages = {k: v for k, v in stages.items() if k in keep}

    report = {"bs": bs, "max_frames": maxf,
              "device": jax.devices()[0].device_kind, "stages": {}}
    t0s = jax.device_put(jnp.float32(0.0))
    n0s = jax.device_put(jnp.int32(1))
    for name, (fn, base_args) in stages.items():
        try:
            t0 = time.time()
            exe = jax.jit(planarize(make_looped(fn))).lower(
                t0s, n0s, *base_args).compile()
            compile_s = time.time() - t0
            try:
                ca = exe.cost_analysis() or {}
            except Exception:
                ca = {}
            dt = timeit(exe, base_args)
            row = {"ms": round(dt * 1e3, 3),
                   "compile_s": round(compile_s, 1),
                   "bytes": float(ca.get("bytes accessed", 0))}
        except Exception as e:  # noqa: BLE001
            row = {"error": f"{type(e).__name__}: {str(e)[:140]}"}
        report["stages"][name] = row
        print(f"  {name:10s}: {row}", file=sys.stderr, flush=True)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
