"""Benchmark: NBTC TPU-native codec on the Kodak-24 corpus (real chip).

Prints a JSON line after EVERY measurement leg (the driver tails stdout,
so a timeout still captures everything measured so far; the LAST line is
the most complete record):
  metric      = batched NBTC lossless encode throughput on one chip
  vs_baseline = ratio vs the reference C encoder at -e1 on one CPU core
                (5.1 MPix/s measured in this container; BASELINE.md)
Extra fields: decode throughput, bits-per-pixel vs the reference efforts,
profile-3 (ratio flagship) e2e + marginal device numbers, round-trip
validity, and the measured tunnel link floors.

An internal wall-clock budget (NBLIC_BENCH_BUDGET_S, default 2400 s)
gates each leg: when the budget is near, remaining legs are skipped and
whatever is measured has already been printed.  Legs are ordered so the
headline and the ratio-flagship numbers land first.
"""

import functools
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache: the fused encode program takes minutes to build
# through the remote-compile tunnel; cache it across bench runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

KODAK = Path("/root/reference/img_kodak")
BASELINE_E1_ENC_MPIX_S = 5.1  # BASELINE.md: reproduced single-core C at -e1
REF_BPP = {"e0": 4.227, "e1": 4.146, "e2": 4.088, "e3": 4.066}
T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("NBLIC_BENCH_BUDGET_S", "2400"))
REPS = 3  # median-of-3 for the e2e timings


def _remaining() -> float:
    return BUDGET_S - (time.perf_counter() - T_START)


def main() -> int:
    from nblic_tpu.models import strips, tiled
    from nblic_tpu.utils import imageio

    result = {
        "metric": "nbtc_kodak24_device_encode_throughput",
        "value": 0.0,
        "unit": "MPix/s/chip",
        "vs_baseline": 0.0,
        "ref_bpp": REF_BPP,
        "legs_done": [],
        "note": (
            "device_* are marginal per-chip compute times (N encodes inside "
            "one program; block_until_ready is a no-op through the axon "
            "tunnel so only in-program marginals are honest chip numbers); "
            "e2e_* are bounded by the tunnel (~250 ms/launch + the "
            "tunnel_*_MBps link rates: decode must move 1 B/px down, so e2e "
            "decode cannot exceed the link floor on this host). p3_* is the "
            "adaptive strip engine (ratio flagship; compare p3_bpp against "
            "ref_bpp e2/e3). A line is printed after every leg; the last "
            "line is the most complete."
        ),
    }

    def emit():
        result["elapsed_s"] = round(time.perf_counter() - T_START, 1)
        print(json.dumps(result), flush=True)

    def run_leg(name, min_time_s, fn):
        if _remaining() < min_time_s:
            result.setdefault("legs_skipped", []).append(name)
            emit()
            return
        try:
            fn()
            result["legs_done"].append(name)
        except Exception as e:  # a failed leg must not kill the record
            result.setdefault("leg_errors", {})[name] = repr(e)[:300]
        emit()

    paths = sorted(KODAK.glob("*.bmp"))
    imgs = [imageio.load_image(str(p)) for p in paths]
    if not imgs:
        result["note"] = "no corpus"
        emit()
        return 1
    n_px = sum(im.size for im in imgs)
    result["n_images"] = len(imgs)

    # batch per distinct (orientation-normalized) shape for device loops
    groups: dict[tuple, list] = {}
    for im in imgs:
        norm = np.ascontiguousarray(im.T) if im.shape[0] > im.shape[1] else im
        groups.setdefault(norm.shape, []).append(norm)
    batches = list(groups.values())

    # ---- leg 1: HEADLINE — marginal device encode (profile 1) ----
    # The tunnel costs ~250 ms per program execution and block_until_ready
    # is a no-op, so the only honest device measurement is marginal: run
    # the encode N times INSIDE one program (with a carried data dependence
    # so XLA can't hoist it) and divide the time difference by the extra
    # iterations.
    @functools.partial(jax.jit, static_argnums=1)
    def enc_loop(tiles, n):
        def body(_, acc):
            t = (tiles + (acc & 1).astype(jnp.uint8)).astype(jnp.uint8)
            out = tiled._encode_device_batch_impl(t)
            return out[0, :1]

        return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.int32))

    n_lo, n_hi = 1, 9

    def leg_device_encode():
        dev_t, px_dev = 0.0, 0
        for batch in batches:
            tiles = jnp.asarray(
                np.stack(
                    [tiled.to_tiles(im, *tiled.DEFAULT_TILE) for im in batch]
                )
            )
            np.asarray(enc_loop(tiles, n_lo))
            np.asarray(enc_loop(tiles, n_hi))  # warm both variants
            t0 = time.perf_counter()
            np.asarray(enc_loop(tiles, n_lo))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(enc_loop(tiles, n_hi))
            t_hi = time.perf_counter() - t0
            dev_t += max(t_hi - t_lo, 1e-9)
            px_dev += (n_hi - n_lo) * sum(im.size for im in batch)
        mpix = px_dev / dev_t / 1e6
        result["value"] = round(mpix, 2)
        result["vs_baseline"] = round(mpix / BASELINE_E1_ENC_MPIX_S, 2)

    run_leg("device_encode", 60, leg_device_encode)

    # ---- leg 2: e2e production path (encode + decode + bpp) ----
    def leg_e2e():
        def encode_all():
            return tiled.encode_corpus(imgs)

        def decode_all(streams):
            # pipelined groups: group k+1's stream upload overlaps group
            # k's compute + pixel fetch (the tunnel is the bottleneck;
            # a single 24-image program serializes upload->run->fetch)
            gs = [streams[i : i + 8] for i in range(0, len(streams), 8)]
            return [im for g in tiled.decode_batches(gs) for im in g]

        streams = encode_all()  # warmup (compile)
        decs = decode_all(streams)
        t_encs = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            streams = encode_all()
            t_encs.append(time.perf_counter() - t0)
        t_enc = sorted(t_encs)[REPS // 2]
        t_decs = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            decs = decode_all(streams)
            t_decs.append(time.perf_counter() - t0)
        t_dec = sorted(t_decs)[REPS // 2]
        ok = all(np.array_equal(d, im) for im, d in zip(imgs, decs))
        result["e2e_encode_mpix_s"] = round(n_px / t_enc / 1e6, 2)
        result["e2e_decode_mpix_s"] = round(n_px / t_dec / 1e6, 2)
        result["bpp"] = round(
            8.0 * sum(len(s) for s in streams) / n_px, 4
        )
        result["lossless_roundtrip_ok"] = bool(ok)
        result["encode_s"] = round(t_enc, 3)
        result["decode_s"] = round(t_dec, 3)

    run_leg("e2e", 60, leg_e2e)

    # ---- leg 3: tunnel link probe (the e2e physical floor) ----
    def leg_tunnel():
        mb = 9.4
        probe = jnp.asarray(
            np.random.default_rng(0).integers(
                0, 2**31, size=(int(mb * 1e6) // 4,), dtype=np.int32
            )
        )
        bump = jax.jit(lambda x: x + 1)
        up_np = np.asarray(probe)
        # device_put is lazy under the tunnel; force with a tiny fetch
        t_up = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            d = jax.device_put(up_np, jax.devices()[0])
            np.asarray(bump(d)[:1])
            t_up = min(t_up, max(time.perf_counter() - t0, 1e-9))
        t_dn = 1e9
        for _ in range(3):
            r = bump(probe)
            t0 = time.perf_counter()
            np.asarray(r)
            t_dn = min(t_dn, time.perf_counter() - t0)
        result["tunnel_up_MBps"] = round(mb / t_up, 1)
        result["tunnel_down_MBps"] = round(mb / t_dn, 1)
        # decode must move 1 B/px down
        result["e2e_decode_link_floor_mpix_s"] = round(mb / t_dn, 1)

    run_leg("tunnel", 30, leg_tunnel)

    # ---- leg 4: profile 3 (ratio flagship) e2e: corpus bpp + round-trip --
    p3_streams: list = []

    def leg_p3_e2e():
        def p3_encode_all():
            gs = [imgs[i : i + 6] for i in range(0, len(imgs), 6)]
            out = []
            for ss in strips.encode_batches(gs):
                out += ss
            return out

        ss = p3_encode_all()  # warmup (compile)
        p3_streams.extend(ss)
        result["p3_bpp"] = round(
            8.0 * sum(len(s) for s in ss) / n_px, 4
        )
        emit()  # bpp is the ratio headline — record it before the timings
        t0 = time.perf_counter()
        p3_encode_all()
        t_p3_enc = time.perf_counter() - t0
        result["p3_encode_mpix_s"] = round(n_px / t_p3_enc / 1e6, 2)
        emit()
        p3_decs = strips.decode_batch(ss)  # warmup is the timed path too
        t0 = time.perf_counter()
        p3_decs = strips.decode_batch(ss)
        t_p3_dec = time.perf_counter() - t0
        result["p3_decode_mpix_s"] = round(n_px / t_p3_dec / 1e6, 2)
        result["p3_roundtrip_ok"] = bool(
            all(np.array_equal(d, im) for im, d in zip(imgs, p3_decs))
        )

    run_leg("p3_e2e", 240, leg_p3_e2e)

    # ---- leg 5: profile 3 marginal device encode ----
    # Same marginal method.  The two encode stages (modeling | coding) are
    # measured as separate loops — fusing them into one program is the
    # known compile hazard the production split avoids — and their times
    # add (they run back to back on the same chip).  The xor keeps a
    # carried data dependence while every perturbed value stays in the
    # coder's valid domain.
    group6 = [
        np.ascontiguousarray(im.T) if im.shape[0] < im.shape[1] else im
        for im in imgs[:6]
    ]

    def leg_p3_device_encode():
        p3_n_lo, p3_n_hi = 1, 3
        xs6 = jnp.asarray(
            np.stack(
                [strips._to_strips(im, strips.TH_DEFAULT) for im in group6]
            )
        ).astype(jnp.int32)

        @functools.partial(jax.jit, static_argnums=(1,))
        def p3_model_loop(xs, n):
            def body(_, acc):
                x = xs ^ (acc & 1)
                planes = jax.vmap(
                    strips._model_planes,
                    in_axes=(0, None, None, None, None, None),
                )(x, strips.AVP_N, False, 0, bool(strips.TUNE.mix_e),
                  bool(strips.TUNE.w_pred))
                return planes[1].reshape(-1)[:1]

            return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.int32))

        @functools.partial(jax.jit, static_argnums=(7,))
        def p3_code_loop(x, px0, adr, qu, qv, qw, acc0, n):
            def body(_, acc):
                x2 = x ^ (acc & 1)
                fn = jax.vmap(
                    strips._code_impl, in_axes=(0, 0, 0, 0, 0, 0, None)
                )
                lens, _ = fn(x2, px0, adr, qu, qv, qw, strips.TUNE)
                return lens.reshape(-1)[:1].astype(jnp.int32)

            return jax.lax.fori_loop(0, n, body, acc0)

        def marginal(run):
            run(p3_n_lo)
            run(p3_n_hi)  # warm both trip counts
            t0 = time.perf_counter()
            run(p3_n_lo)
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(p3_n_hi)
            t_hi = time.perf_counter() - t0
            return max(t_hi - t_lo, 1e-9) / (p3_n_hi - p3_n_lo)

        with jax.enable_x64():
            t_model = marginal(lambda n: np.asarray(p3_model_loop(xs6, n)))
            planes6 = strips._model_batch_jit(
                xs6, strips.AVP_N, False, 0, bool(strips.TUNE.mix_e),
                bool(strips.TUNE.w_pred),
            )
            acc0 = jnp.zeros((1,), jnp.int32)
            t_code = marginal(
                lambda n: np.asarray(p3_code_loop(*planes6, acc0, n))
            )
        px6 = sum(im.size for im in group6)
        result["p3_device_encode_mpix_s"] = round(
            px6 / (t_model + t_code) / 1e6, 2
        )

    run_leg("p3_device_encode", 180, leg_p3_device_encode)

    # ---- leg 6: profile 3 marginal device decode ----
    # One SEG_ROWS-row segment program per marginal iteration (perturbed
    # streams decode garbage pixels but every op stays in-domain; trip
    # counts are static so the program time is representative).  A whole
    # strip decodes as several such programs back to back — single-program
    # execution time is bounded on the tunnel worker — so the per-row
    # device cost measured here is the honest per-chip rate.
    def leg_p3_device_decode():
        from nblic_tpu.ops import rans as rans_ops

        if not p3_streams:
            p3_streams.extend(
                s
                for ss in strips.encode_batches(
                    [imgs[i : i + 6] for i in range(0, len(imgs), 6)]
                )
                for s in ss
            )
        p3_parsed = [strips._parse(s) for s in p3_streams]
        s_cnt = p3_parsed[0][0][2]
        th_p3 = p3_parsed[0][0][3]
        ww = p3_parsed[0][0][0] if p3_parsed[0][0][4] else p3_parsed[0][0][1]
        tune = p3_parsed[0][0][7]
        wmax = max(2, max(int(p[2].max()) for p in p3_parsed))
        wmax = -(-wmax // 64) * 64
        n_str = len(p3_parsed)
        smat_np = np.concatenate(
            [rans_ops.pad_streams(p[3], p[2], wmax) for p in p3_parsed]
        ).astype(np.uint16).view(np.int16)
        smat_np = smat_np.reshape(n_str * s_cnt, strips.N_PHASE, wmax)
        # 64 rows per marginal iteration and a 1-vs-2 trip count keeps the
        # n_hi program safely under the worker's execution bound
        seg_rows = min(64, th_p3)

        def make_loop(n_imgs):
            @functools.partial(jax.jit, static_argnums=(2,))
            def p3_dec_loop(smat, bias, n):
                smat32 = smat.astype(jnp.int32) & 0xFFFF

                def body(_, acc):
                    s2 = smat32 ^ (acc & 1)
                    carry = strips._decode_carry_init(
                        s2, n_imgs, s_cnt, ww, strips.AVP_N, 0, tune
                    )
                    _, px = strips._decode_seg(
                        carry, s2, bias, jnp.int32(0), seg_rows, ww,
                        s_cnt, n_imgs, True, strips.AVP_N, 0, tune,
                    )
                    return px.reshape(-1)[:1].astype(jnp.int32)

                return jax.lax.fori_loop(
                    0, n, body, jnp.zeros((1,), jnp.int32)
                )

            return p3_dec_loop

        def dec_marginal(run):
            run(1)
            run(2)
            t0 = time.perf_counter()
            run(1)
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(2)
            t_hi = time.perf_counter() - t0
            return max(t_hi - t_lo, 1e-9)

        # (a) the 24 real corpus streams decoded concurrently (the honest
        # per-chip corpus number)
        loop24 = make_loop(n_str)
        smat24 = jnp.asarray(smat_np)
        bias24 = jnp.zeros((n_str, 1), jnp.int32)  # adaptive: ignored
        with jax.enable_x64():
            t_dec = dec_marginal(
                lambda n: np.asarray(loop24(smat24, bias24, n))
            )
        px_seg = n_str * s_cnt * seg_rows * ww
        result["p3_device_decode_mpix_s"] = round(px_seg / t_dec / 1e6, 2)
        emit()
        # (b) serving-shaped scale-out: the same corpus tiled 8x (192
        # concurrent streams); per-pixel walk ops are latency-bound at 24
        # lanes, so concurrent streams buy nearly free throughput
        dup = 8
        loop_many = make_loop(n_str * dup)
        smat_many = jnp.asarray(np.tile(smat_np, (dup, 1, 1)))
        bias_many = jnp.zeros((n_str * dup, 1), jnp.int32)
        with jax.enable_x64():
            t_many = dec_marginal(
                lambda n: np.asarray(loop_many(smat_many, bias_many, n))
            )
        result["p3_device_decode_mpix_s_192streams"] = round(
            dup * px_seg / t_many / 1e6, 2
        )

    run_leg("p3_device_decode", 180, leg_p3_device_decode)

    # ---- leg 6b: serving contract (seg_stats) decode throughput ----
    # The V3S tune freezes AVP stats per 8-column segment, so the decoder
    # batches each segment's ridge solves off the per-pixel critical path
    # (strips.TUNE_V3S; costs ~0.013 bpp vs the flagship, still beats
    # reference -e2).  Measures the same marginal way at 24 streams.
    def leg_p3_serving():
        from nblic_tpu.ops import rans as rans_ops

        old_tune = strips.TUNE
        try:
            strips.TUNE = strips.TUNE_V4S
            gs = [imgs[i : i + 6] for i in range(0, len(imgs), 6)]
            sstreams = [s for ss in strips.encode_batches(gs) for s in ss]
        finally:
            strips.TUNE = old_tune
        result["p3_serving_bpp"] = round(
            8.0 * sum(len(s) for s in sstreams) / n_px, 4
        )
        emit()
        parsed = [strips._parse(s) for s in sstreams]
        s_cnt = parsed[0][0][2]
        th_s = parsed[0][0][3]
        ww = parsed[0][0][0] if parsed[0][0][4] else parsed[0][0][1]
        tune = parsed[0][0][7]
        wmax = max(2, max(int(p[2].max()) for p in parsed))
        wmax = -(-wmax // 64) * 64
        n_str = len(parsed)
        smat_s = np.concatenate(
            [rans_ops.pad_streams(p[3], p[2], wmax) for p in parsed]
        ).astype(np.uint16).view(np.int16)
        smat_s = smat_s.reshape(n_str * s_cnt, strips.N_PHASE, wmax)
        seg_rows = min(64, th_s)

        @functools.partial(jax.jit, static_argnums=(2,))
        def serv_loop(smat, bias, nn):
            smat32 = smat.astype(jnp.int32) & 0xFFFF

            def body(_, acc):
                s2 = smat32 ^ (acc & 1)
                carry = strips._decode_carry_init(
                    s2, n_str, s_cnt, ww, strips.AVP_N, 0, tune
                )
                _, px = strips._decode_seg(
                    carry, s2, bias, jnp.int32(0), seg_rows, ww, s_cnt,
                    n_str, True, strips.AVP_N, 0, tune,
                )
                return px.reshape(-1)[:1].astype(jnp.int32)

            return jax.lax.fori_loop(
                0, nn, body, jnp.zeros((1,), jnp.int32)
            )

        bias_s = jnp.zeros((n_str, 1), jnp.int32)
        sm = jnp.asarray(smat_s)

        def run(nn):
            return np.asarray(serv_loop(sm, bias_s, nn))

        with jax.enable_x64():
            run(1)
            run(2)
            t0 = time.perf_counter()
            run(1)
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(2)
            t_hi = time.perf_counter() - t0
        t = max(t_hi - t_lo, 1e-9)
        result["p3_serving_device_decode_mpix_s"] = round(
            n_str * s_cnt * seg_rows * ww / t / 1e6, 2
        )
        emit()
        # the serving-target operating point: 32 concurrent streams (the
        # reference-class bar is >= 0.63 MPix/s at <= 32 streams; the
        # walk is latency-bound, so extra streams are nearly free)
        n32 = 32
        reps32 = -(-n32 // n_str)
        smat32 = np.tile(smat_s, (reps32, 1, 1))[: n32 * s_cnt]
        n_str32 = n32

        @functools.partial(jax.jit, static_argnums=(2,))
        def serv_loop32(smat, bias, nn):
            smat32v = smat.astype(jnp.int32) & 0xFFFF

            def body(_, acc):
                s2 = smat32v ^ (acc & 1)
                carry = strips._decode_carry_init(
                    s2, n_str32, s_cnt, ww, strips.AVP_N, 0, tune
                )
                _, px = strips._decode_seg(
                    carry, s2, bias, jnp.int32(0), seg_rows, ww, s_cnt,
                    n_str32, True, strips.AVP_N, 0, tune,
                )
                return px.reshape(-1)[:1].astype(jnp.int32)

            return jax.lax.fori_loop(
                0, nn, body, jnp.zeros((1,), jnp.int32)
            )

        bias32 = jnp.zeros((n_str32, 1), jnp.int32)
        sm32 = jnp.asarray(smat32)

        def run32(nn):
            return np.asarray(serv_loop32(sm32, bias32, nn))

        with jax.enable_x64():
            run32(1)
            run32(2)
            t0 = time.perf_counter()
            run32(1)
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            run32(2)
            t_hi = time.perf_counter() - t0
        t32 = max(t_hi - t_lo, 1e-9)
        result["p3_serving_device_decode_mpix_s_32streams"] = round(
            n_str32 * s_cnt * seg_rows * ww / t32 / 1e6, 2
        )
        emit()
        # round-trip safety of the serving contract at full scale
        decs = strips.decode_batch(sstreams[:6])
        result["p3_serving_roundtrip_ok"] = bool(
            all(np.array_equal(d, im) for im, d in zip(imgs[:6], decs))
        )

    # ---- leg 7: marginal device decode (profile 1, Mosaic kernel) ----
    def leg_device_decode():
        from nblic_tpu.ops import pallas_decode

        all_streams = tiled.encode_batches(batches)

        @functools.partial(
            jax.jit, static_argnums=(6, 7, 8, 9, 10, 11)
        )
        def dec_loop(streams, n_active, bias, hist_n, acc, wcols, th, tw,
                     near, g, profile, n):
            def body(_, carry):
                s = streams ^ (carry[0] & 1)
                out = pallas_decode.decode_groups_pallas(
                    s, n_active, bias, hist_n, acc, wcols, th, tw, near, g,
                    profile,
                )
                return out.reshape(-1)[:1].astype(jnp.int32)

            return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.int32))

        dev_t, px_dev = 0.0, 0
        for group_streams, batch in zip(all_streams, batches):
            p = tiled._Parsed(group_streams[0])
            parsed = [tiled._Parsed(s) for s in group_streams]
            wmax = tiled._bucket(max(int(q.counts.max()) for q in parsed))
            sm = jnp.asarray(
                np.concatenate(
                    [q.stream_matrix32((wmax + 1) // 2) for q in parsed]
                )
            )
            na = jnp.asarray(np.concatenate([q.n_active() for q in parsed]))
            bias = jnp.asarray(np.stack([q.bias for q in parsed]))
            hn = jnp.asarray(np.stack([q.hist_n for q in parsed]))
            ac = jnp.asarray(np.stack([q.acc for q in parsed]))
            wc = jnp.asarray(
                np.concatenate([q.weight_cols() for q in parsed])
            )
            args = (sm, na, bias, hn, ac, wc, p.hdr.tile_h, p.hdr.tile_w,
                    p.hdr.near, p.group_size, p.hdr.profile)
            np.asarray(dec_loop(*args, n_lo))
            np.asarray(dec_loop(*args, n_hi))
            t0 = time.perf_counter()
            np.asarray(dec_loop(*args, n_lo))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(dec_loop(*args, n_hi))
            t_hi = time.perf_counter() - t0
            dev_t += max(t_hi - t_lo, 1e-9)
            px_dev += (n_hi - n_lo) * sum(im.size for im in batch)
        result["device_decode_mpix_s"] = round(px_dev / dev_t / 1e6, 2)

    run_leg("device_decode", 120, leg_device_decode)

    run_leg("p3_serving", 240, leg_p3_serving)

    # ---- leg 9: max-ratio tune (per-symbol counters) corpus bpp ----
    # sym_cnt wins on all 24 Kodak images (docs/p3_kodak24.txt); this is
    # the framework's best ratio point, traded against encode/decode time.
    def leg_p3_max():
        old_tune = strips.TUNE
        try:
            strips.TUNE = strips.TUNE_MAX
            gs = [imgs[i : i + 6] for i in range(0, len(imgs), 6)]
            mstreams = [s for ss in strips.encode_batches(gs) for s in ss]
        finally:
            strips.TUNE = old_tune
        result["p3_max_bpp"] = round(
            8.0 * sum(len(s) for s in mstreams) / n_px, 4
        )
        emit()
        decs = strips.decode_batch(mstreams[:6])
        result["p3_max_roundtrip_ok"] = bool(
            all(np.array_equal(d, im) for im, d in zip(imgs[:6], decs))
        )

    run_leg("p3_max", 180, leg_p3_max)

    # ---- leg 10: profile 2 (speed-class ratio point) ----
    # Per-tile MXU least-squares predictors raced against the blend
    # predictor (models/tiled.py effort=2): the operating point that
    # dominates the reference's own fast mode (-e0, 4.227 bpp at 17
    # MPix/s single-core) — lower bpp at device-encode rates two orders
    # above it.  Marginal device method as leg 1.
    def leg_p2():
        th, tw = tiled.DEFAULT_TILE
        streams = tiled.encode_corpus(imgs, effort=2)
        result["p2_bpp"] = round(
            8.0 * sum(len(s) for s in streams) / n_px, 4
        )
        emit()
        decs = tiled.decode_batch(streams[:4])
        result["p2_roundtrip_ok"] = bool(
            all(np.array_equal(d, im) for im, d in zip(imgs[:4], decs))
        )
        emit()

        @functools.partial(jax.jit, static_argnums=1)
        def enc2_loop(tiles, n):
            def body(_, acc):
                t = (tiles + (acc & 1).astype(jnp.uint8)).astype(jnp.uint8)
                out = tiled._encode_device2_batch_impl(t)
                return out[0, :1]

            return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.int32))

        dev_t, px_dev = 0.0, 0
        for batch in batches:
            tiles = jnp.asarray(
                np.stack([tiled.to_tiles(im, th, tw) for im in batch])
            )
            np.asarray(enc2_loop(tiles, n_lo))
            np.asarray(enc2_loop(tiles, n_hi))
            t0 = time.perf_counter()
            np.asarray(enc2_loop(tiles, n_lo))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(enc2_loop(tiles, n_hi))
            t_hi = time.perf_counter() - t0
            dev_t += max(t_hi - t_lo, 1e-9)
            px_dev += (n_hi - n_lo) * sum(im.size for im in batch)
        result["p2_device_encode_mpix_s"] = round(px_dev / dev_t / 1e6, 2)

    run_leg("p2", 240, leg_p2)

    emit()
    ok = result.get("lossless_roundtrip_ok", False) and result.get(
        "p3_roundtrip_ok", True
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
