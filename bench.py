"""Benchmark: NBTC TPU-native codec on the Kodak-24 corpus (real chip).

Prints ONE JSON line:
  metric      = batched NBTC lossless encode throughput on one chip
  vs_baseline = ratio vs the reference C encoder at -e1 on one CPU core
                (5.1 MPix/s measured in this container; BASELINE.md)
Extra fields: decode throughput, bits-per-pixel vs the reference efforts,
and round-trip validity.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

import jax

# persistent compile cache: the fused encode program takes minutes to build
# through the remote-compile tunnel; cache it across bench runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

KODAK = Path("/root/reference/img_kodak")
BASELINE_E1_ENC_MPIX_S = 5.1  # BASELINE.md: reproduced single-core C at -e1
REF_BPP = {"e0": 4.227, "e1": 4.146, "e2": 4.088, "e3": 4.066}


def main() -> int:
    from nblic_tpu.models import tiled
    from nblic_tpu.utils import imageio

    paths = sorted(KODAK.glob("*.bmp"))
    imgs = [imageio.load_image(str(p)) for p in paths]
    if not imgs:
        print(json.dumps({"metric": "error", "value": 0, "unit": "",
                          "vs_baseline": 0, "note": "no corpus"}))
        return 1
    n_px = sum(im.size for im in imgs)

    # e2e production path: orientation-merged corpus encode (one device
    # program + one compacted fetch), batched single-program decode
    def encode_all():
        return tiled.encode_corpus(imgs)

    def decode_all(streams):
        return tiled.decode_batch(streams)

    # ---- warmup (compile) ----
    streams = encode_all()
    decs = decode_all(streams)

    # ---- timed encode (steady state, median of 5) ----
    reps = 5
    t_encs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        streams = encode_all()
        t_encs.append(time.perf_counter() - t0)
    t_enc = sorted(t_encs)[reps // 2]

    # ---- timed decode ----
    t_decs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        decs = decode_all(streams)
        t_decs.append(time.perf_counter() - t0)
    t_dec = sorted(t_decs)[reps // 2]

    ok = all(np.array_equal(d, im) for im, d in zip(imgs, decs))

    # ---- profile 3 (ratio flagship): corpus bits + round-trip ----
    from nblic_tpu.models import strips

    def p3_encode_all():
        groups = [imgs[i : i + 6] for i in range(0, len(imgs), 6)]
        out = []
        for streams in strips.encode_batches(groups):
            out += streams
        return out

    p3_streams = p3_encode_all()  # warmup (compile)
    strips.decode_batch(p3_streams)
    t0 = time.perf_counter()
    p3_streams = p3_encode_all()
    t_p3_enc = time.perf_counter() - t0
    p3_bpp = 8.0 * sum(len(s) for s in p3_streams) / n_px
    t0 = time.perf_counter()
    p3_decs = strips.decode_batch(p3_streams)
    t_p3_dec = time.perf_counter() - t0
    p3_ok = all(np.array_equal(d, im) for im, d in zip(imgs, p3_decs))

    # ---- profile 3 marginal device compute ----
    # Same marginal in-program-loop method as profile 1 below.  The two
    # encode stages (modeling | coding) are measured as separate loops —
    # fusing them into one program is the known compile hazard the
    # production split avoids — and their times add (they run back to
    # back on the same chip).  The xor keeps a carried data dependence
    # while every perturbed value stays in the coder's valid domain.
    import functools

    import jax
    import jax.numpy as jnp

    p3_n_lo, p3_n_hi = 1, 3
    group6 = [
        np.ascontiguousarray(im.T) if im.shape[0] > im.shape[1] else im
        for im in imgs[:6]
    ]
    xs6 = jnp.asarray(
        np.stack([strips._to_strips(im, strips.TH_DEFAULT) for im in group6])
    ).astype(jnp.int32)

    @functools.partial(jax.jit, static_argnums=(1,))
    def p3_model_loop(xs, n):
        def body(_, acc):
            x = xs ^ (acc & 1)
            planes = jax.vmap(
                strips._model_planes, in_axes=(0, None, None)
            )(x, strips.AVP_N, False)
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
        planes6 = strips._model_batch_jit(xs6, strips.AVP_N, False)
        acc0 = jnp.zeros((1,), jnp.int32)
        t_code = marginal(
            lambda n: np.asarray(p3_code_loop(*planes6, acc0, n))
        )
    px6 = sum(im.size for im in group6)
    p3_dev_enc_mpix = px6 / (t_model + t_code) / 1e6

    # decode: one SEG_ROWS-row segment program per marginal iteration
    # (perturbed streams decode garbage pixels but every op stays
    # in-domain; trip counts are static so the program time is
    # representative).  Whole-strip decode is several such programs back
    # to back — single-program time is bounded on the tunnel worker — so
    # the per-row device cost measured here is the honest per-chip rate.
    p3_parsed = [strips._parse(s) for s in p3_streams]
    s_cnt = p3_parsed[0][0][2]
    th_p3 = p3_parsed[0][0][3]
    ww = p3_parsed[0][0][0] if p3_parsed[0][0][4] else p3_parsed[0][0][1]
    wmax = max(2, max(int(p[2].max()) for p in p3_parsed))
    wmax = -(-wmax // 64) * 64
    from nblic_tpu.ops import rans as rans_ops

    smat6 = np.concatenate(
        [rans_ops.pad_streams(p[3], p[2], wmax) for p in p3_parsed[:6]]
    ).astype(np.uint16).view(np.int16)
    smat6 = jnp.asarray(
        smat6.reshape(6 * s_cnt, strips.N_PHASE, wmax)
    )
    bias6 = jnp.zeros((6, 1), jnp.int32)  # adaptive: ignored
    # 64 rows per marginal iteration and a 1-vs-2 trip count: the n_hi
    # program stays ~25 s, safely under the worker's execution bound
    seg_rows = min(64, th_p3)

    @functools.partial(jax.jit, static_argnums=(2,))
    def p3_dec_loop(smat, bias, n):
        smat32 = smat.astype(jnp.int32) & 0xFFFF

        def body(_, acc):
            s2 = smat32 ^ (acc & 1)
            carry = strips._decode_carry_init(
                s2, 6, s_cnt, ww, strips.AVP_N, 0, strips.TUNE
            )
            _, px = strips._decode_seg(
                carry, s2, bias, jnp.int32(0), seg_rows, ww, s_cnt, 6,
                True, strips.AVP_N, 0, strips.TUNE,
            )
            return px.reshape(-1)[:1].astype(jnp.int32)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.int32))

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

    with jax.enable_x64():
        t_p3dec = dec_marginal(
            lambda n: np.asarray(p3_dec_loop(smat6, bias6, n))
        )
    px_seg = 6 * s_cnt * seg_rows * ww
    p3_dev_dec_mpix = px_seg / t_p3dec / 1e6

    # batch per distinct shape for the marginal device-compute loops below
    groups: dict[tuple, list] = {}
    for im in imgs:
        norm = np.ascontiguousarray(im.T) if im.shape[0] > im.shape[1] else im
        groups.setdefault(norm.shape, []).append(norm)
    batches = list(groups.values())
    all_streams = tiled.encode_batches(batches)

    # device-compute-only encode throughput. The tunnel costs ~250 ms per
    # program execution and block_until_ready is a no-op, so the only honest
    # device measurement is marginal: run the encode N times INSIDE one
    # program (with a carried data dependence so XLA can't hoist it) and
    # divide the time difference by the extra iterations.
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=1)
    def enc_loop(tiles, n):
        def body(_, acc):
            t = (tiles + (acc & 1).astype(jnp.uint8)).astype(jnp.uint8)
            out = tiled._encode_device_batch_impl(t)
            return out[0, :1]

        return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.int32))

    n_lo, n_hi = 1, 9
    dev_t = 0.0
    px_dev = 0
    for batch in batches:
        tiles = jnp.asarray(
            np.stack([tiled.to_tiles(im, *tiled.DEFAULT_TILE) for im in batch])
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
    dev_enc_mpix = px_dev / dev_t / 1e6

    # device-compute decode throughput via the Mosaic kernel, same marginal
    # method (the xor keeps a carried data dependence; decode of perturbed
    # words is still fixed-trip and the kernel clamps its window loads)
    from nblic_tpu.ops import pallas_decode

    @functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11))
    def dec_loop(streams, n_active, bias, hist_n, acc, wcols, th, tw, near,
                 g, profile, n):
        def body(_, carry):
            s = streams ^ (carry[0] & 1)
            out = pallas_decode.decode_groups_pallas(
                s, n_active, bias, hist_n, acc, wcols, th, tw, near, g,
                profile,
            )
            return out.reshape(-1)[:1].astype(jnp.int32)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.int32))

    dev_t = 0.0
    px_dev = 0
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
        wc = jnp.asarray(np.concatenate([q.weight_cols() for q in parsed]))
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
    dev_dec_mpix = px_dev / dev_t / 1e6
    total_bytes = sum(len(s) for s in streams)
    bpp = 8.0 * total_bytes / n_px
    enc_mpix = n_px / t_enc / 1e6
    dec_mpix = n_px / t_dec / 1e6

    result = {
        "metric": "nbtc_kodak24_device_encode_throughput",
        "value": round(dev_enc_mpix, 2),
        "unit": "MPix/s/chip",
        "vs_baseline": round(dev_enc_mpix / BASELINE_E1_ENC_MPIX_S, 2),
        "device_decode_mpix_s": round(dev_dec_mpix, 2),
        "e2e_encode_mpix_s": round(enc_mpix, 2),
        "e2e_decode_mpix_s": round(dec_mpix, 2),
        "bpp": round(bpp, 4),
        "p3_bpp": round(p3_bpp, 4),
        "p3_encode_mpix_s": round(n_px / t_p3_enc / 1e6, 2),
        "p3_decode_mpix_s": round(n_px / t_p3_dec / 1e6, 2),
        "p3_device_encode_mpix_s": round(p3_dev_enc_mpix, 2),
        "p3_device_decode_mpix_s": round(p3_dev_dec_mpix, 2),
        "p3_roundtrip_ok": bool(p3_ok),
        "ref_bpp": REF_BPP,
        "lossless_roundtrip_ok": bool(ok),
        "n_images": len(imgs),
        "encode_s": round(t_enc, 3),
        "decode_s": round(t_dec, 3),
    }

    # measure the tunnel link at bench time: e2e is transfer-bound here, so
    # record the physical floor next to the e2e numbers (decode must move
    # 1 B/px down; encode moves 1 B/px up + the compact containers down)
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
    link_up = mb / t_up
    link_dn = mb / t_dn
    result["tunnel_up_MBps"] = round(link_up, 1)
    result["tunnel_down_MBps"] = round(link_dn, 1)
    result["e2e_decode_link_floor_mpix_s"] = round(link_dn, 1)  # 1 B/px down
    result["note"] = (
        "device_* are marginal per-chip compute times (N encodes inside "
        "one program); e2e_* are bounded by the axon tunnel (~250 ms/launch "
        "+ the tunnel_*_MBps link rates measured just now: decode must move "
        "1 B/px down, so e2e decode cannot exceed the link floor on this "
        "host). p3_* is the adaptive strip engine (ratio flagship; compare "
        "p3_bpp against ref_bpp e2/e3)"
    )
    print(json.dumps(result))
    return 0 if ok and p3_ok else 1


if __name__ == "__main__":
    sys.exit(main())
