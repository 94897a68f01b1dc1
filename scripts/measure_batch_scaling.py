"""On-chip batch-scaling measurement (wall-clock, marginal method).

SCALING_r2's FLOPs-partitioning proxy shows work division on a virtual
mesh; this measures the real thing that scales on ONE chip: throughput
vs batch size.  Two curves:

- profile-1 device encode: images per program 1..16 (the encode is
  whole-plane parallel, so throughput should rise until the chip
  saturates),
- profile-3 device decode: concurrent streams 6..192 (the per-pixel walk
  is latency-bound at small lane counts, so extra concurrent streams are
  nearly free until the VPU lanes fill).

Prints one JSON line.  Run on the real chip: python
scripts/measure_batch_scaling.py [--out SCALING_r4.json]
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from nblic_tpu.models import strips, tiled
    from nblic_tpu.ops import rans as rans_ops
    from nblic_tpu.utils import imageio

    paths = sorted(Path("/root/reference/img_kodak").glob("*.bmp"))
    imgs = [imageio.load_image(str(p)) for p in paths]
    land = [np.ascontiguousarray(im.T) if im.shape[0] > im.shape[1] else im
            for im in imgs]

    # ---- profile-1 device encode vs batch size ----
    @functools.partial(jax.jit, static_argnums=1)
    def enc_loop(tiles, n):
        def body(_, acc):
            t = (tiles + (acc & 1).astype(jnp.uint8)).astype(jnp.uint8)
            out = tiled._encode_device_batch_impl(t)
            return out[0, :1]

        return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.int32))

    def marginal(run, n_lo, n_hi):
        run(n_lo)
        run(n_hi)
        t0 = time.perf_counter()
        run(n_lo)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(n_hi)
        t_hi = time.perf_counter() - t0
        return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)

    enc_curve = {}
    for bs in (1, 2, 4, 8, 16):
        batch = (land * ((bs + len(land) - 1) // len(land)))[:bs]
        tiles = jnp.asarray(
            np.stack([tiled.to_tiles(im, *tiled.DEFAULT_TILE) for im in batch])
        )
        t = marginal(lambda n: np.asarray(enc_loop(tiles, n)), 1, 9)
        enc_curve[bs] = round(sum(im.size for im in batch) / t / 1e6, 1)
        print(f"p1 encode batch={bs}: {enc_curve[bs]} MPix/s", flush=True)

    # ---- profile-3 device decode vs concurrent streams ----
    groups = [imgs[i : i + 6] for i in range(0, len(imgs), 6)]
    streams = [s for g in strips.encode_batches(groups) for s in g]
    parsed = [strips._parse(s) for s in streams]
    s_cnt = parsed[0][0][2]
    th = parsed[0][0][3]
    ww = parsed[0][0][0] if parsed[0][0][4] else parsed[0][0][1]
    tune = parsed[0][0][7]
    wmax = max(2, max(int(p[2].max()) for p in parsed))
    wmax = -(-wmax // 64) * 64
    smat = np.concatenate(
        [rans_ops.pad_streams(p[3], p[2], wmax) for p in parsed]
    ).astype(np.uint16).view(np.int16)
    smat = smat.reshape(len(parsed) * s_cnt, strips.N_PHASE, wmax)
    seg_rows = min(64, th)

    def make_loop(n_imgs):
        @functools.partial(jax.jit, static_argnums=(2,))
        def dec_loop(sm, bias, n):
            sm32 = sm.astype(jnp.int32) & 0xFFFF

            def body(_, acc):
                s2 = sm32 ^ (acc & 1)
                carry = strips._decode_carry_init(
                    s2, n_imgs, s_cnt, ww, strips.AVP_N, 0, tune
                )
                _, px = strips._decode_seg(
                    carry, s2, bias, jnp.int32(0), seg_rows, ww, s_cnt,
                    n_imgs, True, strips.AVP_N, 0, tune,
                )
                return px.reshape(-1)[:1].astype(jnp.int32)

            return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.int32))

        return dec_loop

    dec_curve = {}
    for ns in (6, 24, 96, 192):
        rep = (ns + len(parsed) - 1) // len(parsed)
        sm = np.tile(smat, (rep, 1, 1))[: ns * s_cnt]
        loop = make_loop(ns)
        bias = jnp.zeros((ns, 1), jnp.int32)
        with jax.enable_x64():
            t0 = time.perf_counter()
            loop(jnp.asarray(sm), bias, 1)
            # marginal 1-vs-2
            def run(n):
                return np.asarray(loop(jnp.asarray(sm), bias, n))

            run(1)
            run(2)
            t0 = time.perf_counter()
            run(1)
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(2)
            t_hi = time.perf_counter() - t0
        t = max(t_hi - t_lo, 1e-9)
        dec_curve[ns] = round(ns * s_cnt * seg_rows * ww / t / 1e6, 3)
        print(f"p3 decode streams={ns}: {dec_curve[ns]} MPix/s", flush=True)

    out = {
        "metric": "onchip_batch_scaling",
        "p1_device_encode_mpix_s_by_batch": enc_curve,
        "p3_device_decode_mpix_s_by_streams": dec_curve,
        "note": (
            "wall-clock marginal (in-program-loop) method on one real "
            "chip; the p3 decode curve shows the latency-bound per-pixel "
            "walk amortizing across concurrent streams (the serving-scale "
            "axis), the p1 encode curve shows whole-plane parallel encode "
            "saturating the chip"
        ),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
