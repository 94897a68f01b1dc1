"""Kodak-24 near-lossless comparison: NBTC vs the reference C codec.

For each ``near`` in --nears, measures bits-per-pixel and PSNR of
- the reference codec at -e2 (its near flagship; via the compiled oracle),
- NBTC profile 3 (adaptive strip engine, feedback scan),
- NBTC profile 1 (static tables; the speed path), optionally.

Usage:
    python scripts/bench_near.py [--nears 1,2,3] [--p1] [--quick]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nears", default="1,2,3")
    ap.add_argument("--p1", action="store_true", help="include profile 1")
    ap.add_argument("--quick", action="store_true", help="first 4 images")
    args = ap.parse_args()

    from nblic_tpu.models import strips, tiled
    from nblic_tpu.utils import imageio, oracle

    paths = sorted(Path("/root/reference/img_kodak").glob("*.bmp"))
    if args.quick:
        paths = paths[:4]
    imgs = [imageio.load_image(str(p)) for p in paths]
    n_px = sum(im.size for im in imgs)

    for near in [int(v) for v in args.nears.split(",")]:
        # reference -e2 at this near (bpp + PSNR of its reconstruction)
        ref_bits = 0
        ref_sq = 0.0
        for im in imgs:
            blob = oracle.ref_compress(im, near=near, effort=2)
            ref_bits += 8 * len(blob)
            rec = oracle.ref_decompress(blob)
            ref_sq += np.sum(
                (rec.astype(np.float64) - im.astype(np.float64)) ** 2
            )
        ref_bpp = ref_bits / n_px
        ref_psnr = 10 * np.log10(255.0**2 / (ref_sq / n_px))

        # profile 3 near (pipelined batches of 6)
        groups = [imgs[i : i + 6] for i in range(0, len(imgs), 6)]
        t0 = time.perf_counter()
        p3 = [s for g in strips.encode_batches(groups, near=near) for s in g]
        t_enc = time.perf_counter() - t0
        p3_bpp = 8 * sum(len(s) for s in p3) / n_px
        decs = strips.decode_batch(p3)
        sq = 0.0
        ok = True
        for im, d in zip(imgs, decs):
            ok &= np.abs(d.astype(int) - im.astype(int)).max() <= near
            sq += np.sum((d.astype(np.float64) - im.astype(np.float64)) ** 2)
        p3_psnr = 10 * np.log10(255.0**2 / (sq / n_px))
        print(
            f"near={near}: ref-e2 {ref_bpp:.4f} bpp / {ref_psnr:.2f} dB | "
            f"p3 {p3_bpp:.4f} bpp / {p3_psnr:.2f} dB "
            f"({100 * (p3_bpp / ref_bpp - 1):+.1f}% bits, "
            f"{p3_psnr - ref_psnr:+.2f} dB, contract_ok={ok}, "
            f"enc {n_px / t_enc / 1e6:.2f} MPix/s e2e)"
        )

        if args.p1:
            p1 = [tiled.encode(im, near=near, effort=1) for im in imgs]
            p1_bpp = 8 * sum(len(s) for s in p1) / n_px
            sq = sum(
                np.sum((tiled.decode(s).astype(np.float64)
                        - im.astype(np.float64)) ** 2)
                for im, s in zip(imgs, p1)
            )
            p1_psnr = 10 * np.log10(255.0**2 / (sq / n_px))
            print(
                f"          p1 {p1_bpp:.4f} bpp / {p1_psnr:.2f} dB "
                f"({100 * (p1_bpp / ref_bpp - 1):+.1f}% bits)"
            )


if __name__ == "__main__":
    main()
