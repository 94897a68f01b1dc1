"""Corpus parity harness — the framework's analog of the reference verify.py.

Sweeps a directory of images and reports, per codec path:
- interop byte-identity vs the compiled reference encoder (efforts 0-3),
- round-trip correctness (max |err| <= near),
- bits-per-pixel and PSNR tables vs the reference.

Usage:
    python scripts/verify_parity.py [img_dir] [--nears 0,1,3] [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("img_dir", nargs="?", default="/root/reference/img_kodak")
    ap.add_argument("--nears", default="0")
    ap.add_argument("--efforts", default="0,1,2,3")
    ap.add_argument("--quick", action="store_true", help="first 4 images only")
    ap.add_argument("--tiled", action="store_true", help="include NBTC paths")
    args = ap.parse_args()

    from nblic_tpu import api
    from nblic_tpu.utils import imageio, oracle

    paths = sorted(Path(args.img_dir).glob("*.bmp")) + sorted(
        Path(args.img_dir).glob("*.pgm")
    )
    if args.quick:
        paths = paths[:4]
    imgs = [(p.name, imageio.load_image(str(p))) for p in paths]
    n_px = sum(im.size for _, im in imgs)
    nears = [int(v) for v in args.nears.split(",")]
    efforts = [int(v) for v in args.efforts.split(",")]
    have_oracle = oracle.available()

    print(f"corpus: {len(imgs)} images, {n_px/1e6:.2f} MPix; oracle={have_oracle}")
    for near in nears:
        for effort in efforts:
            if near > 0 and effort == 0:
                continue
            total = 0
            exact = 0
            ok = True
            t0 = time.time()
            psnrs = []
            for _, im in imgs:
                mine = api.compress(im, near=near, effort=effort)
                total += len(mine)
                if have_oracle:
                    exact += mine == oracle.ref_compress(im, near=near, effort=effort)
                dec = api.decompress(mine)
                err = np.abs(dec.astype(int) - im.astype(int)).max()
                ok &= err <= near
                psnrs.append(psnr(im, dec))
            dt = time.time() - t0
            tag = f"interop n{near} e{effort}"
            print(
                f"{tag:>18}: {8*total/n_px:6.4f} bpp  byte-identical "
                f"{exact}/{len(imgs)}  max-err ok={ok}  "
                f"psnr {np.mean(psnrs):6.2f} dB  ({dt:5.1f}s)"
            )
        if args.tiled:
            # profile 3 (effort 3) is lossless-only
            for eff in (1, 2, 3) if near == 0 else (1, 2):
                total = 0
                ok = True
                psnrs = []
                t0 = time.time()
                for _, im in imgs:
                    s = api.compress_tiled(im, near=near, effort=eff)
                    total += len(s)
                    dec = api.decompress(s)
                    ok &= np.abs(dec.astype(int) - im.astype(int)).max() <= near
                    psnrs.append(psnr(im, dec))
                dt = time.time() - t0
                print(
                    f"{'nbtc n%d e%d' % (near, eff):>18}: {8*total/n_px:6.4f} bpp"
                    f"  round-trip ok={ok}  psnr {np.mean(psnrs):6.2f} dB"
                    f"  ({dt:5.1f}s)"
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
