"""Profile-3 ratio experiment harness: Kodak-24 bpp under variant knobs.

Encoder-only (bpp comes from the emitted containers; round-trip safety is
covered by tests once a variant is promoted to a real format).  Runs on
whatever backend JAX picks — use the real chip for speed.

Usage:
    python scripts/p3_sweep.py --th 256 [--row-frozen]
        [--quick] [--group 6] [--near 0]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--th", type=int, default=256)
    ap.add_argument("--near", type=int, default=0)
    ap.add_argument("--row-frozen", action="store_true")
    ap.add_argument("--group", type=int, default=6)
    ap.add_argument("--quick", action="store_true", help="first 6 images")
    args = ap.parse_args()

    from nblic_tpu.models import strips
    from nblic_tpu.utils import imageio

    paths = sorted(Path("/root/reference/img_kodak").glob("*.bmp"))
    if args.quick:
        paths = paths[: args.group]
    imgs = [imageio.load_image(str(p)) for p in paths]
    n_px = sum(im.size for im in imgs)

    groups = [imgs[i : i + args.group] for i in range(0, len(imgs), args.group)]

    def run():
        works = [
            strips._encode_dispatch(
                g, args.th, args.near, row_frozen=args.row_frozen,
            )
            for g in groups
        ]
        return [s for w in works for s in strips._encode_finalize(w)]

    t0 = time.perf_counter()
    streams = run()
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    streams = run()
    t_warm = time.perf_counter() - t0
    bpp = 8.0 * sum(len(s) for s in streams) / n_px
    print(json.dumps({
        "th": args.th, "near": args.near,
        "row_frozen": args.row_frozen,
        "n_images": len(imgs), "bpp": round(bpp, 4),
        "enc_mpix_s_e2e": round(n_px / t_warm / 1e6, 3),
        "cold_s": round(t_cold, 1), "warm_s": round(t_warm, 1),
    }))


if __name__ == "__main__":
    main()
