"""Large-image contract check: encode/decode a 67-MPix frame on one chip.

The reference accepts up to 65535x65535 / 1e8 px (NBLIC.h:29-31); this
drives the NBTC whole-plane encode passes at 8192x8192 (67.1 MPix) to show
they fit device memory and to record the throughput.  Usage:

    python scripts/bench_bigimage.py [side]
"""

import sys
import time
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main() -> int:
    from nblic_tpu.models import tiled
    from nblic_tpu.utils import imageio

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    kodak = sorted(Path("/root/reference/img_kodak").glob("*.bmp"))
    srcs = [imageio.load_image(str(p)) for p in kodak[:6]]
    # mosaic of real content (synthetic noise would say nothing about bits)
    rows = []
    k = 0
    th = max(im.shape[0] for im in srcs)
    while sum(r.shape[0] for r in rows) < side:
        row = []
        w = 0
        while w < side:
            im = srcs[k % len(srcs)]
            k += 1
            row.append(np.pad(im, ((0, th - im.shape[0]), (0, 0)), mode="edge"))
            w += im.shape[1]
        rows.append(np.concatenate(row, axis=1)[:, :side])
    img = np.concatenate(rows, axis=0)[:side, :side]
    n_px = img.size
    print(f"image {img.shape} = {n_px/1e6:.1f} MPix")

    t0 = time.perf_counter()
    stream = tiled.encode(img)
    t_enc = time.perf_counter() - t0
    bpp = 8.0 * len(stream) / n_px
    print(f"encode (cold) {t_enc:.1f}s  {len(stream)} bytes  {bpp:.4f} bpp")

    t0 = time.perf_counter()
    stream = tiled.encode(img)
    t_enc = time.perf_counter() - t0
    print(f"encode (warm) {t_enc:.2f}s = {n_px/t_enc/1e6:.1f} MPix/s e2e")

    t0 = time.perf_counter()
    dec = tiled.decode(stream)
    t_dec = time.perf_counter() - t0
    ok = np.array_equal(dec, img)
    print(f"decode (cold) {t_dec:.1f}s  roundtrip {ok}")

    t0 = time.perf_counter()
    dec = tiled.decode(stream)
    t_dec = time.perf_counter() - t0
    print(f"decode (warm) {t_dec:.2f}s = {n_px/t_dec/1e6:.1f} MPix/s e2e")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
