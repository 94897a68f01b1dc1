"""Large-image scaling benchmark: batched 4K-class frames on one chip.

Kodak frames are small enough that the host<->device tunnel dominates
end-to-end numbers; this benchmark mosaics the corpus into 4K-class frames
(3072x4096 = 12.6 MPix each) and measures the NBTC engine at serving scale,
where per-program costs amortize.

Usage: python scripts/bench_scaling.py [n_frames]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def build_frames(n_frames: int) -> list[np.ndarray]:
    from nblic_tpu.utils import imageio

    kodak = sorted(Path("/root/reference/img_kodak").glob("*.bmp"))
    imgs = [imageio.load_image(str(p)) for p in kodak]
    land = [im if im.shape == (512, 768) else im.T for im in imgs]
    frames = []
    rng = np.random.default_rng(0)
    for k in range(n_frames):
        rows = []
        for r in range(6):  # 6 x 512 = 3072 rows
            pick = rng.permutation(len(land))[:5]  # 5 x 768 = 3840 -> pad
            row = np.concatenate([land[i] for i in pick], axis=1)
            rows.append(np.pad(row, ((0, 0), (0, 4096 - row.shape[1])),
                               mode="edge"))
        frames.append(np.concatenate(rows, axis=0))
    return frames


def main() -> int:
    import functools

    import jax.numpy as jnp

    from nblic_tpu.models import tiled

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    frames = build_frames(n_frames)
    n_px = sum(f.size for f in frames)
    print(f"{n_frames} frames of {frames[0].shape}, {n_px/1e6:.1f} MPix total")

    # end-to-end encode + decode
    streams = tiled.encode_batch(frames)  # warm/compile
    t0 = time.perf_counter()
    streams = tiled.encode_batch(frames)
    t_enc = time.perf_counter() - t0
    decs = tiled.decode_batch(streams)
    t0 = time.perf_counter()
    decs = tiled.decode_batch(streams)
    t_dec = time.perf_counter() - t0
    ok = all(np.array_equal(d, f) for d, f in zip(decs, frames))
    bpp = 8.0 * sum(len(s) for s in streams) / n_px
    print(f"e2e encode {n_px/t_enc/1e6:7.1f} MPix/s   "
          f"e2e decode {n_px/t_dec/1e6:7.1f} MPix/s   "
          f"bpp {bpp:.4f}   roundtrip={ok}")

    # device-compute (marginal in-program loop)
    tiles = jnp.asarray(
        np.stack([tiled.to_tiles(f, *tiled.DEFAULT_TILE) for f in frames])
    )

    @functools.partial(jax.jit, static_argnums=1)
    def enc_loop(tiles, n):
        def body(_, acc):
            t = (tiles + (acc & 1).astype(jnp.uint8)).astype(jnp.uint8)
            out = jax.vmap(tiled._encode_device_impl)(t)
            return out[0, :1]

        return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.int32))

    np.asarray(enc_loop(tiles, 1))
    np.asarray(enc_loop(tiles, 5))
    t0 = time.perf_counter()
    np.asarray(enc_loop(tiles, 1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(enc_loop(tiles, 5))
    t5 = time.perf_counter() - t0
    dt = (t5 - t1) / 4
    print(f"device encode {n_px/dt/1e6:7.1f} MPix/s/chip")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
