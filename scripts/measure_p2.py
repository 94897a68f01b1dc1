"""Measure profile-2 (per-tile LSQ race) Kodak-24 bpp + marginal device
encode throughput on the real chip — the candidate for the speed-class
ratio point (VERDICT r4 item 4: dominate reference -e0's 4.227 bpp at
>= 200 MPix/s device encode)."""

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from nblic_tpu.models import tiled
from nblic_tpu.utils import imageio


def main():
    effort = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    th = int(sys.argv[2]) if len(sys.argv) > 2 else tiled.DEFAULT_TILE[0]
    tw = int(sys.argv[3]) if len(sys.argv) > 3 else tiled.DEFAULT_TILE[1]
    paths = sorted(Path("/root/reference/img_kodak").glob("*.bmp"))
    imgs = [imageio.load_image(str(p)) for p in paths]
    n_px = sum(im.size for im in imgs)

    t0 = time.perf_counter()
    streams = tiled.encode_corpus(imgs, effort=effort, tile_h=th, tile_w=tw)
    t_warm = time.perf_counter() - t0
    bpp = 8.0 * sum(len(s) for s in streams) / n_px
    print(json.dumps({"effort": effort, "tile": [th, tw],
                      "bpp": round(bpp, 4),
                      "warm_encode_s": round(t_warm, 1)}), flush=True)

    # round-trip spot check
    decs = tiled.decode_batch(streams[:4])
    ok = all(np.array_equal(d, im) for im, d in zip(imgs[:4], decs))
    print(json.dumps({"roundtrip4_ok": bool(ok)}), flush=True)

    # marginal device encode (same method as bench leg 1)
    groups: dict[tuple, list] = {}
    for im in imgs:
        norm = np.ascontiguousarray(im.T) if im.shape[0] > im.shape[1] else im
        groups.setdefault(norm.shape, []).append(norm)
    batches = list(groups.values())

    impl = (tiled._encode_device2_batch_impl if effort == 2
            else tiled._encode_device_batch_impl)

    @functools.partial(jax.jit, static_argnums=1)
    def enc_loop(tiles, n):
        def body(_, acc):
            t = (tiles + (acc & 1).astype(jnp.uint8)).astype(jnp.uint8)
            out = impl(t)
            return out[0, :1]

        return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.int32))

    n_lo, n_hi = 1, 9
    dev_t, px_dev = 0.0, 0
    for batch in batches:
        tiles = jnp.asarray(
            np.stack([tiled.to_tiles(im, th, tw) for im in batch])
        )
        np.asarray(enc_loop(tiles, n_lo))
        np.asarray(enc_loop(tiles, n_hi))
        t0 = time.perf_counter()
        np.asarray(enc_loop(tiles, n_lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(enc_loop(tiles, n_hi))
        t_hi = time.perf_counter() - t0
        dev_t += max(t_hi - t_lo, 1e-9)
        px_dev += (n_hi - n_lo) * sum(im.size for im in batch)
    print(json.dumps({
        "device_encode_mpix_s": round(px_dev / dev_t / 1e6, 2)
    }), flush=True)


if __name__ == "__main__":
    main()
