"""e2e decode pipelining sweep: group size vs corpus decode wall time.

The e2e decode is tunnel-bound (1 B/px down + compressed streams up +
~250 ms/launch); decode_batches pipelines upload/compute/fetch across
groups.  This sweeps the group size to find the overlap optimum, and
reports the measured link floor for context (VERDICT r4 item 7: get
within 70% of the floor).
"""

import json
import time
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from nblic_tpu.models import tiled
from nblic_tpu.utils import imageio


def main():
    paths = sorted(Path("/root/reference/img_kodak").glob("*.bmp"))
    imgs = [imageio.load_image(str(p)) for p in paths]
    n_px = sum(im.size for im in imgs)
    streams = tiled.encode_corpus(imgs)
    bpp = 8.0 * sum(len(s) for s in streams) / n_px
    print(json.dumps({"bpp": round(bpp, 4), "n": len(imgs)}), flush=True)

    for gsz in (24, 12, 8, 6, 4, 3):
        gs = [streams[i : i + gsz] for i in range(0, len(streams), gsz)]
        decs = [im for g in tiled.decode_batches(gs) for im in g]  # warm
        ok = all(np.array_equal(d, im) for im, d in zip(imgs, decs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            decs = [im for g in tiled.decode_batches(gs) for im in g]
            ts.append(time.perf_counter() - t0)
        t = sorted(ts)[1]
        print(json.dumps({
            "group": gsz, "decode_s": round(t, 3),
            "mpix_s": round(n_px / t / 1e6, 2), "ok": bool(ok),
        }), flush=True)


if __name__ == "__main__":
    main()
