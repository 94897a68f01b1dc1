"""Command-line driver, flag-compatible with the reference CLI.

Reference surface (NBLIC_main.c:52-132): ``-c`` compress, ``-d`` decompress,
``-n<int>`` near, ``-e<digit>`` effort, ``-v``/``-V`` verbosity, ``-t``
multithread; switches are combinable (e.g. ``-cn2e2V``) and order-free.
Extensions of this framework: ``--tiled`` (TPU-native NBTC container),
``--backend native|jax``, ``--tile-h/--tile-w``.

Usage:
    python -m nblic_tpu -c [-n0 -e1] in.{bmp,pgm,pnm} out.nblic
    python -m nblic_tpu -d in.nblic out.{bmp,pgm,pnm}
"""

from __future__ import annotations

import os
import sys
import time

# Honor JAX_PLATFORMS=cpu on platforms where an accelerator plugin
# registers itself as the default regardless (the axon TPU tunnel does):
# pin the default device to CPU before any compute so CPU-requested CLI
# runs are hermetic (tests run the CLI this way; real-chip use leaves
# JAX_PLATFORMS unset).
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    try:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except Exception:
        pass

from . import api
from .utils import imageio

USAGE = """\
nblic_tpu: TPU-native lossless & near-lossless gray-8 image codec
  compress:    python -m nblic_tpu -c [-switches] <input-image> <output.nblic>
  decompress:  python -m nblic_tpu -d [-switches] <input.nblic> <output-image>
  switches:
    -n<number>   near: 0 (lossless) or 1..9 (near-lossless)
    -e<number>   effort: 0 (fastest) .. 3 (slowest); near>0 forces effort>=1
    -v / -V      verbose / verbose with progress
    -t           multithread host encode (effort 0)
    --tiled      use the TPU-native tile-parallel NBTC container
    --backend=B  'native' (host runtime, default) or 'jax' (device engines)
    --tile-h=N / --tile-w=N   NBTC tile geometry (default 64x64)
"""


def parse_args(argv: list[str]) -> dict:
    opts = {
        "decompress": None,
        "near": 0,
        "effort": 1,
        "verbose": 0,
        "threads": 0,
        "tiled": False,
        "backend": "native",
        "tile_h": None,
        "tile_w": None,
        "files": [],
    }
    for arg in argv:
        if arg.startswith("--"):
            key, _, value = arg[2:].partition("=")
            if key == "tiled":
                opts["tiled"] = True
            elif key == "backend":
                opts["backend"] = value
            elif key == "tile-h":
                opts["tile_h"] = int(value)
            elif key == "tile-w":
                opts["tile_w"] = int(value)
            else:
                raise ValueError(f"unknown option --{key}")
        elif arg.startswith("-") and len(arg) > 1:
            i = 1
            while i < len(arg):
                ch = arg[i]
                if ch in "cC":
                    opts["decompress"] = False
                elif ch in "dD":
                    opts["decompress"] = True
                elif ch == "v":
                    opts["verbose"] = 1
                elif ch == "V":
                    opts["verbose"] = 2
                elif ch in "tT":
                    opts["threads"] = -1  # auto
                elif ch in "nN":
                    num = ""
                    while i + 1 < len(arg) and arg[i + 1].isdigit():
                        i += 1
                        num += arg[i]
                    opts["near"] = int(num or 0)
                elif ch in "eE":
                    if i + 1 < len(arg) and arg[i + 1].isdigit():
                        i += 1
                        opts["effort"] = int(arg[i])
                i += 1
        else:
            opts["files"].append(arg)
    return opts


def main(argv: list[str] | None = None) -> int:
    try:
        opts = parse_args(sys.argv[1:] if argv is None else argv)
    except ValueError as exc:
        print(f"  ***Error : {exc}")
        print(USAGE)
        return -1
    files = opts["files"]
    if opts["decompress"] is None or len(files) != 2:
        print(USAGE)
        return -1
    src, dst = files
    verbose = opts["verbose"]
    if verbose:
        print(f"  input  file        = {src}")
        print(f"  output file        = {dst}")

    if verbose >= 2 and opts["backend"] == "native" and not opts["tiled"]:
        from . import runtime

        runtime.set_verbose(verbose)
    t0 = time.time()
    try:
        if not opts["decompress"]:
            img = imageio.load_image(src)
            h, w = img.shape
            if verbose:
                print(f"  input image shape  = {w} x {h}")
            if opts["tiled"]:
                kwargs = {"effort": opts["effort"]}
                if opts["tile_h"]:
                    kwargs["tile_h"] = opts["tile_h"]
                if opts["tile_w"]:
                    kwargs["tile_w"] = opts["tile_w"]
                stream = api.compress_tiled(img, near=opts["near"], **kwargs)
            else:
                stream = api.compress(
                    img,
                    near=opts["near"],
                    effort=opts["effort"],
                    backend=opts["backend"],
                    n_threads=opts["threads"],
                )
            with open(dst, "wb") as f:
                f.write(stream)
            if verbose:
                n = len(stream)
                print(f"  effort             = {opts['effort']}")
                lossmode = "lossless" if opts["near"] == 0 else "lossy"
                print(f"  near               = {opts['near']} ({lossmode})")
                print(f"  output size        = {n} B")
                print(f"  compression rate   = {w * h / n:.5f}")
                print(f"  compression bpp    = {8.0 * n / (w * h):.5f}")
        else:
            with open(src, "rb") as f:
                stream = f.read()
            if verbose:
                print(f"  input size         = {len(stream)} B")
            img = api.decompress(stream, backend=opts["backend"])
            h, w = img.shape
            imageio.save_image(dst, img)
            if verbose:
                print(f"  output image shape = {w} x {h}")
        if verbose:
            px = img.shape[0] * img.shape[1]
            dt = time.time() - t0
            print(f"  time               = {dt:.3f} s ({px / dt / 1e6:.2f} MPix/s)")
    except (ValueError, RuntimeError, OSError) as exc:
        print(f"  ***Error : {exc}")
        return -1
    return 0


if __name__ == "__main__":
    sys.exit(main())
