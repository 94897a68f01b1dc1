"""nblic_tpu — a TPU-native lossless / near-lossless grayscale image-compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
WangXuan95/NBLIC-Image-Compression (reference mounted at /root/reference):

- ``models.qnblic`` / ``models.nblic``: interop engines producing / consuming the
  reference's ``Q0.2`` (static rANS) and ``NBLIC0.3`` (adaptive binary range coder)
  containers bit-exactly (reference: src/QNBLIC.c, src/NBLIC.c).
- ``models.tiled``: the flagship TPU-native tile-parallel engine ("NBTC" container):
  per-tile model state + per-tile rANS streams, one `lax.scan` over the pixel index
  vectorized across (batch x tiles) lanes, sharded over a `jax.sharding.Mesh`.
- ``runtime``: a C++ host runtime (ctypes-bound) for the inherently serial interop
  entropy folds and high-throughput host-side batch encode/decode.
- ``utils.imageio``: BMP / PGM / PNM readers and writers matching the reference's
  pixel I/O contract (reference: src/FileIO.c).

Public API lives in :mod:`nblic_tpu.api`.
"""

from .api import (  # noqa: F401
    compress,
    decompress,
    compress_tiled,
    decompress_tiled,
    MAX_NEAR,
    EFFORTS,
)

__version__ = "0.1.0"

_SUBPACKAGES = ("models", "ops", "parallel", "runtime", "utils")


def __getattr__(name):
    if name in _SUBPACKAGES:
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
