"""Public API of nblic_tpu.

Two families of entry points:

- ``compress`` / ``decompress``: the interop containers (``Q0.2`` at effort 0,
  ``NBLIC0.3`` at efforts 1..3) — bit-exact with the reference C codec. The
  ``backend`` argument selects the native host runtime (default, fast) or the
  JAX device engines ("jax", device-native, used for validation and research).
- ``compress_tiled`` / ``decompress_tiled``: the TPU-native ``NBTC`` tiled
  container — per-tile parallel encode *and* decode on device, the framework's
  performance path.

Dispatch mirrors the reference CLI (NBLIC_main.c:182-188, 223-226): encode
selects the effort-0 engine iff near==0 and effort==0; decode sniffs the
container magic.
"""

from __future__ import annotations

import numpy as np

from .constants import EFFORTS, MAX_NEAR
from .utils.container import check_size, sniff_format


def _validate(img: np.ndarray, near: int, effort: int) -> np.ndarray:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("expected a 2-D gray-8 image")
    check_size(*img.shape)
    if not 0 <= near <= MAX_NEAR:
        raise ValueError(f"near must be in 0..{MAX_NEAR}")
    if effort not in EFFORTS:
        raise ValueError(f"effort must be one of {EFFORTS}")
    if near > 0 and effort == 0:
        # near>0 forces the effort>=1 engine, like the reference
        # (NBLIC_main.c:182-188 + NBLIC.c:770).
        effort = 1
    return img, near, effort


def compress(
    img: np.ndarray,
    near: int = 0,
    effort: int = 1,
    backend: str = "native",
    n_threads: int = 0,
) -> bytes:
    """Encode a gray-8 image into an interop container (.nblic byte stream)."""
    img, near, effort = _validate(img, near, effort)
    if backend == "native":
        from . import runtime

        if near == 0 and effort == 0:
            return runtime.q_encode(img, n_threads=n_threads)
        return runtime.n_encode(img, near=near, effort=effort)
    if backend == "jax":
        if near == 0 and effort == 0:
            from .models import qnblic

            return qnblic.encode(img)
        from .models import nblic

        return nblic.encode(img, near=near, effort=effort)
    raise ValueError(f"unknown backend {backend!r}")


def decompress(stream: bytes, backend: str = "native") -> np.ndarray:
    """Decode any container of the format family back to a gray-8 image."""
    fmt = sniff_format(stream)
    if fmt == "nbtc":
        return decompress_tiled(stream)
    if backend == "native":
        from . import runtime

        if fmt == "qnblic":
            return runtime.q_decode(stream)
        img, _, _ = runtime.n_decode(stream)
        return img
    if backend == "jax":
        if fmt == "qnblic":
            from .models import qnblic

            return qnblic.decode(stream)
        from .models import nblic

        return nblic.decode(stream)
    raise ValueError(f"unknown backend {backend!r}")


def compress_tiled(img: np.ndarray, near: int = 0, **kwargs) -> bytes:
    """Encode with the TPU-native tile-parallel engine (NBTC container)."""
    from .models import tiled

    return tiled.encode(img, near=near, **kwargs)


def decompress_tiled(stream: bytes, **kwargs) -> np.ndarray:
    """Decode an NBTC container (tile-parallel on device)."""
    from .models import tiled

    return tiled.decode(stream, **kwargs)
