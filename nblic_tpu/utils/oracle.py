"""Differential-test oracle: drive the compiled reference binary.

The reference C codec (/root/reference/nblic_codec) is the ground truth for
bit-exactness of the interop containers. Tests use this module to encode/decode
through the reference CLI and compare streams and pixels (the role verify.py
plays in the reference repo: /root/reference/verify.py).
"""

from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np

from . import imageio

REFERENCE_SRC = os.environ.get("NBLIC_REFERENCE_SRC", "/root/reference/src")
_BUILD_DIR = os.path.join(tempfile.gettempdir(), "nblic_oracle")
REFERENCE_BIN = os.environ.get(
    "NBLIC_REFERENCE_BIN", os.path.join(_BUILD_DIR, "nblic_codec")
)


def _ensure_built() -> bool:
    """Compile the reference codec (gcc src/*.c -O3) into a temp cache if the
    bundled binary is not directly executable in this environment."""
    if os.access(REFERENCE_BIN, os.X_OK):
        return True
    if not os.path.isdir(REFERENCE_SRC):
        return False
    os.makedirs(_BUILD_DIR, exist_ok=True)
    import fcntl
    import glob

    # inter-process flock: concurrent test workers race to build; one
    # compiles, the rest wait and re-check
    with open(os.path.join(_BUILD_DIR, ".lock"), "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            if os.access(REFERENCE_BIN, os.X_OK):
                return True
            srcs = sorted(glob.glob(os.path.join(REFERENCE_SRC, "*.c")))
            tmp = REFERENCE_BIN + ".tmp"
            proc = subprocess.run(
                ["gcc", "-O3", "-o", tmp, *srcs],
                capture_output=True, text=True,
            )
            if proc.returncode == 0 and os.access(tmp, os.X_OK):
                os.replace(tmp, REFERENCE_BIN)
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)
    return os.access(REFERENCE_BIN, os.X_OK)


def available() -> bool:
    return _ensure_built()


def _run(args: list[str]) -> None:
    if not _ensure_built():
        raise RuntimeError("reference codec unavailable")
    proc = subprocess.run(
        [REFERENCE_BIN, *args], capture_output=True, text=True, timeout=600
    )
    if proc.returncode != 0:
        raise RuntimeError(f"reference codec failed: {proc.stdout} {proc.stderr}")


def ref_compress(img: np.ndarray, near: int = 0, effort: int = 1) -> bytes:
    """Encode with the reference binary; returns the .nblic byte stream."""
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in.pgm")
        dst = os.path.join(d, "out.nblic")
        imageio.save_image(src, img)
        _run(["-c", f"-n{near}", f"-e{effort}", src, dst])
        with open(dst, "rb") as f:
            return f.read()


def ref_decompress(stream: bytes) -> np.ndarray:
    """Decode with the reference binary; returns the (H, W) uint8 image."""
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in.nblic")
        dst = os.path.join(d, "out.pgm")
        with open(src, "wb") as f:
            f.write(stream)
        _run(["-d", src, dst])
        return imageio.load_image(dst)
