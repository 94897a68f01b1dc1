"""ctypes bindings to the nbrt native host runtime (builds on demand).

The native library implements the interop containers' inherently serial
entropy folds at full host speed; the JAX engines provide the device-native
paths. ``load()`` compiles ``libnbrt.so`` with g++ on first use (no pip
dependencies; pybind11 is unavailable in this environment by design).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libnbrt.so")
_lock = threading.Lock()
_lib = None


class RuntimeUnavailable(RuntimeError):
    pass


def _build() -> None:
    # inter-process flock: concurrent test workers may import the package
    # simultaneously; exactly one runs make, the rest wait then see the
    # fresh .so (the staleness check is repeated under the lock)
    import fcntl

    lock_path = _LIB_PATH + ".lock"
    with open(lock_path, "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            if not _sources_newer_than_lib():
                return
            proc = subprocess.run(
                ["make", "-s", f"OUT={_LIB_PATH}"],
                cwd=_SRC_DIR,
                capture_output=True,
                text=True,
            )
            if proc.returncode != 0:
                raise RuntimeUnavailable(
                    f"nbrt build failed:\n{proc.stdout}\n{proc.stderr}"
                )
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)


def _sources_newer_than_lib() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    for name in os.listdir(_SRC_DIR):
        if name.endswith((".cpp", ".hpp", ".h")):
            if os.path.getmtime(os.path.join(_SRC_DIR, name)) > lib_mtime:
                return True
    return False


def load() -> ctypes.CDLL:
    """Load (building if stale) the native runtime library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if _sources_newer_than_lib():
            _build()
        lib = ctypes.CDLL(_LIB_PATH)

        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64 = ctypes.c_int64
        i32 = ctypes.c_int32

        lib.nbrt_q_encode.restype = i64
        lib.nbrt_q_encode.argtypes = [u8p, i32, i32, u8p, i64, i32]
        lib.nbrt_q_decode.restype = i64
        lib.nbrt_q_decode.argtypes = [u8p, i64, u8p, i64, i32p, i32p]
        lib.nbrt_n_encode.restype = i64
        lib.nbrt_n_encode.argtypes = [u8p, i32, i32, i32, i32, u8p, i64, u8p]
        lib.nbrt_n_decode.restype = i64
        lib.nbrt_n_decode.argtypes = [u8p, i64, u8p, i64, i32p, i32p, i32p, i32p]
        lib.nbrt_q_model.restype = i64
        lib.nbrt_q_model.argtypes = [u8p, i32, i32, u8p, u8p, u32p]
        lib.nbrt_q_stage1.restype = i64
        lib.nbrt_q_stage1.argtypes = [
            u8p, i32, i32, u8p, ctypes.POINTER(ctypes.c_uint16)
        ]
        i16p = ctypes.POINTER(ctypes.c_int16)
        lib.nbrt_n_stage1.restype = i64
        lib.nbrt_n_stage1.argtypes = [u8p, i32, i32, u8p, i16p, i16p, i16p, i16p]
        lib.nbrt_version.restype = ctypes.c_char_p
        lib.nbrt_version.argtypes = []
        lib.nbrt_set_verbose.restype = None
        lib.nbrt_set_verbose.argtypes = [ctypes.c_int32]
        _lib = lib
        return _lib


def available() -> bool:
    try:
        load()
        return True
    except (RuntimeUnavailable, OSError):
        return False


def _as_u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _check(ret: int) -> int:
    if ret < 0:
        raise RuntimeError(f"nbrt error {ret}")
    return int(ret)


def q_encode(img: np.ndarray, n_threads: int = 0) -> bytes:
    """Effort-0 encode to a Q0.2 stream (bit-exact with the reference encoder)."""
    lib = load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 8) if h >= 512 and h * w > 512 * 512 else 1
    cap = 2 * h * w + (1 << 16)
    out = np.empty(cap, dtype=np.uint8)
    n = _check(lib.nbrt_q_encode(_as_u8p(img), h, w, _as_u8p(out), cap, n_threads))
    return out[:n].tobytes()


def q_decode(stream: bytes) -> np.ndarray:
    lib = load()
    buf = np.frombuffer(stream, dtype=np.uint8)
    cap = 100_000_000
    img = np.empty(cap, dtype=np.uint8)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    _check(
        lib.nbrt_q_decode(
            _as_u8p(buf), len(stream), _as_u8p(img), cap, ctypes.byref(h), ctypes.byref(w)
        )
    )
    return img[: h.value * w.value].reshape(h.value, w.value).copy()


def n_encode(
    img: np.ndarray, near: int = 0, effort: int = 1, want_reconstruction: bool = False
):
    """Effort-1..3 encode to an NBLIC0.3 stream (bit-exact with the reference)."""
    lib = load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    cap = 4 * h * w + (1 << 16)
    out = np.empty(cap, dtype=np.uint8)
    rec = np.empty((h, w), dtype=np.uint8) if want_reconstruction else None
    rec_ptr = _as_u8p(rec) if rec is not None else ctypes.POINTER(ctypes.c_uint8)()
    n = _check(
        lib.nbrt_n_encode(_as_u8p(img), h, w, near, effort, _as_u8p(out), cap, rec_ptr)
    )
    stream = out[:n].tobytes()
    return (stream, rec) if want_reconstruction else stream


def n_decode(stream: bytes):
    lib = load()
    buf = np.frombuffer(stream, dtype=np.uint8)
    cap = 100_000_000
    img = np.empty(cap, dtype=np.uint8)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    near = ctypes.c_int32()
    effort = ctypes.c_int32()
    _check(
        lib.nbrt_n_decode(
            _as_u8p(buf),
            len(stream),
            _as_u8p(img),
            cap,
            ctypes.byref(h),
            ctypes.byref(w),
            ctypes.byref(near),
            ctypes.byref(effort),
        )
    )
    return (
        img[: h.value * w.value].reshape(h.value, w.value).copy(),
        near.value,
        effort.value,
    )


def q_stage1(img: np.ndarray):
    """Effort-0 parallel-stage oracle: per-pixel (px0, adr) planes.

    Ground truth for the vectorized device modeling ops (ops/predict.py).
    """
    lib = load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    px0 = np.empty((h, w), dtype=np.uint8)
    adr = np.empty((h, w), dtype=np.uint16)
    _check(
        lib.nbrt_q_stage1(
            _as_u8p(img), h, w, _as_u8p(px0),
            adr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        )
    )
    return px0, adr


def n_stage1(img: np.ndarray):
    """Effort-1 lossless parallel-stage oracle: (px0, qu, qv, qw, adr) planes."""
    lib = load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    px0 = np.empty((h, w), dtype=np.uint8)
    qu = np.empty((h, w), dtype=np.int16)
    qv = np.empty((h, w), dtype=np.int16)
    qw = np.empty((h, w), dtype=np.int16)
    adr = np.empty((h, w), dtype=np.int16)
    i16p = ctypes.POINTER(ctypes.c_int16)
    _check(
        lib.nbrt_n_stage1(
            _as_u8p(img), h, w, _as_u8p(px0),
            qu.ctypes.data_as(i16p), qv.ctypes.data_as(i16p),
            qw.ctypes.data_as(i16p), adr.ctypes.data_as(i16p),
        )
    )
    return px0, qu, qv, qw, adr


def q_model(img: np.ndarray):
    """Effort-0 modeling pass: per-pixel (qd, y) planes + 12x256 histogram.

    Used by tests to cross-check the JAX modeling kernels against the native
    model, and as a host-side reference for the device entropy path.
    """
    lib = load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    qd = np.empty((h, w), dtype=np.uint8)
    y = np.empty((h, w), dtype=np.uint8)
    hist = np.zeros((12, 256), dtype=np.uint32)
    _check(
        lib.nbrt_q_model(
            _as_u8p(img),
            h,
            w,
            _as_u8p(qd),
            _as_u8p(y),
            hist.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
    )
    return qd, y, hist


def set_verbose(level: int) -> None:
    """Enable the native runtime's -V row-progress reporting
    (NBLIC.c:810-815 analog; prints to stderr during encode/decode)."""
    load().nbrt_set_verbose(int(level))
