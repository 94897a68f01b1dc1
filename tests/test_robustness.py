"""Corrupt/truncated-stream behavior.

The reference has no integrity checks at all (SURVEY.md §5: corrupt payloads
decode to garbage over unchecked static buffers).  This framework must never
crash or read out of bounds: decoding bad input either raises a clean error
or returns garbage pixels of the right shape.
"""

import numpy as np
import pytest

from nblic_tpu import api, runtime
from nblic_tpu.models import strips, tiled
from nblic_tpu.utils.container import NbtcHeader


@pytest.fixture(scope="module")
def good_streams(rng_mod):
    img = rng_mod.integers(0, 256, size=(48, 40), dtype=np.uint8)
    return {
        "img": img,
        "q": api.compress(img, near=0, effort=0),
        "n": api.compress(img, near=0, effort=1),
        "t": tiled.encode(img, tile_h=16, tile_w=16),
    }


@pytest.fixture(scope="module")
def good_p3(rng_mod):
    # smooth small image: tiny programs, fast CPU compile
    base = np.arange(48)[:, None] * 2 + np.arange(40)[None, :]
    img = (base + rng_mod.integers(0, 8, size=(48, 40))).astype(np.uint8)
    return {"img": img, "p": strips.encode(img, th=16)}


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(77)


def test_unknown_magic_raises():
    with pytest.raises(ValueError):
        api.decompress(b"XXXXXXXXXXXXXXXXXXXXXXXX")


def test_truncated_headers_raise(good_streams):
    for key in ("q", "n", "t"):
        s = good_streams[key]
        for cut in (1, 4, 8):
            with pytest.raises((ValueError, RuntimeError)):
                api.decompress(s[:cut])


def test_truncated_payload_no_crash(good_streams):
    img = good_streams["img"]
    for key in ("q", "n", "t"):
        s = good_streams[key]
        cut = s[: int(len(s) * 0.7)]
        try:
            out = api.decompress(cut)
            # garbage is acceptable; crashes / wrong shapes are not
            assert out.shape == img.shape
        except (ValueError, RuntimeError):
            pass


def test_flipped_payload_bytes_no_crash(good_streams, rng_mod):
    img = good_streams["img"]
    for key in ("q", "n", "t"):
        s = bytearray(good_streams[key])
        # flip bytes in the back half (payload region)
        for _ in range(8):
            pos = rng_mod.integers(len(s) // 2, len(s))
            s[pos] ^= 0xFF
        try:
            out = api.decompress(bytes(s))
            assert out.shape == img.shape
        except (ValueError, RuntimeError):
            pass


def test_header_dimension_bombs_rejected(good_streams):
    # size fields claiming enormous images must be rejected up front
    s = bytearray(good_streams["n"])
    s[9:13] = (0xFF, 0xFF, 0xFF, 0xFF)  # height/width big-endian max
    with pytest.raises((ValueError, RuntimeError)):
        api.decompress(bytes(s))


def test_p3_truncated_header_raises(good_p3):
    s = good_p3["p"]
    for cut in (1, 8, NbtcHeader.SIZE, NbtcHeader.SIZE + 4):
        with pytest.raises((ValueError, RuntimeError)):
            api.decompress(s[:cut])


def test_p3_truncated_payload_rejected(good_p3):
    # the length table no longer fits the payload -> clean error, no
    # device program is traced
    s = good_p3["p"]
    with pytest.raises((ValueError, RuntimeError)):
        api.decompress(s[: int(len(s) * 0.7)])


def test_p3_hostile_tune_rejected(good_p3):
    s = bytearray(good_p3["p"])
    pos = NbtcHeader.SIZE
    # n_unary (field 3, u16 at offset 6) = 0xFFFF: would unroll a
    # 65535-layer Python loop into the decode trace if trusted
    s[pos + 6 : pos + 8] = b"\xFF\xFF"
    with pytest.raises(ValueError):
        api.decompress(bytes(s))
    s = bytearray(good_p3["p"])
    s[pos + 12 : pos + 14] = b"\x07\x00"  # seg_bias = 7 (flag must be 0/1)
    with pytest.raises(ValueError):
        api.decompress(bytes(s))


def test_p3_dimension_bomb_rejected(good_p3):
    s = bytearray(good_p3["p"])
    # height u32 at offset 12 (magic 8 + flags 2 + profile 1 + near 1)
    s[12:16] = b"\xFF\xFF\xFF\xFF"
    with pytest.raises((ValueError, RuntimeError)):
        api.decompress(bytes(s))
    s = bytearray(good_p3["p"])
    # n_tiles u32 at offset 24: inconsistent with height/tile_h
    s[24:28] = b"\x00\x10\x00\x00"
    with pytest.raises((ValueError, RuntimeError)):
        api.decompress(bytes(s))


def test_p3_flipped_payload_bytes_no_crash(good_p3, rng_mod):
    img = good_p3["img"]
    s = bytearray(good_p3["p"])
    for _ in range(8):
        pos = rng_mod.integers(len(s) // 2, len(s))
        s[pos] ^= 0xFF
    try:
        out = api.decompress(bytes(s))
        # garbage is acceptable; crashes / wrong shapes are not
        assert out.shape == img.shape
    except (ValueError, RuntimeError):
        pass


def test_native_runtime_bounds(good_streams):
    # the native decoder must respect its capacity arguments
    s = good_streams["q"]
    with pytest.raises(RuntimeError):
        # lie about the stream: header claims 48x40 but capacity is tiny
        runtime.load()  # ensure built
        import ctypes

        import numpy as np

        lib = runtime.load()
        buf = np.frombuffer(s, dtype=np.uint8)
        img = np.empty(16, dtype=np.uint8)
        h = ctypes.c_int32()
        w = ctypes.c_int32()
        ret = lib.nbrt_q_decode(
            runtime._as_u8p(buf), len(s), runtime._as_u8p(img), 16,
            ctypes.byref(h), ctypes.byref(w),
        )
        runtime._check(ret)
