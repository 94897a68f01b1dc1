"""Container (bitstream header) serialization for all three formats.

- ``NBLIC0.3``: 16-byte header: 8-byte magic, n_channel (1B), height (2B big-endian),
  width (2B BE), near (1B), k_step (1B), effort (1B); then range-coder payload and
  4 flush bytes (reference: src/NBLIC.c:682-712).
- ``Q0.2``: 4 little-endian uint16 words: "Q0", ".2", height, width; then 12
  RLE-coded histograms and the word-reversed rANS payload (reference:
  src/QNBLIC.c:463-486).
- ``NBTC0001``: our TPU-native tiled container (this framework's own format):
  fixed header + per-tile stream length table + shared histograms + concatenated
  per-tile rANS streams. Decode of each tile is independent, which is what makes
  decode parallel on TPU.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from ..constants import (
    MAX_HEIGHT,
    MAX_IMG_SIZE,
    MAX_WIDTH,
    NBLIC_MAGIC,
    NBTC_MAGIC,
    QNBLIC_MAGIC,
)


def check_size(height: int, width: int) -> None:
    """Size validation shared by all engines (NBLIC.c:717-729, QNBLIC.c:33-45)."""
    if height <= 0 or width <= 0:
        raise ValueError(f"invalid image size {height}x{width}")
    if height > MAX_HEIGHT or width > MAX_WIDTH or height * width > MAX_IMG_SIZE:
        raise ValueError(f"image too large: {height}x{width}")


# ---------------------------------------------------------------- NBLIC0.3

@dataclass(frozen=True)
class NblicHeader:
    n_channel: int
    height: int
    width: int
    near: int
    k_step: int
    effort: int

    SIZE = 16  # 8B magic + n_channel + H(BE u16) + W(BE u16) + near + k_step + effort

    def to_bytes(self) -> bytes:
        return NBLIC_MAGIC + struct.pack(
            ">BHHBBB",
            self.n_channel,
            self.height,
            self.width,
            self.near,
            self.k_step,
            self.effort,
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "NblicHeader":
        if data[: len(NBLIC_MAGIC)] != NBLIC_MAGIC:
            raise ValueError("not an NBLIC0.3 stream")
        if len(data) < cls.SIZE:
            raise ValueError("truncated NBLIC0.3 header")
        fields = struct.unpack_from(">BHHBBB", data, len(NBLIC_MAGIC))
        return cls(*fields)


# ---------------------------------------------------------------- Q0.2

@dataclass(frozen=True)
class QnblicHeader:
    height: int
    width: int

    SIZE = 8

    def to_bytes(self) -> bytes:
        return QNBLIC_MAGIC + struct.pack("<HH", self.height, self.width)

    @classmethod
    def from_bytes(cls, data: bytes) -> "QnblicHeader":
        if data[: len(QNBLIC_MAGIC)] != QNBLIC_MAGIC:
            raise ValueError("not a Q0.2 stream")
        if len(data) < cls.SIZE:
            raise ValueError("truncated Q0.2 header")
        height, width = struct.unpack_from("<HH", data, len(QNBLIC_MAGIC))
        return cls(height, width)


# ---------------------------------------------------------------- NBTC (native)

@dataclass(frozen=True)
class NbtcHeader:
    """Header of the TPU-native tiled container.

    Layout (little-endian):
      magic (8B) | flags u16 (bit 0: image stored transposed) | profile u8 |
      near u8 |
      height u32 | width u32 | tile_h u16 | tile_w u16 |
      n_tiles u32 | bias_len u32 | hist_len u32 |
      then: bias_len bytes — zlib-compressed int16[3072] static context-bias
            table (the TPU-native replacement for the reference's sequential
            per-context EWMA; see ops/context.py),
      then: hist_len bytes of RLE-coded shared histograms (12 x 256),
      then: n_tiles * u32 per-tile stream byte lengths,
      then: concatenated per-tile payloads (each a forward-readable rANS stream).

    Profile-3 (adaptive strip engine, models/strips.py) REINTERPRETS some
    fields — the geometry is strips, not tiles:
      tile_h  = strip height,
      tile_w  = bit 0: image stored transposed | bit 1: tuned replay
                contract (legacy version bit: models/strips.TUNE_V2
                adaptation constants + 13-layer unary budget; 0 = the
                original TUNE_V1 set) | bit 2: a serialized Tune block
                (little-endian u16 fields in models/strips.Tune order)
                immediately follows the header, making the replay contract
                fully self-describing (decode never consults process
                state) | bit 3: the block is the 32-byte extended (v2)
                layout — 16 u16: bias_cap, map_bump, map_halve, n_unary,
                bias_shrink, n_seg, seg_bias, seg_map, seg_stats, sym_cnt,
                cnt_init, cnt_halve, mix_e, sym_bias, w_pred, spare; bit 3
                clear = the 20-byte legacy block (first 10 fields; the
                rest default).  All new containers set bits 2+3 | bits
                4+: AVP feature count (0 means a legacy 6-feature
                container),
      n_tiles = strip count,
      bias_len= 0 for the row-adaptive replayed bias (nothing transmitted);
                nonzero marks a legacy container with a zlib'd static table,
      hist_len= 4 * n_states bytes of per-rANS-state u32 word lengths
                (n_states = n_tiles * rans_bin.N_PHASE), followed by the
                concatenated per-state u16 streams.
    """

    profile: int
    near: int
    height: int
    width: int
    tile_h: int
    tile_w: int
    n_tiles: int
    bias_len: int
    hist_len: int
    flags: int = 0  # bit 0: pixel data is the TRANSPOSE of the source image

    SIZE = len(NBTC_MAGIC) + 2 + 1 + 1 + 4 + 4 + 2 + 2 + 4 + 4 + 4

    @property
    def transposed(self) -> bool:
        return bool(self.flags & 1)

    def to_bytes(self) -> bytes:
        return NBTC_MAGIC + struct.pack(
            "<HBBIIHHIII",
            self.flags,
            self.profile,
            self.near,
            self.height,
            self.width,
            self.tile_h,
            self.tile_w,
            self.n_tiles,
            self.bias_len,
            self.hist_len,
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "NbtcHeader":
        if data[: len(NBTC_MAGIC)] != NBTC_MAGIC:
            raise ValueError("not an NBTC stream")
        if len(data) < cls.SIZE:
            raise ValueError("truncated NBTC header")
        (flags, profile, near, height, width, tile_h, tile_w, n_tiles,
         bias_len, hist_len) = struct.unpack_from(
            "<HBBIIHHIII", data, len(NBTC_MAGIC))
        return cls(profile, near, height, width, tile_h, tile_w, n_tiles,
                   bias_len, hist_len, flags)


def sniff_format(data: bytes) -> str:
    """Container auto-detection, mirroring the decode dispatch of the reference CLI
    (NBLIC_main.c:223-226: Q0.2 magic first, then NBLIC0.3) plus our native magic."""
    if data[: len(NBTC_MAGIC)] == NBTC_MAGIC:
        return "nbtc"
    if data[: len(QNBLIC_MAGIC)] == QNBLIC_MAGIC:
        return "qnblic"
    if data[: len(NBLIC_MAGIC)] == NBLIC_MAGIC:
        return "nblic"
    raise ValueError("unknown container format")
