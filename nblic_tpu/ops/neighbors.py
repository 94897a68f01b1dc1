"""Causal neighborhood sampling as whole-plane vector ops.

The reference codecs sample a 12-pixel causal template per pixel::

        s  h  f  g  r
        q  c  b  d
        e  a  .

Two distinct semantics exist in the reference, and both are reproduced here
as closed-form shifted-plane constructions (one fused VPU pass each, no
scalar loops):

- ``sample_fresh`` — per-pixel re-sampling with cascading out-of-bounds
  defaults (NBLIC.c:287-304, efforts 1-3).  Bounds rule ``SPIX``: valid iff
  ``i>=0 and 0<=j<width`` (NBLIC.c:43).

- ``sample_slide`` — the effort-0 engine's *incremental* window
  (QNBLIC.c:48-79): fresh-sampled at each row start, then slid one column at
  a time.  The slide recurrences leave deliberate pipeline artifacts near the
  borders (e.g. on row 0 every tap becomes a delayed copy of the current row;
  ``e`` at column 1 reads ``x[i-1,0]``), and the bitstream depends on them.
  The closed forms below were derived from the recurrence and are validated
  bit-exactly against the native oracle in tests/test_ops.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import MID_VAL


class Neighbors(NamedTuple):
    """The 12 causal neighbor planes, each shaped like the input image."""

    a: jnp.ndarray  # (i,   j-1)
    b: jnp.ndarray  # (i-1, j  )
    c: jnp.ndarray  # (i-1, j-1)
    d: jnp.ndarray  # (i-1, j+1)
    e: jnp.ndarray  # (i,   j-2)
    f: jnp.ndarray  # (i-2, j  )
    g: jnp.ndarray  # (i-2, j+1)
    h: jnp.ndarray  # (i-2, j-1)
    q: jnp.ndarray  # (i-1, j-2)
    r: jnp.ndarray  # (i-2, j+2)
    s: jnp.ndarray  # (i-2, j-2)


def _shift(x: jnp.ndarray, di: int, dj: int) -> jnp.ndarray:
    """Plane holding x[i+di, j+dj]; out-of-range cells are zero (mask later)."""
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [
        (max(0, -di), max(0, di)),
        (max(0, -dj), max(0, dj)),
    ]
    xp = jnp.pad(x, pad)
    lo_i = max(0, di)
    lo_j = max(0, dj)
    return xp[..., lo_i : lo_i + h, lo_j : lo_j + w]


def _shift_left_clamp(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """x[i, min(j+k, W-1)] — shift left with right-edge replication."""
    w = x.shape[-1]
    k = min(k, w - 1)
    if k == 0:
        return x
    return jnp.concatenate([x[..., :, k:]] + [x[..., :, -1:]] * k, axis=-1)


def sample_fresh(x: jnp.ndarray) -> Neighbors:
    """Per-pixel template with cascading defaults (NBLIC.c:287-304)."""
    x = x.astype(jnp.int32)
    h, w = x.shape[-2], x.shape[-1]
    ii = jnp.arange(h, dtype=jnp.int32)[:, None]
    jj = jnp.arange(w, dtype=jnp.int32)[None, :]
    mid = jnp.asarray(MID_VAL, jnp.int32)

    def sel(cond, di, dj, default):
        return jnp.where(cond, _shift(x, di, dj), default)

    a = sel(jj >= 1, 0, -1, mid)
    b = sel(ii >= 1, -1, 0, mid)
    # row-0 / col-0 fixups (NBLIC.c:291-294): if i==0: b=a; elif j==0: a=b
    b = jnp.where(ii == 0, a, b)
    a = jnp.where((ii > 0) & (jj == 0), b, a)
    e = sel(jj >= 2, 0, -2, a)
    c = sel((ii >= 1) & (jj >= 1), -1, -1, b)
    d = sel((ii >= 1) & (jj + 1 < w), -1, 1, b)
    f = sel(ii >= 2, -2, 0, b)
    g = sel((ii >= 2) & (jj + 1 < w), -2, 1, f)
    hh = sel((ii >= 2) & (jj >= 1), -2, -1, f)
    q = sel((ii >= 1) & (jj >= 2), -1, -2, c)
    r = sel((ii >= 2) & (jj + 2 < w), -2, 2, g)
    s = sel((ii >= 2) & (jj >= 2), -2, -2, hh)
    return Neighbors(a, b, c, d, e, f, g, hh, q, r, s)


def sample_slide(x: jnp.ndarray) -> Neighbors:
    """Closed form of the effort-0 incremental window (QNBLIC.c:48-79).

    Derivation (validated against the oracle): for rows i>=2 the window mostly
    equals fresh sampling, except the j==0/j==1 fills come from column 0 of
    the row *above* (the row-start fixup ``a=b`` leaks through the slide
    pipeline).  Row 1's (i-2)-taps and all of row 0's taps degenerate into
    right-shifted copies of row 0 with pipeline-delay thresholds.
    """
    x = x.astype(jnp.int32)
    h, w = x.shape[-2], x.shape[-1]
    ii = jnp.arange(h, dtype=jnp.int32)[:, None]
    jj = jnp.arange(w, dtype=jnp.int32)[None, :]
    mid = jnp.asarray(MID_VAL, jnp.int32)

    u1 = _shift(x, -1, 0)  # x[i-1, j]   (row 0 garbage, overridden below)
    u2 = _shift(x, -2, 0)  # x[i-2, j]
    c0m1 = u1[..., :, 0:1]  # x[i-1, 0]
    c0m2 = u2[..., :, 0:1]  # x[i-2, 0]

    def sr(v, k):  # v[..., j-k], fill handled by caller
        return _shift(v, 0, -k)

    # ---- general rows (exact for i >= 2; a..e,q also exact for i == 1) ----
    a = jnp.where(jj >= 1, sr(x, 1), c0m1)
    b = u1
    c = jnp.where(jj >= 1, sr(u1, 1), c0m1)
    d = _shift_left_clamp(u1, 1)
    e = jnp.where(jj >= 2, sr(x, 2), c0m1)
    f = u2
    g = _shift_left_clamp(u2, 1)
    hh = jnp.where(jj >= 1, sr(u2, 1), c0m2)
    q = jnp.where(jj >= 2, sr(u1, 2), c0m1)
    r = _shift_left_clamp(u2, 2)
    s = jnp.where(jj >= 2, sr(u2, 2), c0m2)

    # ---- row 1: the (i-2) taps alias onto delayed copies of row 0 ----
    row0 = jnp.broadcast_to(x[..., 0:1, :], x.shape)
    x00 = row0[..., :, 0:1]
    f1 = jnp.where(jj >= 3, sr(row0, 1), x00)
    g1 = jnp.where(jj >= 2, row0, x00)
    h1 = jnp.where(jj >= 4, sr(row0, 2), x00)
    r1 = jnp.where(jj >= 1, _shift_left_clamp(row0, 1), x00)
    s1 = jnp.where(jj >= 5, sr(row0, 3), x00)
    on1 = ii == 1
    f = jnp.where(on1, f1, f)
    g = jnp.where(on1, g1, g)
    hh = jnp.where(on1, h1, hh)
    r = jnp.where(on1, r1, r)
    s = jnp.where(on1, s1, s)

    # ---- row 0: every tap is a right-shifted copy of row 0 itself ----
    shifts = {"a": 1, "b": 2, "c": 3, "d": 1, "e": 2, "f": 3, "g": 2,
              "h": 4, "q": 4, "r": 1, "s": 5}

    def row0_tap(k):
        return jnp.where(jj >= k, sr(row0, k), mid)

    on0 = ii == 0
    a = jnp.where(on0, row0_tap(shifts["a"]), a)
    b = jnp.where(on0, row0_tap(shifts["b"]), b)
    c = jnp.where(on0, row0_tap(shifts["c"]), c)
    d = jnp.where(on0, row0_tap(shifts["d"]), d)
    e = jnp.where(on0, row0_tap(shifts["e"]), e)
    f = jnp.where(on0, row0_tap(shifts["f"]), f)
    g = jnp.where(on0, row0_tap(shifts["g"]), g)
    hh = jnp.where(on0, row0_tap(shifts["h"]), hh)
    q = jnp.where(on0, row0_tap(shifts["q"]), q)
    r = jnp.where(on0, row0_tap(shifts["r"]), r)
    s = jnp.where(on0, row0_tap(shifts["s"]), s)

    return Neighbors(a, b, c, d, e, f, g, hh, q, r, s)


# effort-0 modeling uses the incremental-window semantics
sample = sample_slide
