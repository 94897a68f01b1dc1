"""Scan-side sliding-window machinery for fused per-pixel decode loops.

The lockstep decode scans (NBTC tiles, interop Q0.2) carry the reference's
12-register causal window through the raster walk: fresh-sampled at each row
start (QNBLIC.c:48-64 at j=0), slid one column per pixel (QNBLIC.c:67-79).
All lanes march over the same (i, j), so every access is uniform across
lanes — per-lane state is O(1) registers plus the previous two rows.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import MID_VAL
from .neighbors import Neighbors
from .predict import activity, context_address, quantize_activity, simple_predict


def row_start_window(i, prev1, prev2, w: int):
    """Fresh window registers at (i, 0). prev1/prev2: previous two rows (w,)."""
    mid = jnp.int32(MID_VAL)
    # ``prev*`` may be a single row (w,) or a lane-stacked batch (..., w);
    # trailing-axis indexing serves both (lockstep scans share (i, j))
    a = jnp.where(i > 0, prev1[..., 0], mid)
    b = a
    e = a
    c = b
    d = jnp.where(i > 0, prev1[..., 1], b) if w > 1 else b
    f = jnp.where(i > 1, prev2[..., 0], b)
    g = jnp.where(i > 1, prev2[..., 1], f) if w > 1 else f
    h = f
    q = c
    r = jnp.where(i > 1, prev2[..., 2], g) if w > 2 else g
    s = h
    return (a, b, c, d, e, f, g, h, q, r, s)


def slide_window(regs, x, i, j, prev1, prev2, w: int):
    """One-column slide after coding pixel (i, j) with value x."""
    a, b, c, d, e, f, g, h, q, r, s = regs
    e2, a2, q2, c2, b2 = a, x, c, b, d
    s2, h2, f2, g2 = h, f, g, r
    nxt1 = prev1[..., jnp.minimum(j + 2, w - 1)]
    d2 = jnp.where(i <= 0, a2, jnp.where(j + 2 >= w, d, nxt1))
    nxt2 = prev2[..., jnp.minimum(j + 3, w - 1)]
    r2 = jnp.where(i <= 1, d2, jnp.where(j + 3 >= w, r, nxt2))
    return (a2, b2, c2, d2, e2, f2, g2, h2, q2, r2, s2)


def pixel_model(regs, err):
    """Per-pixel effort-0 modeling on window registers -> (px0, qd, adr)."""
    nb = Neighbors(*regs)
    px0 = simple_predict(nb)
    qd = quantize_activity(activity(nb, err))
    adr = context_address(nb, px0, qd)
    return px0, qd, adr


def fresh_window_rows(i, j, cur, prev1, prev2, w: int) -> Neighbors:
    """Fresh per-pixel sampling from carried rows (NBLIC.c:287-304).

    The NBLIC (effort 1-3) engine re-samples the full template at every
    pixel; in a fused scan the causal data lives in three carried rows:
    ``cur`` (row i, written up to column j-1), ``prev1`` (row i-1),
    ``prev2`` (row i-2).
    """
    mid = jnp.int32(MID_VAL)

    def at(row, idx, ok, default):
        return jnp.where(ok, row[jnp.clip(idx, 0, w - 1)], default)

    a = at(cur, j - 1, j >= 1, mid)
    b = at(prev1, j, i >= 1, mid)
    b = jnp.where(i == 0, a, b)
    a = jnp.where((i > 0) & (j == 0), b, a)
    e = at(cur, j - 2, j >= 2, a)
    c = at(prev1, j - 1, (i >= 1) & (j >= 1), b)
    d = at(prev1, j + 1, (i >= 1) & (j + 1 < w), b)
    f = at(prev2, j, i >= 2, b)
    g = at(prev2, j + 1, (i >= 2) & (j + 1 < w), f)
    h = at(prev2, j - 1, (i >= 2) & (j >= 1), f)
    q = at(prev1, j - 2, (i >= 1) & (j >= 2), c)
    r = at(prev2, j + 2, (i >= 2) & (j + 2 < w), g)
    s = at(prev2, j - 2, (i >= 2) & (j >= 2), h)
    return Neighbors(a, b, c, d, e, f, g, h, q, r, s)


def fresh_t_tap(i, j, prev1, w: int, d):
    """The 13th tap t = (i-1, j+2), default d (NBLIC.c:303; AVP only)."""
    ok = (i >= 1) & (j + 2 < w)
    return jnp.where(ok, prev1[..., jnp.clip(j + 2, 0, w - 1)], d)
