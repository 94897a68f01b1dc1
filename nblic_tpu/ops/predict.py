"""Whole-plane prediction / activity / context-address kernels (effort-0 family).

These reproduce, as fused vector ops over the full image plane, the per-pixel
modeling math of the reference fast engine:

- ``simple_predict``  — clipped-linear + best-of-7 angular blend
  (QNBLIC.c:94-149; LUT thresholds QNBLIC.c:83).
- ``activity``/``quantize_activity`` — texture activity and its 12-bin
  quantizer (QNBLIC.c:531, 152-161).
- ``context_address`` — activity bin + 8 texture bits -> 3072 addresses
  (QNBLIC.c:164-173).

Everything here is branch-free elementwise int32 math: one pass over the
plane, fully fusible by XLA, batchable with ``vmap`` — this is the encoder's
parallel "stage 1" (the property the reference's own MT pipeline proves:
QNBLIC.c:683-739, SURVEY.md §7.1.1).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import (
    C_THRESHOLDS,
    MAX_PX_INC,
    MAX_VAL,
    Q_MID,
    Q_PT_THRESH,
    Q_QD_THRESH,
)
from .neighbors import Neighbors, sample, sample_fresh


def _lut_from_thresholds(thresholds, size) -> np.ndarray:
    """tab[v] = index of first threshold bin containing v (QNBLIC.c:82-91)."""
    tab = np.zeros(size, dtype=np.int32)
    lo = 0
    for k, hi in enumerate(thresholds):
        tab[lo:hi] = k
        lo = hi
    return tab


_PT_LUT = _lut_from_thresholds(Q_PT_THRESH, 608)
_QD_LUT = _lut_from_thresholds(Q_QD_THRESH, 152)


def simple_predict(n: Neighbors) -> jnp.ndarray:
    """Blend predictor over neighbor planes; returns px0 in [0, 255]."""
    a, b, c, d, e, f, g, h, q, r, s = n

    px_lnr = jnp.clip(9 * a + 9 * b + 2 * d - 2 * c - e - f, 0, 16 * MAX_VAL)

    def aab(u, v):
        return jnp.abs(u - v)

    # 7 angular candidates with directional costs (strict-> update order
    # matches the C `if (cmin > cost)` chain exactly).
    costs = [
        2 * (aab(a, e) + aab(c, q) + aab(b, c) + aab(d, b)),
        2 * (aab(a, c) + aab(c, h) + aab(b, f) + aab(d, g)),
        2 * (aab(a, q) + aab(c, s) + aab(b, h) + aab(d, f)),
        2 * (aab(a, b) + aab(c, f) + aab(b, g) + aab(d, r)),
        aab(2 * a - e, q) + aab(2 * c - q, s) + aab(2 * b - c, h) + aab(2 * d - b, f),
        aab(2 * a - q, c) + aab(2 * c - s, h) + aab(2 * b - h, f) + aab(2 * d - f, g),
        aab(2 * a - c, b) + aab(2 * c - h, f) + aab(2 * b - f, g) + aab(2 * d - g, r),
    ]
    preds = [2 * a, 2 * b, 2 * c, 2 * d, a + c, c + b, b + d]

    cmin = costs[0]
    px_ang = preds[0]
    csum = costs[0]
    for cost, pred in zip(costs[1:], preds[1:]):
        csum = csum + cost
        take = cmin > cost
        cmin = jnp.where(take, cost, cmin)
        px_ang = jnp.where(take, pred, px_ang)

    csum = csum - 7 * cmin
    csum = jnp.minimum(csum >> 3, 608 - 1)
    # LUT-free threshold count (equivalent to the reference table,
    # QNBLIC.c:82-91; gather-free so it runs inside Pallas kernels too)
    wt = jnp.zeros_like(csum)
    for cut in Q_PT_THRESH[:-1]:
        wt = wt + (csum >= cut).astype(jnp.int32)
    return (8 * wt * px_ang + (8 - wt) * px_lnr + 64) >> 7


def activity(n: Neighbors, prev_err: jnp.ndarray) -> jnp.ndarray:
    """Raw texture activity (QNBLIC.c:531): local gradients + carried error."""
    a, b, c, d, e, f, g = n.a, n.b, n.c, n.d, n.e, n.f, n.g
    return (
        jnp.abs(a - e)
        + jnp.abs(b - c)
        + jnp.abs(b - d)
        + jnp.abs(a - c)
        + jnp.abs(b - f)
        + jnp.abs(d - g)
        + 2 * jnp.abs(prev_err)
    )


def quantize_activity(delta: jnp.ndarray) -> jnp.ndarray:
    """12-bin activity quantizer (QNBLIC.c:152-161), as a threshold count."""
    v = jnp.minimum(delta, 152 - 1)
    qd = jnp.zeros_like(v)
    for cut in Q_QD_THRESH[:-1]:
        qd = qd + (v >= cut).astype(jnp.int32)
    return qd


def context_address(n: Neighbors, px: jnp.ndarray, qd: jnp.ndarray) -> jnp.ndarray:
    """qd*256 | 8 one-bit texture comparisons (QNBLIC.c:164-173)."""
    bits = [
        px > n.a,
        px > n.b,
        px > n.c,
        px > n.d,
        px > n.e,
        px > n.f,
        px > 2 * n.a - n.e,
        px > 2 * n.b - n.f,
    ]
    adr = qd
    for bit in bits:
        adr = (adr << 1) | bit.astype(jnp.int32)
    return adr


def shift_err(err: jnp.ndarray) -> jnp.ndarray:
    """In-row carried error: err[i, j-1], reset to 0 at column 0.

    The reference carries ``err`` across the row scan and resets it per row
    (QNBLIC.c:588, 599); since err = x - px0 depends only on original pixels
    at near=0, the carried chain is just a one-column shift.
    """
    z = jnp.zeros_like(err[..., :, :1])
    return jnp.concatenate([z, err[..., :, :-1]], axis=-1)


def model_stage1(img: jnp.ndarray):
    """Full parallel modeling pass: (px0, err, qd, adr) planes from the image.

    ``img``: (..., H, W) uint8/int32 original pixels (lossless path).
    Returns int32 planes of the same shape.
    """
    x = img.astype(jnp.int32)
    n = sample(x)
    px0 = simple_predict(n)
    err = x - px0
    qd = quantize_activity(activity(n, shift_err(err)))
    adr = context_address(n, px0, qd)
    return px0, err, qd, adr


# ---------------------------------------------------------------------------
# NBLIC (effort 1-3) modeling variants
# ---------------------------------------------------------------------------

# blend-weight thresholds over csum (NBLIC.c:308): {31,93,...,24800}
N_C_THRESH = np.asarray(C_THRESHOLDS, dtype=np.int32)
# dual-bin activity quantizer mid-points (NBLIC.c:374)
N_Q_MID = np.asarray(Q_MID, dtype=np.int32)
N_QW = 32


def n_simple_predict(n: Neighbors) -> jnp.ndarray:
    """NBLIC blend predictor (NBLIC.c:307-370).

    Identical costs/candidates to the effort-0 variant; the blend weight is a
    threshold search over raw csum (not the >>3 LUT).
    """
    a, b, c, d, e, f, g, h, q, r, s = n
    px_lnr = jnp.clip(9 * a + 9 * b + 2 * d - 2 * c - e - f, 0, 16 * MAX_VAL)

    def aab(u, v):
        return jnp.abs(u - v)

    costs = [
        2 * (aab(a, e) + aab(c, q) + aab(b, c) + aab(d, b)),
        2 * (aab(a, c) + aab(c, h) + aab(b, f) + aab(d, g)),
        2 * (aab(a, q) + aab(c, s) + aab(b, h) + aab(d, f)),
        2 * (aab(a, b) + aab(c, f) + aab(b, g) + aab(d, r)),
        aab(2 * a - e, q) + aab(2 * c - q, s) + aab(2 * b - c, h) + aab(2 * d - b, f),
        aab(2 * a - q, c) + aab(2 * c - s, h) + aab(2 * b - h, f) + aab(2 * d - f, g),
        aab(2 * a - c, b) + aab(2 * c - h, f) + aab(2 * b - f, g) + aab(2 * d - g, r),
    ]
    preds = [2 * a, 2 * b, 2 * c, 2 * d, a + c, c + b, b + d]

    cmin = costs[0]
    px_ang = preds[0]
    csum = costs[0]
    for cost, pred in zip(costs[1:], preds[1:]):
        csum = csum + cost
        take = cmin > cost
        cmin = jnp.where(take, cost, cmin)
        px_ang = jnp.where(take, pred, px_ang)

    csum = csum - 7 * cmin
    # wt = number of thresholds <= csum (first index with threshold > csum)
    wt = jnp.sum(
        jnp.asarray(N_C_THRESH)[(None,) * csum.ndim] <= csum[..., None],
        axis=-1,
    ).astype(jnp.int32)
    return (8 * wt * px_ang + (8 - wt) * px_lnr + 64) >> 7


def n_quantize_activity(delta: jnp.ndarray):
    """Dual-bin quantizer with 5-bit interpolation (NBLIC.c:373-395).

    Returns (qu, qv, qw) planes.
    """
    mids = jnp.asarray(N_Q_MID)
    # first qd in [0,15) with delta <= mid[qd], else 15
    qd = jnp.sum(delta[..., None] > mids[(None,) * delta.ndim][..., :15], axis=-1)
    qd = qd.astype(jnp.int32)
    mid_lo = mids[jnp.maximum(qd - 1, 0)]
    mid_hi = mids[qd]
    interp = delta < mid_hi
    qw_raw = jnp.where(
        interp & (qd > 0),
        N_QW * (delta - mid_lo) // jnp.maximum(mid_hi - mid_lo, 1),
        0,
    )
    low_half = qw_raw < (N_QW // 2)
    qu = jnp.where(interp & (qd > 0) & low_half, qd - 1, qd)
    qv = jnp.where(interp & (qd > 0) & ~low_half, qd - 1, qd)
    qw = jnp.where(
        interp & (qd > 0),
        jnp.where(low_half, qw_raw, N_QW - qw_raw),
        0,
    )
    return qu, qv, qw


def n_context_address(n: Neighbors, px: jnp.ndarray, qu: jnp.ndarray) -> jnp.ndarray:
    """(qu>>1)*256 | 8 texture bits (NBLIC.c:398-410)."""
    bits = [
        (px > n.a, 0x01),
        (px > n.b, 0x02),
        (px > n.c, 0x04),
        (px > n.d, 0x08),
        (px > n.e, 0x10),
        (px > n.f, 0x20),
        (px > 2 * n.a - n.e, 0x40),
        (px > 2 * n.b - n.f, 0x80),
    ]
    adr = (qu >> 1) << 8
    for bit, mask in bits:
        adr = adr | jnp.where(bit, mask, 0)
    return adr


def n_model_stage1(img: jnp.ndarray):
    """NBLIC effort-1 lossless parallel stage: (px0, err, qu, qv, qw, adr).

    Fresh per-pixel sampling (NBLIC.c:829 reads the reconstructed buffer,
    which equals the original at near=0), clipped in-row error chain
    (NBLIC.c:878: err clipped to ±127 before feeding the next activity).
    """
    x = img.astype(jnp.int32)
    n = sample_fresh(x)
    px0 = n_simple_predict(n)
    err = jnp.clip(x - px0, -MAX_PX_INC, MAX_PX_INC)
    delta = activity(n, shift_err(err))
    qu, qv, qw = n_quantize_activity(delta)
    adr = n_context_address(n, px0, qu)
    return px0, err, qu, qv, qw, adr
