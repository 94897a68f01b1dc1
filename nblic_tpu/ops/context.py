"""Context-bias modeling and residual mapping as vector ops.

Two bias models live here:

1. **Static two-pass bias** (the NBTC TPU-native design): instead of the
   reference's raster-sequential per-context EWMA (QNBLIC.c:176-188), the
   encoder computes the per-context *mean* prediction error over the whole
   image in one parallel segment-sum and transmits the quantized table in the
   container.  Encode and decode both become a single gather — no sequential
   chain at all.  The EWMA is an online estimator of exactly this mean, so
   compression is comparable; the decoder no longer needs to replay the chain.

2. **Exact EWMA steps** for the interop engines (bit-exact Q0.2/NBLIC0.3),
   mirroring QNBLIC.c:176-188 / NBLIC.c:413-428 including their *different*
   rounding constants.

Residual mapping is the JPEG-LS-style fold (NBLIC.c:431-466, near-aware;
QNBLIC.c:191-217 is the near=0 special case).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import MAX_VAL, MID_VAL

# fixed-point scale of the transmitted static bias table (1/16 px units)
BIAS_FRAC_BITS = 4


# ---------------------------------------------------------------------------
# static (two-pass) context bias — NBTC native path
# ---------------------------------------------------------------------------


def pair_segment_sum(idx: jnp.ndarray, weights, n_bins: int,
                     chunk: int = 65536) -> jnp.ndarray:
    """Exact integer segment-sum as a pair-decomposed one-hot matmul.

    XLA's scatter-add runs element-at-a-time on TPU (~25 ns/elem — it was
    the whole-encode bottleneck); decomposing the bin index as hi*64+lo
    turns the reduction into ``onehot_hi^T @ onehot_lo`` on the MXU.  Work
    is chunked so every f32 partial sum stays within the exactly-
    representable integer range (weights are bounded by +-2^8).

    idx: int32 (...,) in [0, n_bins); weights: None (=count) or int32 like
    idx.  Returns int32 (n_bins,).
    """
    n_lo = 64
    n_hi = -(-n_bins // n_lo)
    flat = idx.reshape(-1)
    p = flat.shape[0]
    pad = (-p) % chunk
    flat = jnp.pad(flat, (0, pad))
    if weights is None:
        w = jnp.pad(jnp.ones((p,), jnp.int32), (0, pad))
    else:
        w = jnp.pad(weights.reshape(-1), (0, pad))
    nc = flat.shape[0] // chunk
    flat = flat.reshape(nc, chunk)
    # bf16 one-hot operands: 0/1 and |w| <= 2^8 are exact in bf16, products
    # accumulate in f32 on the MXU (bounded by chunk * 2^8 < 2^24, exact).
    # Measured ~30x faster than the f32 einsum on TPU v5e (halved operand
    # traffic + native-rate MXU passes).
    w = w.reshape(nc, chunk).astype(jnp.bfloat16)
    hi = flat // n_lo
    lo = flat % n_lo
    oh_hi = jax.nn.one_hot(hi, n_hi, dtype=jnp.bfloat16)
    oh_lo = jax.nn.one_hot(lo, n_lo, dtype=jnp.bfloat16) * w[..., None]
    part = jnp.einsum(
        "cph,cpl->chl", oh_hi, oh_lo,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    return part.sum(axis=0).reshape(n_hi * n_lo)[:n_bins]


def pair_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Exact table gather as a pair-decomposed one-hot MXU contraction.

    XLA's dynamic gather costs ~25 ns/element on TPU; for whole-plane reads
    from small tables this one-hot form is ~20x faster.  table: int32
    (n_bins,) with |values| < 2^15; idx: int32 (...).  Exact: bf16 one-hots
    are 0/1, accumulation is f32 at HIGHEST precision.
    """
    n_lo = 64
    n_bins = table.shape[0]
    n_hi = -(-n_bins // n_lo)
    t2 = jnp.pad(
        table.astype(jnp.float32), (0, n_hi * n_lo - n_bins)
    ).reshape(n_hi, n_lo)
    flat = idx.reshape(-1)
    oh_hi = jax.nn.one_hot(flat // n_lo, n_hi, dtype=jnp.float32)
    rows = jax.lax.dot_general(
        oh_hi, t2, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    oh_lo = jax.nn.one_hot(flat % n_lo, n_lo, dtype=jnp.float32)
    val = jnp.sum(rows * oh_lo, axis=-1)
    return val.astype(jnp.int32).reshape(idx.shape)


def bias_moments(adr: jnp.ndarray, err: jnp.ndarray, n_ctx: int):
    """Per-context (sum, count) of prediction errors via parallel segment-sum.

    Separated from quantization so multi-device encoders can ``psum`` the
    moments across mesh shards before quantizing (parallel/mesh.py).
    """
    sums = pair_segment_sum(adr, err, n_ctx)
    cnts = pair_segment_sum(adr, None, n_ctx)
    return sums, cnts


def quantize_bias(sums: jnp.ndarray, cnts: jnp.ndarray,
                  shrink: int = 0) -> jnp.ndarray:
    """Fixed-point (2^BIAS_FRAC_BITS) rounded mean error per context.

    ``shrink`` adds pseudo-counts to the denominator (James-Stein-style
    pull toward 0 for sparsely observed contexts) — a replay-contract
    value where the caller versions it."""
    # round-half-away-from-zero of 16*sum/cnt, in pure integer math
    # (computed on magnitudes: floor division on a sign-corrected numerator
    # would round negative means one step too negative)
    denom = jnp.maximum(cnts + shrink, 1)
    mag = ((jnp.abs(sums) << BIAS_FRAC_BITS) * 2 + denom) // (2 * denom)
    bias = jnp.sign(sums) * mag
    bias = jnp.where(cnts > 0, bias, 0)
    return jnp.clip(bias, -(1 << 11), (1 << 11) - 1).astype(jnp.int32)


def build_static_bias(adr: jnp.ndarray, err: jnp.ndarray, n_ctx: int) -> jnp.ndarray:
    """Per-context quantized mean error via parallel segment-sum.

    adr/err: int32 planes (any shape).  Returns int32[n_ctx] fixed-point bias
    (scale 2^BIAS_FRAC_BITS), zero for unused contexts.
    """
    return quantize_bias(*bias_moments(adr, err, n_ctx))


def apply_static_bias(bias_tab: jnp.ndarray, adr: jnp.ndarray, px0: jnp.ndarray):
    """Correct predictions by the static bias table.

    Mirrors the shape of the reference correction (NBLIC.c:413-418): the
    half-bit of the fixed-point bias doubles as the preferred residual sign.
    Returns (px, sign) planes.  Whole-plane reads use the pair-decomposed
    MXU gather; tiny (per-step scan) reads keep the native gather.
    """
    if adr.size >= 4096:
        b = pair_gather(bias_tab, adr)
    else:
        b = bias_tab[adr]
    sign = (b >> (BIAS_FRAC_BITS - 1)) & 1
    px = jnp.clip(px0 + (b >> BIAS_FRAC_BITS) + sign, 0, MAX_VAL)
    return px, sign


# ---------------------------------------------------------------------------
# exact adaptive EWMA (interop engines)
# ---------------------------------------------------------------------------


def q_correct_px(ctx, px0, *, scale=11):
    """QNBLIC CORRECT_PX (QNBLIC.c:176-180). Returns (px, sign)."""
    sign = (ctx >> (scale - 1)) & 1
    px = jnp.clip(px0 + (ctx >> scale) + sign, 0, MAX_VAL)
    return px, sign


def q_update_ctx(ctx, err, *, coef=7, scale=11):
    """QNBLIC UPDATE_CONTEXT (QNBLIC.c:183-188; rounding constant 2^(coef-1)-1)."""
    return (ctx * ((1 << coef) - 1) + (err << scale) + ((1 << (coef - 1)) - 1)) >> coef


def n_correct_px(ctx, px0, *, scale=8):
    """NBLIC correctPxByContext (NBLIC.c:413-418)."""
    sign = (ctx >> (scale - 1)) & 1
    px = jnp.clip(px0 + (ctx >> scale) + sign, 0, MAX_VAL)
    return px, sign


def n_update_ctx(ctx, err, *, coef=7, scale=8):
    """NBLIC updateContext (NBLIC.c:421-428; rounding constant 2^(coef-1))."""
    return (ctx * ((1 << coef) - 1) + (err << scale) + (1 << (coef - 1))) >> coef


# ---------------------------------------------------------------------------
# residual fold / unfold (sign-interleaved, near-aware)
# ---------------------------------------------------------------------------


def residual_fold(x, px, sign, near: int = 0):
    """mapXtoY (NBLIC.c:431-444): |x-px| quantized by near, sign-interleaved."""
    ty = (jnp.clip(px, 0, MAX_VAL - px) + near) // (2 * near + 1)
    sy = (x >= px).astype(jnp.int32)
    y = (jnp.abs(x - px) + near) // (2 * near + 1)
    folded = jnp.where(y <= ty, 2 * y - (sy ^ sign), y + ty)
    return jnp.where(y <= 0, 0, folded)


def residual_unfold(z, px, sign, near: int = 0):
    """mapYtoX (NBLIC.c:447-466): inverse fold + reconstruction clip."""
    ty = (jnp.clip(px, 0, MAX_VAL - px) + near) // (2 * near + 1)
    in_fold = z <= 2 * ty
    y = jnp.where(in_fold, (z + 1) >> 1, z - ty)
    sy = jnp.where(in_fold, (z & 1) ^ sign, (px < MID_VAL).astype(jnp.int32))
    y = jnp.where(z <= 0, 0, y)
    sy = jnp.where(z <= 0, 0, sy)
    y = y * (2 * near + 1)
    out = px + jnp.where(sy.astype(bool), y, -y)
    return jnp.clip(out, 0, MAX_VAL)
