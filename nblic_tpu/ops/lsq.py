"""Per-tile least-squares prediction — the TPU-native AVP redesign.

The reference's effort-2/3 "AVP" is an *online* int64 recursive ridge
regression solved per pixel with Gaussian elimination (NBLIC.c:112-283) —
~1000 sequential int64 ops per pixel, the slowest thing in the codec.  The
TPU-native reformulation fits ONE ridge regression per tile over the whole
tile at once:

- feature matrices are the causal neighbor planes (ops/neighbors.py), so
  the normal equations A = N^T N, b = N^T x are batched matmuls on the MXU;
- the batched 12x12 solves use f32 linear algebra, which is fine because
  the fitted weights are **quantized and transmitted** (24 B/tile): both
  ends predict with the same integer weights, so float non-determinism
  can't break the bitstream (unlike the reference, whose decoder must
  replay the full int64 recursion);
- the encoder keeps whichever predictor (learned vs blend) wins on each
  tile, so compression is never worse than the blend baseline.

Prediction: px = clip(128 + (sum_k w_k * (n_k - 128) + 2^(FB-1)) >> FB).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import MAX_VAL, MID_VAL
from .neighbors import Neighbors, sample

N_FEAT = 12  # 11 causal taps + intercept
W_FRAC_BITS = 12  # weight fixed point
W_CLIP = (1 << 15) - 1  # int16 transmitted
RIDGE = 64.0


def features(n: Neighbors) -> jnp.ndarray:
    """(..., H, W, 12) int32 feature planes: taps - 128, intercept last."""
    taps = jnp.stack(
        [n.a, n.b, n.c, n.d, n.e, n.f, n.g, n.h, n.q, n.r, n.s], axis=-1
    ) - MID_VAL
    ones = jnp.ones_like(taps[..., :1])
    return jnp.concatenate([taps, ones], axis=-1)


def _solve_spd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 12x12 solve by unrolled Gauss-Jordan (no pivoting).

    The ridge makes A symmetric positive definite, so pivoting is
    unnecessary; the unrolled form avoids LAPACK custom calls, which
    compile poorly on some TPU toolchains.
    """
    aug = jnp.concatenate([a, b[..., None]], axis=-1)  # (T, n, n+1)
    n = a.shape[-1]
    for k in range(n):
        piv = aug[:, k : k + 1, :] / aug[:, k : k + 1, k : k + 1]
        aug = aug - aug[:, :, k : k + 1] * piv
        aug = aug.at[:, k, :].set(piv[:, 0, :])
    return aug[:, :, n]


def fit_tile_weights(tiles: jnp.ndarray, target: jnp.ndarray | None = None):
    """Fit quantized predictor weights per tile.

    tiles: (T, th, tw) int32 — the plane the causal feature windows are
    sampled from.  ``target`` (same shape, default ``tiles``) is the plane
    being predicted: near-lossless refits pass the pass-1 *reconstruction*
    as ``tiles`` and the original as ``target``, so the fit sees the same
    quantized windows the decoder will.  Returns (w_q int32 (T, 12),
    valid bool (T,)).
    """
    x = tiles.astype(jnp.int32)
    n = jax.vmap(sample)(x)
    f = features(n).astype(jnp.float32)  # (T, th, tw, 12)
    t = x.shape[0]
    fm = f.reshape(t, -1, N_FEAT)
    tgt_x = x if target is None else target.astype(jnp.int32)
    tgt = (tgt_x - MID_VAL).astype(jnp.float32).reshape(t, -1)
    # normal equations on the MXU
    a = jnp.einsum("tpi,tpj->tij", fm, fm,
                   precision=jax.lax.Precision.HIGHEST)
    b = jnp.einsum("tpi,tp->ti", fm, tgt,
                   precision=jax.lax.Precision.HIGHEST)
    a = a + RIDGE * jnp.eye(N_FEAT, dtype=jnp.float32)
    w = _solve_spd(a, b)  # (T, 12)
    w_q = jnp.clip(
        jnp.round(w * (1 << W_FRAC_BITS)), -W_CLIP, W_CLIP
    ).astype(jnp.int32)
    valid = jnp.all(jnp.isfinite(w), axis=-1)
    w_q = jnp.where(valid[:, None], w_q, 0)
    return w_q, valid


def predict_plane(n: Neighbors, w_q: jnp.ndarray) -> jnp.ndarray:
    """Integer prediction plane from quantized weights.

    n: neighbor planes of (T, th, tw); w_q: (T, 12) int32.
    """
    f = features(n)  # (T, th, tw, 12) int32
    acc = jnp.sum(f * w_q[:, None, None, :], axis=-1)
    px = MID_VAL + ((acc + (1 << (W_FRAC_BITS - 1))) >> W_FRAC_BITS)
    return jnp.clip(px, 0, MAX_VAL)


def predict_lanes(regs, w_cols) -> jnp.ndarray:
    """Per-lane integer prediction inside a lockstep scan/kernel.

    regs: 11 window registers, each (..., G); w_cols: (12, G) int32 weights.
    """
    taps = (regs[0], regs[1], regs[2], regs[3], regs[4], regs[5],
            regs[6], regs[7], regs[8], regs[9], regs[10])
    acc = w_cols[N_FEAT - 1 : N_FEAT]  # intercept row, (1, G)
    for k, tap in enumerate(taps):
        acc = acc + w_cols[k : k + 1] * (tap - MID_VAL)
    px = MID_VAL + ((acc + (1 << (W_FRAC_BITS - 1))) >> W_FRAC_BITS)
    return jnp.clip(px, 0, MAX_VAL)
