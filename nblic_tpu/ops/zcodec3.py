"""Layered Zcodec walk for the NBTC profile-3 strip engine.

The reference Zcodec (NBLIC.c:640-679) codes a symbol z as an escalating
unary walk over a 256-wide counter row plus a k-bit binary refinement.  Two
structural facts make it TPU-native without changing its modeling power:

1. **The unary bin position ``i`` is layer-deterministic.**  ``i`` advances
   by ``1 << k_max`` on every continuation and halves at 256, so the value
   of ``i`` at walk step L is a constant of L — it never depends on z.  The
   escalated context row is likewise a pure function of (qu, L).  The whole
   walk therefore flattens into ``N_UNARY`` dense vector layers whose
   counter addresses are known at trace time: no data-dependent gathers.
2. **Refinement bits need only (row, bit-position, seen-a-one) context.**
   Measured on Kodak, this 3-factor context codes the k low bits *as well
   as* the reference's 256-node tree walk (4.168 vs 4.170 bpp) while
   keeping every address layer-deterministic.

Departures from the reference (this is our native format, not interop):
a bin budget of ``N_UNARY`` layers with a raw-z escape (the reference walks
unboundedly; the escape fires on ~0.1% of Kodak pixels), and the refinement
context above instead of the in-row tree walk.

Everything here is branch-free elementwise int32 math over whole planes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

N_ROW = 16       # activity context rows (NBLIC.c:61 N_QD)
N_UNARY = 9      # default unary layer budget before the raw escape; the
                 # strip engine's tuned profile deepens it (strips.TUNE_V2)
N_REFINE = 5     # max binary refinement bits (k <= 15//MIN_K_STEP)
# the residual fold is a bijection onto [0, 255] (mapXtoY, NBLIC.c:431-444),
# so 8 raw bits always cover an escaped symbol
ESCAPE_BITS = 8


class LayerConsts(NamedTuple):
    """Static per-layer walk constants for one k_step."""

    k_max: int
    i_vals: tuple      # unary bin position per layer
    cls_vals: tuple    # counter class index per layer (i >> k_max)
    esc_counts: tuple  # escalations experienced before each layer
    n_class: int       # distinct counter classes = 256 >> k_max


def layer_consts(k_step: int, n_unary: int = N_UNARY) -> LayerConsts:
    k_max = (N_ROW - 1) // k_step
    step = 1 << k_max
    i_vals, esc_counts = [], []
    i, esc = 0, 0
    for _ in range(n_unary):
        i_vals.append(i)
        esc_counts.append(esc)
        i2 = i + step
        if i2 >= 256:
            i2 >>= 1
            esc += 1
        i = i2
    return LayerConsts(
        k_max,
        tuple(i_vals),
        tuple(v >> k_max for v in i_vals),
        tuple(esc_counts),
        256 >> k_max,
    )


def escalated_row(qu, esc_count: int, k_step: int):
    """Context row after ``esc_count`` escalations (NBLIC.c:668-672)."""
    if esc_count == 0:
        return qu
    return jnp.minimum((qu // k_step + esc_count) * k_step, N_ROW - 1)


def adjust_qv(qu, qv, k_step: int):
    """qv collapses to qu when their k differ (NBLIC.c:649)."""
    return jnp.where(qv // k_step != qu // k_step, qu, qv)


def unary_layers(z, qu, qv, k_step: int, n_unary: int = N_UNARY):
    """Vectorized unary walk.

    z/qu/qv: int32 planes (...).  Returns per-layer lists (length
    ``n_unary``) of (row_u, row_v, bin, active) planes, plus (row_end,
    k_end, escaped): the context row where the walk stopped, its
    refinement bit count, and the escape mask (still continuing after the
    budget).  (A measured negative result: coding the refinement bits
    through the dual-counter (row_u, row_v, qw) mixture like the
    reference's AriCodec, NBLIC.c:674-678, cost +0.0014 bpp on Kodak-24
    at th=512 and was removed.)
    """
    lc = layer_consts(k_step, n_unary)
    qv = adjust_qv(qu, qv, k_step)
    active = jnp.ones(z.shape, bool)
    layers = []
    row_end = jnp.zeros_like(qu)
    stopped = jnp.zeros(z.shape, bool)
    for l in range(n_unary):
        row_u = escalated_row(qu, lc.esc_counts[l], k_step)
        row_v = escalated_row(qv, lc.esc_counts[l], k_step)
        k = row_u // k_step
        b = ((lc.i_vals[l] >> lc.k_max) < (z >> k)) & active
        layers.append((row_u, row_v, b, active))
        stop_here = active & ~b
        row_end = jnp.where(stop_here, row_u, row_end)
        stopped = stopped | stop_here
        active = active & b
    k_end = jnp.where(stopped, row_end // k_step, 0)
    return layers, row_end, k_end, active


def unary_stop_value(z, qu, k_step: int):
    """Decoded magnitude class floor: (i >> k_max) << k at the stop layer.

    Not needed by the encoder (z is known); the decoder reconstructs
    z = ((i >> k_max) << k) + refinement bits (NBLIC.c:663, 674-678).
    """
    raise NotImplementedError("decoder reconstructs inline in the scan")


def refine_layers(z, k_end, escaped):
    """Refinement bit layers (MSB first).

    Returns per-layer (bit, active, msb_seen) planes, length N_REFINE.
    ``msb_seen`` is the context flag *before* this bit: whether any more
    significant refinement bit of this pixel was 1.
    """
    layers = []
    msb = jnp.zeros(z.shape, jnp.int32)
    for l in range(N_REFINE):
        kk = k_end - 1 - l
        act = (kk >= 0) & ~escaped
        kkc = jnp.maximum(kk, 0)
        bit = ((z >> kkc) & 1) & act.astype(jnp.int32)
        layers.append((bit, act, msb))
        msb = jnp.where(act & (bit == 1) & (msb == 0), 1, msb)
    return layers
