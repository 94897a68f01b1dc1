"""Pallas TPU kernel: lockstep rANS encode fold.

The rANS fold (QNBLIC.c:221-274 state machine; ops/rans.py encode_scan) is
serial per stream but independent across streams.  The XLA ``lax.scan``
version pays a fixed per-iteration cost over the whole lane vector (~1.3 us
x 4096 symbol steps ~= 5.5 ms on Kodak-24); this kernel runs the same fold
as a tight ``fori_loop`` over (8, 128) lane tiles held in registers/VMEM,
amortizing all step overhead (measured ~5x faster).

Layout: lanes are split across the sublane AND lane axes — blocks of 1024
streams shaped (8, 128) — and the symbol axis is chunked so each grid step's
freq/facc blocks fit VMEM.  Grid steps walk the symbol chunks in REVERSE
(the fold consumes symbols back to front, QNBLIC.c:639-645); the coder
state persists in scratch across chunk steps.

The u32 // u15 division inside the state update has no exact vector form on
the VPU, so it is done as base-256 long division: four 8-bit digits, each
an f32 divide of integers < 2^24 (exactly representable) with a +-1 fixup.
Everything else is integer ops; the result is bit-identical to
``rans.encode_scan`` (tested in interpret mode and against the chip).

Renormalization words are packed into the output's high bit
(word | renorm << 16) to halve the kernel's output DMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .histogram import NORM_SUM
from .rans import ANS_BITS, ANS_LOW_BOUND, ANS_MASK, NORM_BITS

BLK = 1024  # streams per kernel block: (8, 128)
CHUNK = 256  # symbols per grid step


def _divmod_u32(st, h, hf):
    """Exact (st // h, st % h) for u32 st, u16 h via 4x8-bit long division.

    Each digit step divides integers < 2^24 — exact in f32 — and fixes the
    round-to-nearest quotient by +-1.  h >= 1 (normalized tables give every
    coded symbol a nonzero frequency).
    """
    hi = h.astype(jnp.int32)
    q = jnp.zeros_like(hi)
    r = jnp.zeros_like(hi)
    for d in (3, 2, 1, 0):
        dig = ((st >> (8 * d)) & 0xFF).astype(jnp.int32)
        num = (r << 8) | dig
        qd = (num.astype(jnp.float32) / hf).astype(jnp.int32)
        rem = num - qd * hi
        qd = jnp.where(rem < 0, qd - 1, qd)
        rem = jnp.where(rem < 0, rem + hi, rem)
        qd = jnp.where(rem >= hi, qd + 1, qd)
        rem = jnp.where(rem >= hi, rem - hi, rem)
        q = (q << 8) | qd
        r = rem
    return q.astype(jnp.uint32), r.astype(jnp.uint32)


def _kernel(freq_ref, facc_ref, out_ref, state_ref, st_scr, *, ch: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        st_scr[...] = jnp.full((8, 128), ANS_LOW_BOUND, jnp.uint32)

    def body(k, st):
        l = ch - 1 - k  # fold order: last symbol of the chunk first
        h32 = freq_ref[0, l]  # int32, values in [1, 2^15]
        h = h32.astype(jnp.uint32)
        ha = facc_ref[0, l].astype(jnp.uint32)
        hf = h32.astype(jnp.float32)  # Mosaic has no u32->f32 cast
        # renorm iff state // h > 2^17 - 1  <=>  state >> 17 >= h
        renorm = (st >> (2 * ANS_BITS - NORM_BITS)) >= h
        word = (st & ANS_MASK).astype(jnp.int32)
        st2 = jnp.where(renorm, st >> ANS_BITS, st)
        quot, rem = _divmod_u32(st2, h, hf)
        out_ref[0, l] = word | (renorm.astype(jnp.int32) << 16)
        return rem + (quot << NORM_BITS) + ha

    st = jax.lax.fori_loop(0, ch, body, st_scr[...])
    st_scr[...] = st
    state_ref[0] = st.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2,))
def encode_fold(freq: jnp.ndarray, facc: jnp.ndarray,
                interpret: bool = False):
    """Drop-in Pallas version of ``rans.encode_scan`` (bit-identical).

    freq/facc: (S, L) with L a multiple of 256.  Returns (words (S, L)
    int32, emits (S, L) bool, state (S,) uint32); step order along L is
    fold order (reverse raster), matching encode_scan.
    """
    s, l = freq.shape
    s_pad = -(-s // BLK) * BLK
    nb = s_pad // BLK
    if s_pad > s:
        # identity lanes: freq 2^15 encodes nothing and never renormalizes
        freq = jnp.concatenate(
            [freq, jnp.full((s_pad - s, l), NORM_SUM, freq.dtype)]
        )
        facc = jnp.concatenate([facc, jnp.zeros((s_pad - s, l), facc.dtype)])
    # (S, L) -> (nb, L, 8, 128): per symbol step one native vector tile
    fq = jnp.transpose(
        freq.astype(jnp.int32).reshape(nb, 8, 128, l), (0, 3, 1, 2)
    )
    fa = jnp.transpose(
        facc.astype(jnp.int32).reshape(nb, 8, 128, l), (0, 3, 1, 2)
    )
    n_ch = l // CHUNK
    kernel = functools.partial(_kernel, ch=CHUNK)
    out, state = pl.pallas_call(
        kernel,
        grid=(nb, n_ch),
        in_specs=[
            pl.BlockSpec((1, CHUNK, 8, 128),
                         lambda b, j: (b, n_ch - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, 8, 128),
                         lambda b, j: (b, n_ch - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, CHUNK, 8, 128),
                         lambda b, j: (b, n_ch - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, l, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((nb, 8, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.uint32)],
        interpret=interpret,
    )(fq, fa)
    # back to (S, L); kernel wrote symbol positions, encode_scan's contract
    # is fold order (reverse raster) -> flip the symbol axis
    out = jnp.transpose(out, (0, 2, 3, 1)).reshape(s_pad, l)[:s, ::-1]
    words = out & 0xFFFF
    emits = (out >> 16) != 0
    state = state.reshape(s_pad)[:s].astype(jnp.uint32)
    return words, emits, state
