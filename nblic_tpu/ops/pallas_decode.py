"""Pallas TPU kernel: lockstep NBTC profile-1 group decode.

One interleave group = G tile lanes marching over the tile raster in
lockstep, renormalizing their rANS states against a single shared stream
cursor (the interleaved layout of ops/rans.py makes stream reads strictly
sequential).  Everything data-dependent is expressed without per-lane
gathers, which TPUs lack:

- small LUTs (activity bins, blend weights) are threshold counts
  (ops/predict.py),
- the context-bias / frequency / cumulative-frequency tables are read with
  a one-hot bilinear contraction: an MXU matmul selects the qd row, a
  256-row masked reduction selects the column (all values <= 2^15, exact in
  f32 at HIGHEST precision),
- the symbol is found by counting acc-row entries <= the state's low bits
  (the decode-LUT equivalent, QNBLIC.c:298-305, without the 32K table),
- renorm words reach the needing lanes via an MXU triangular-matrix prefix
  rank + a one-hot matmul against a 128-aligned stream window,
- row buffers are (tw, G) register arrays updated with one-hot masks; the
  only dynamic memory access in the kernel is the aligned window load.

Layout: lanes live on the **last (lane) axis** — every per-lane quantity is
a (1, G) row vector, table expansions are (rows, G), so all heavy ops sit on
native (8,128) vector tiles and everything is rank-2 (Mosaic's layout
inference rejects rank-1 vectors in several of these ops).

The grid is (group, row): TPU grid steps run sequentially, so the coder
state persists in scratch across row steps and each output store is one
full (tw, G) block.

The XLA reference implementation of the same algorithm lives in
models/tiled.py (_group_decode_scan); the kernel must match it bit for bit
and is tested against it (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MAX_VAL, MID_VAL
from .context import BIAS_FRAC_BITS
from .lsq import predict_lanes as lsq_predict
from .neighbors import Neighbors
from .predict import activity, context_address, quantize_activity, simple_predict

N_QD = 12
N_SYM = 256
NORM_BITS = 15
NORM_MASK = (1 << NORM_BITS) - 1
ANS_BITS = 16
ANS_LOW_BOUND = 1 << ANS_BITS

_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    """Exact f32 matmul (one-hot selections; values <= 2^16)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32,
    )


def _kernel(nact_ref, stream_ref, c16_ref, facc_ref, freq_ref, bias2_ref,
            tri_ref, w_ref, out_ref, state_ref, sp_ref, prev1_ref, prev2_ref,
            *, th: int, tw: int, near: int, g: int, profile: int):
    i = pl.program_id(1)
    w32 = g + 128  # i32-pair window: covers 2*w32 u16s >= 257 + g needed
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)
    iota12 = jax.lax.broadcasted_iota(jnp.int32, (N_QD, g), 0)
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (16, g), 0)
    iota192 = jax.lax.broadcasted_iota(jnp.int32, (192, g), 0)
    iotaw32 = jax.lax.broadcasted_iota(jnp.int32, (w32, g), 0)
    iotw = jax.lax.broadcasted_iota(jnp.int32, (tw, g), 0)
    active = (lane_row < nact_ref[pl.program_id(0)]).astype(jnp.int32)

    def window_words(win32, tgt, maskf):
        """u16 words at in-window u16 indices ``tgt`` from an i32-pair window.

        The stream arrives as little-endian u16 pairs packed in int32 (halves
        the host upload); two one-hot matmuls select each lane's pair and its
        lo/hi half.  win32 (1, w32) int32; tgt/maskf (1, g); returns (1, g).
        """
        lo16 = (win32 & 0xFFFF).astype(jnp.float32)
        hi16 = ((win32 >> 16) & 0xFFFF).astype(jnp.float32)
        pair = iotaw32 == (tgt >> 1)
        odd = (tgt & 1) == 1
        sel_lo = (pair & ~odd).astype(jnp.float32) * maskf
        sel_hi = (pair & odd).astype(jnp.float32) * maskf
        return (_mm(lo16, sel_lo) + _mm(hi16, sel_hi)).astype(jnp.int32)

    @pl.when(i == 0)
    def _init():
        # head layout: g hi-words then g lo-words (ops/rans.py), u16
        # indices [0, 2g) = the first g i32 pairs
        win = stream_ref[:, pl.ds(0, w32)]
        ones = jnp.ones((1, g), jnp.float32)
        hi = window_words(win, lane_row, ones).astype(jnp.uint32)
        lo = window_words(win, g + lane_row, ones).astype(jnp.uint32)
        state_ref[...] = (hi << ANS_BITS) | lo
        sp_ref[0] = 2 * g
        prev1_ref[...] = jnp.zeros((tw, g), jnp.int32)
        prev2_ref[...] = jnp.zeros((tw, g), jnp.int32)

    p1 = prev1_ref[...]  # (tw, g): row i-1, lanes last
    p2 = prev2_ref[...]
    state0 = state_ref[...]  # (1, g) uint32
    sp0 = sp_ref[0]

    def masked_row(mat, col):
        """mat (tw, g) value at scalar row index ``col`` -> (1, g)."""
        sel = (iotw == col).astype(jnp.int32)
        return jnp.sum(mat * sel, axis=0, keepdims=True)

    def decode_pixel(j, regs, err, state, sp, row):
        nb = Neighbors(*regs)  # (1, g) planes
        px0 = simple_predict(nb)
        if profile == 2:
            # per-tile least-squares predictor (ops/lsq.py), flag row 12:
            # 0 = blend, 1 = learned, 2 = average of the two
            px_l = lsq_predict(regs, w_ref[0])
            flagv = w_ref[0][12:13, :]
            px_a = (px0 + px_l + 1) >> 1
            px0 = jnp.where(
                flagv == 1, px_l, jnp.where(flagv == 2, px_a, px0)
            )
        qd = quantize_activity(activity(nb, err))
        adr = context_address(nb, px0, qd)
        tex = adr & 0xFF

        # two-level (16x16) table reads: an MXU matmul selects the
        # (qd, coarse) row, a 16-row masked reduction picks the column —
        # 16x cheaper than 256-row reductions
        oh_qd = (iota12 == qd).astype(jnp.float32)  # (12, g)
        oh_qt = (iota192 == (qd * 16 + (tex >> 4))).astype(jnp.float32)
        brow = _mm(bias2_ref[0], oh_qt)  # (16,192)@(192,g) -> (16, g)
        oh_lo4 = (iota16 == (tex & 15)).astype(jnp.float32)
        bval = jnp.sum(brow * oh_lo4, axis=0, keepdims=True).astype(jnp.int32)
        sign = (bval >> (BIAS_FRAC_BITS - 1)) & 1
        px = jnp.clip(px0 + (bval >> BIAS_FRAC_BITS) + sign, 0, MAX_VAL)

        # symbol search: coarse bucket from the 16-boundary table, fine
        # offset within it (y = #{v : acc[qd, v] <= lb} - 1)
        lb = (state & NORM_MASK).astype(jnp.int32)
        lbf = lb.astype(jnp.float32)
        crow = _mm(c16_ref[0], oh_qd)  # (16,12)@(12,g) -> (16, g)
        gidx = jnp.sum(
            (crow <= lbf).astype(jnp.int32), axis=0, keepdims=True
        ) - 1
        oh_qg = (iota192 == (qd * 16 + gidx)).astype(jnp.float32)
        frow = _mm(facc_ref[0], oh_qg)  # acc fine rows (16, g)
        ylo = jnp.sum(
            (frow <= lbf).astype(jnp.int32), axis=0, keepdims=True
        ) - 1
        y = gidx * 16 + ylo
        oh_ylo = (iota16 == ylo).astype(jnp.float32)
        accv = jnp.sum(frow * oh_ylo, axis=0, keepdims=True).astype(
            jnp.int32
        ).astype(jnp.uint32)
        hrow = _mm(freq_ref[0], oh_qg)
        freq = jnp.sum(hrow * oh_ylo, axis=0, keepdims=True).astype(
            jnp.int32
        ).astype(jnp.uint32)
        state = (state >> NORM_BITS) * freq + lb.astype(jnp.uint32) - accv

        # shared-cursor renorm: MXU triangular prefix rank, then one-hot
        # matmuls pick each needing lane's u16 word from the aligned
        # i32-pair window
        need = ((state < ANS_LOW_BOUND).astype(jnp.int32)) * active
        needf = need.astype(jnp.float32)
        rank = _mm(needf, tri_ref[...]).astype(jnp.int32)  # (1,g)@(g,g)
        # clamp so corrupt/truncated streams can't drive the window load out
        # of bounds (the wrapper pads the pair axis by w32 + 128)
        wmax32 = stream_ref.shape[-1]
        base = pl.multiple_of(
            jnp.minimum((sp >> 8) << 7, ((wmax32 - w32) >> 7) << 7), 128
        )
        window = stream_ref[:, pl.ds(base, w32)]
        tgt = (sp - 2 * base) + rank
        word = window_words(window, tgt, needf)
        state = jnp.where(
            need == 1, (state << ANS_BITS) | word.astype(jnp.uint32), state
        )
        sp = sp + jnp.sum(need)

        # reconstruction (mapYtoX, NBLIC.c:447-466)
        ty = (jnp.clip(px, 0, MAX_VAL - px) + near) // (2 * near + 1)
        in_fold = y <= 2 * ty
        mag = jnp.where(in_fold, (y + 1) >> 1, y - ty)
        sy = jnp.where(in_fold, (y & 1) ^ sign, (px < MID_VAL).astype(jnp.int32))
        mag = jnp.where(y <= 0, 0, mag) * (2 * near + 1)
        sy = jnp.where(y <= 0, 0, sy)
        x = jnp.clip(px + jnp.where(sy == 1, mag, -mag), 0, MAX_VAL)
        err = x - px0
        row = jnp.where(iotw == j, x, row)
        return x, err, state, sp, row

    def slide(regs, x, j):
        a, b, c, d, e, f, gg, h, q, r, s = regs
        e2, a2, q2, c2, b2 = a, x, c, b, d
        s2, h2, f2, g2 = h, f, gg, r
        nxt1 = masked_row(p1, jnp.minimum(j + 2, tw - 1))
        d2 = jnp.where(i <= 0, a2, jnp.where(j + 2 >= tw, d, nxt1))
        nxt2 = masked_row(p2, jnp.minimum(j + 3, tw - 1))
        r2 = jnp.where(i <= 1, d2, jnp.where(j + 3 >= tw, r, nxt2))
        return (a2, b2, c2, d2, e2, f2, g2, h2, q2, r2, s2)

    # fresh window at (i, 0) (QNBLIC.c:48-64); rows are (tw, g)
    mid = jnp.full((1, g), MID_VAL, jnp.int32)
    a = jnp.where(i > 0, p1[0:1, :], mid)
    b = a
    e = a
    c = b
    d = jnp.where(i > 0, p1[1:2, :], b) if tw > 1 else b
    f = jnp.where(i > 1, p2[0:1, :], b)
    gg = jnp.where(i > 1, p2[1:2, :], f) if tw > 1 else f
    h = f
    q = c
    r = jnp.where(i > 1, p2[2:3, :], gg) if tw > 2 else gg
    s = h
    regs = (a, b, c, d, e, f, gg, h, q, r, s)

    def col_body(j, carry):
        regs, err, state, sp, row = carry
        x, err, state, sp, row = decode_pixel(j, regs, err, state, sp, row)
        regs = slide(regs, x, j)
        return regs, err, state, sp, row

    err0 = jnp.zeros((1, g), jnp.int32)
    row0 = jnp.zeros((tw, g), jnp.int32)
    _, _, state, sp, row = jax.lax.fori_loop(
        0, tw, col_body, (regs, err0, state0, sp0, row0)
    )
    out_ref[0, 0] = row
    state_ref[...] = state
    sp_ref[0] = sp
    prev2_ref[...] = p1
    prev1_ref[...] = row


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11))
def decode_groups_pallas(streams, n_active, bias, hist_n, acc, wcols,
                         th: int, tw: int, near: int, g: int,
                         profile: int = 1, interpret: bool = False):
    """Decode (G_total, Wmax32) interleaved streams -> (G_total, g, th, tw).

    streams: int32 PAIRS — two little-endian u16 stream words per element
    (``_Parsed.stream_matrix32``); packing halves the host upload, the
    scarce resource under the TPU tunnel.
    bias: (B, 3072) int32 fixed-point tables; hist_n/acc: (B, 12, 256) int32
    — one table set per image, where G_total = B * groups_per_image.
    wcols: (G_total, 16, g) int32 per-tile predictor weights (profile 2).
    """
    n_groups, wmax = streams.shape
    b = bias.shape[0]
    npg = n_groups // b  # groups per image
    # pad so the aligned (g+128)-pair window load never runs off the end
    streams = jnp.pad(streams.astype(jnp.int32), ((0, 0), (0, g + 256)))
    wmax = streams.shape[1]
    streams3 = streams[:, None, :]  # (n_groups, 1, wmax): Mosaic-tileable block
    # two-level table layouts (kernel docstring): coarse boundaries (16, 12)
    # and fine 16-column rows (16, 192) keyed by qd*16 + coarse index
    acc_f = acc.reshape(b, N_QD, 16, 16).astype(jnp.float32)
    c16_t = jnp.swapaxes(acc_f[:, :, :, 0], 1, 2)  # (B, 16, 12)
    facc_t = jnp.swapaxes(acc_f.reshape(b, 192, 16), 1, 2)  # (B, 16, 192)
    freq_t = jnp.swapaxes(
        hist_n.reshape(b, 192, 16).astype(jnp.float32), 1, 2
    )
    bias2_t = jnp.swapaxes(
        bias.reshape(b, 192, 16).astype(jnp.float32), 1, 2
    )
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    ).astype(jnp.float32)

    kernel = functools.partial(_kernel, th=th, tw=tw, near=near, g=g,
                               profile=profile)

    def tab_spec(rows, cols):
        return pl.BlockSpec(
            (1, rows, cols), lambda gi, i, *_: (gi // npg, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups, th),
        in_specs=[
            pl.BlockSpec((None, 1, wmax), lambda gi, i, *_: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
            tab_spec(16, N_QD),
            tab_spec(16, 192),
            tab_spec(16, 192),
            tab_spec(16, 192),
            pl.BlockSpec((g, g), lambda gi, i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, g), lambda gi, i, *_: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tw, g), lambda gi, i, *_: (gi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((1, g), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((tw, g), jnp.int32),
            pltpu.VMEM((tw, g), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups, th, tw, g), jnp.int32),
        interpret=interpret,
    )(n_active.astype(jnp.int32), streams3, c16_t, facc_t, freq_t, bias2_t,
      tri, wcols.astype(jnp.int32))
    # uint8 on device: the host link is ~40-80 MB/s, don't ship int32
    return jnp.transpose(out, (0, 3, 1, 2)).astype(jnp.uint8)
