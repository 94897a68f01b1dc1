"""Multi-group variant of the Mosaic lockstep decoder: 8 interleave groups
(8 x 128 = 1024 tile lanes) per kernel instance.

The single-group kernel (ops/pallas_decode.py) leaves per-step fixed costs
(loop bookkeeping, layout changes, scalar ops) amortized over only 128
pixels; this variant runs eight groups' lanes side by side on the full
lane axis, so those costs spread over 1024 pixels/step.  Group-coupled
pieces — shared-cursor renorm, head-word init, table selection — are
unrolled per group over static lane slices; everything elementwise runs on
the fused (rows, 1024) arrays.

Bit-identical to the single-group kernel (same stream format; groups are
independent).  STATUS: correct on TPU but ~2x slower than the single-group
kernel (62 vs 119 MPix/s on Kodak-24) — the per-group concats and the
block-diagonal rank/routing matmuls cost more than the amortized fixed
overhead saves.  Kept as a documented experiment; the decode path uses
ops/pallas_decode.py.
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

S_GROUPS = 8

_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32,
    )


def _kernel(nact_ref, stream_ref, c16_ref, facc_ref, freq_ref, bias2_ref,
            tri_ref, w_ref, out_ref, state_ref, sp_ref, prev1_ref, prev2_ref,
            *, th: int, tw: int, near: int, g: int, profile: int):
    s_g = S_GROUPS
    lanes = s_g * g
    i = pl.program_id(1)
    gi = pl.program_id(0)
    lane_in_group = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1) % g
    group_of = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1) // g
    iota12 = jax.lax.broadcasted_iota(jnp.int32, (N_QD, lanes), 0)
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (16, lanes), 0)
    iota192 = jax.lax.broadcasted_iota(jnp.int32, (192, lanes), 0)
    iota2sg = jax.lax.broadcasted_iota(jnp.int32, (s_g * 2 * g, lanes), 0)
    iotw = jax.lax.broadcasted_iota(jnp.int32, (tw, lanes), 0)

    # per-lane active mask from the per-group counts (scalar prefetch)
    nact = jnp.zeros((1, lanes), jnp.int32)
    for s in range(s_g):
        nact = jnp.where(group_of == s, nact_ref[gi * s_g + s], nact)
    active = (lane_in_group < nact).astype(jnp.int32)

    @pl.when(i == 0)
    def _init():
        # per-group head words: g hi then g lo at each group's stream start
        st = []
        for s in range(s_g):
            hi = stream_ref[s, pl.ds(0, g)].astype(jnp.uint32)
            lo = stream_ref[s, pl.ds(g, g)].astype(jnp.uint32)
            st.append(((hi << ANS_BITS) | lo)[None, :])
            sp_ref[s] = 2 * g
        state_ref[...] = jnp.concatenate(st, axis=1)
        prev1_ref[...] = jnp.zeros((tw, lanes), jnp.int32)
        prev2_ref[...] = jnp.zeros((tw, lanes), jnp.int32)

    p1 = prev1_ref[...]
    p2 = prev2_ref[...]
    state0 = state_ref[...]
    sp0 = tuple(sp_ref[s] for s in range(s_g))

    def masked_row(mat, col):
        sel = (iotw == col).astype(jnp.int32)
        return jnp.sum(mat * sel, axis=0, keepdims=True)

    def table_rows(tab_ref, oh192):
        """Per-group (16, g) row select, concatenated to (16, lanes)."""
        outs = []
        for s in range(s_g):
            outs.append(_mm(tab_ref[s], oh192[:, s * g : (s + 1) * g]))
        return jnp.concatenate(outs, axis=1)

    def decode_pixel(j, regs, err, state, sps, row):
        nb = Neighbors(*regs)
        px0 = simple_predict(nb)
        # profile-2 weights: (s_g, 16, g) -> (16, lanes) by group slices
        if profile == 2:
            wl = jnp.concatenate(
                [w_ref[s] for s in range(s_g)], axis=1
            )
            px_l = lsq_predict(regs, wl)
            flagv = wl[12:13, :]
            px_a = (px0 + px_l + 1) >> 1
            px0 = jnp.where(
                flagv == 1, px_l, jnp.where(flagv == 2, px_a, px0)
            )
        qd = quantize_activity(activity(nb, err))
        adr = context_address(nb, px0, qd)
        tex = adr & 0xFF

        oh_qd = (iota12 == qd).astype(jnp.float32)
        oh_qt = (iota192 == (qd * 16 + (tex >> 4))).astype(jnp.float32)
        brow = table_rows(bias2_ref, oh_qt)
        oh_lo4 = (iota16 == (tex & 15)).astype(jnp.float32)
        bval = jnp.sum(brow * oh_lo4, axis=0, keepdims=True).astype(jnp.int32)
        sign = (bval >> (BIAS_FRAC_BITS - 1)) & 1
        px = jnp.clip(px0 + (bval >> BIAS_FRAC_BITS) + sign, 0, MAX_VAL)

        lb = (state & NORM_MASK).astype(jnp.int32)
        lbf = lb.astype(jnp.float32)
        crow = table_rows(c16_ref, oh_qd)  # (16,12) per group @ qd one-hot
        gidx = jnp.sum(
            (crow <= lbf).astype(jnp.int32), axis=0, keepdims=True
        ) - 1
        oh_qg = (iota192 == (qd * 16 + gidx)).astype(jnp.float32)
        frow = table_rows(facc_ref, oh_qg)
        ylo = jnp.sum(
            (frow <= lbf).astype(jnp.int32), axis=0, keepdims=True
        ) - 1
        y = gidx * 16 + ylo
        oh_ylo = (iota16 == ylo).astype(jnp.float32)
        accv = jnp.sum(frow * oh_ylo, axis=0, keepdims=True).astype(
            jnp.int32
        ).astype(jnp.uint32)
        hrow = table_rows(freq_ref, oh_qg)
        freq = jnp.sum(hrow * oh_ylo, axis=0, keepdims=True).astype(
            jnp.int32
        ).astype(jnp.uint32)
        state = (state >> NORM_BITS) * freq + lb.astype(jnp.uint32) - accv

        # shared-cursor renorm, all groups at once: block-diagonal triangular
        # matmul gives within-group prefix ranks; each group's 2g window is
        # loaded at its own aligned base and concatenated, and one global
        # one-hot matmul routes words to lanes (lane-sliced vectors can't be
        # broadcast in Mosaic, so everything stays full-width)
        need = ((state < ANS_LOW_BOUND).astype(jnp.int32)) * active
        needf = need.astype(jnp.float32)
        wmax = stream_ref.shape[-1]
        rank = _mm(needf, tri_ref[...]).astype(jnp.int32)  # (1, lanes)
        offs = jnp.zeros((1, lanes), jnp.int32)
        new_sps = []
        windows = []
        for s in range(s_g):
            sp_s = sps[s]
            base = pl.multiple_of(
                jnp.minimum((sp_s >> 7) << 7, ((wmax - 2 * g) >> 7) << 7), 128
            )
            windows.append(
                stream_ref[s, pl.ds(base, 2 * g)].astype(jnp.float32)[None, :]
            )
            offs = jnp.where(group_of == s, s * 2 * g + (sp_s - base), offs)
            need_sg = jnp.where(group_of == s, needf, 0.0)
            new_sps.append(sp_s + jnp.sum(need_sg).astype(jnp.int32))
        window_cat = jnp.concatenate(windows, axis=1)  # (1, s_g*2g)
        tgt = jnp.where(need == 1, offs + rank, -1)
        sel = (iota2sg == tgt).astype(jnp.float32)  # (s_g*2g, lanes)
        word = _mm(window_cat, sel).astype(jnp.int32)
        state = jnp.where(
            need == 1, (state << ANS_BITS) | word.astype(jnp.uint32), state
        )

        ty = (jnp.clip(px, 0, MAX_VAL - px) + near) // (2 * near + 1)
        in_fold = y <= 2 * ty
        mag = jnp.where(in_fold, (y + 1) >> 1, y - ty)
        sy = jnp.where(in_fold, (y & 1) ^ sign, (px < MID_VAL).astype(jnp.int32))
        mag = jnp.where(y <= 0, 0, mag) * (2 * near + 1)
        sy = jnp.where(y <= 0, 0, sy)
        x = jnp.clip(px + jnp.where(sy == 1, mag, -mag), 0, MAX_VAL)
        err = x - px0
        row = jnp.where(iotw == j, x, row)
        return x, err, state, tuple(new_sps), row

    def slide(regs, x, j):
        a, b, c, d, e, f, gg, h, q, r, s = regs
        e2, a2, q2, c2, b2 = a, x, c, b, d
        s2, h2, f2, g2 = h, f, gg, r
        nxt1 = masked_row(p1, jnp.minimum(j + 2, tw - 1))
        d2 = jnp.where(i <= 0, a2, jnp.where(j + 2 >= tw, d, nxt1))
        nxt2 = masked_row(p2, jnp.minimum(j + 3, tw - 1))
        r2 = jnp.where(i <= 1, d2, jnp.where(j + 3 >= tw, r, nxt2))
        return (a2, b2, c2, d2, e2, f2, g2, h2, q2, r2, s2)

    mid = jnp.full((1, lanes), MID_VAL, jnp.int32)
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
        regs, err, state, sps, row = carry
        x, err, state, sps, row = decode_pixel(j, regs, err, state, sps, row)
        regs = slide(regs, x, j)
        return regs, err, state, sps, row

    err0 = jnp.zeros((1, lanes), jnp.int32)
    row0 = jnp.zeros((tw, lanes), jnp.int32)
    _, _, state, sps, row = jax.lax.fori_loop(
        0, tw, col_body, (regs, err0, state0, sp0, row0)
    )
    out_ref[0, 0] = row
    state_ref[...] = state
    for s in range(s_g):
        sp_ref[s] = sps[s]
    prev2_ref[...] = p1
    prev1_ref[...] = row


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11))
def decode_groups_pallas8(streams, n_active, bias, hist_n, acc, wcols,
                          th: int, tw: int, near: int, g: int,
                          profile: int = 1, interpret: bool = False):
    """8-group lockstep decode: (G_total, Wmax) -> (G_total, g, th, tw).

    G_total must be a multiple of 8 (callers pad with n_active = 0 rows);
    per-group tables: bias (G_total, 3072), hist_n/acc (G_total, 12, 256).
    """
    n_groups, wmax = streams.shape
    s_g = S_GROUPS
    streams = jnp.pad(streams.astype(jnp.int32), ((0, 0), (0, 2 * g + 128)))
    wmax = streams.shape[1]
    acc_f = acc.reshape(n_groups, N_QD, 16, 16).astype(jnp.float32)
    c16_t = jnp.swapaxes(acc_f[:, :, :, 0], 1, 2)  # (G, 16, 12)
    facc_t = jnp.swapaxes(acc_f.reshape(n_groups, 192, 16), 1, 2)
    freq_t = jnp.swapaxes(
        hist_n.reshape(n_groups, 192, 16).astype(jnp.float32), 1, 2
    )
    bias2_t = jnp.swapaxes(
        bias.reshape(n_groups, 192, 16).astype(jnp.float32), 1, 2
    )
    # block-diagonal strict-lower triangle: rank counts needing lanes
    # earlier in the SAME group
    lanes_n = s_g * g
    r_i = jax.lax.broadcasted_iota(jnp.int32, (lanes_n, lanes_n), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (lanes_n, lanes_n), 1)
    tri = ((r_i < c_i) & (r_i // g == c_i // g)).astype(jnp.float32)

    kernel = functools.partial(_kernel, th=th, tw=tw, near=near, g=g,
                               profile=profile)
    n_super = n_groups // s_g

    def tab_spec(rows, cols):
        return pl.BlockSpec(
            (s_g, rows, cols), lambda gi, i, *_: (gi, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_super, th),
        in_specs=[
            pl.BlockSpec((s_g, wmax), lambda gi, i, *_: (gi, 0),
                         memory_space=pltpu.VMEM),
            tab_spec(16, N_QD),
            tab_spec(16, 192),
            tab_spec(16, 192),
            tab_spec(16, 192),
            pl.BlockSpec((s_g * g, s_g * g), lambda gi, i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            tab_spec(16, g),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tw, s_g * g), lambda gi, i, *_: (gi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((1, s_g * g), jnp.uint32),
            pltpu.SMEM((s_g,), jnp.int32),
            pltpu.VMEM((tw, s_g * g), jnp.int32),
            pltpu.VMEM((tw, s_g * g), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_super, th, tw, s_g * g), jnp.int32),
        interpret=interpret,
    )(n_active.astype(jnp.int32), streams, c16_t, facc_t, freq_t, bias2_t,
      tri, wcols.astype(jnp.int32))
    # (n_super, th, tw, s_g*g) -> (n_groups, g, th, tw)
    out = out.reshape(n_super, th, tw, s_g, g)
    out = jnp.transpose(out, (0, 3, 4, 1, 2)).reshape(n_groups, g, th, tw)
    return out.astype(jnp.uint8)
