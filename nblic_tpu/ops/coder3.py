"""Band-frozen adaptive tables for the profile-3 coder (shared enc/dec).

The reference adapts its bit counters, context table, and AutoMapper after
*every* symbol — an inherently serial chain (NBLIC.c:589-679, 470-523).
Profile 3 freezes all adaptive state within each pixel row and updates it
between rows from order-independent row aggregates (segment sums), so the
encoder stays fully parallel and the decoder's per-pixel work is pure table
*reads*.  Measured on Kodak, row-frozen adaptation with per-strip tables
costs ~0.01 bpp against the reference's per-symbol chains.

State (all int32):
- unary counters  (L, N_ROW, N_CLASS, 2) — one pair per escalation class
  (the unary bin position is layer-deterministic, ops/zcodec3.py), private
  per strip lane L, halved when c0+c1 > 8192 (MAX_COUNTER semantics,
  NBLIC.c:612-616).
- refine counters (L, N_ROW, N_REFINE, 2, 2) — (row, bit position,
  seen-a-one) context for the k refinement bits.
- mapper history  (B, 512, N_MAP) — shared across an image's strips; ranks
  are rebuilt per row by stable sort on decayed counts (the AutoMapper's
  bubble-rerank, NBLIC.c:470-523, as a batch re-rank).

Every update in this file is an einsum over one-hot masks: exact integer
counts carried in f32 (all values < 2^24), no scatters in any hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import zcodec3
from .rans_bin import PROB_MAX

N_MAP = 20
MAP_KEYS = 512
MAP_BUMP = 4      # v1 mapper decay; the tuned container version overrides
MAP_HALVE = 4096  # these per stream via strips.Tune (replay contract)
# Counter dynamics are replay state: the serialized strips.Tune (extended
# block fields cnt_init/cnt_halve) overrides these defaults per stream.
CNT_INIT = 32
CNT_HALVE = 8192  # N_QW*MAX_COUNTER (NBLIC.c:612)
QW_MAX = 32


def init_unary(lanes: int, n_class: int, init: int = CNT_INIT):
    return jnp.full((lanes, zcodec3.N_ROW, n_class, 2), init, jnp.int32)


def init_refine(lanes: int, init: int = CNT_INIT):
    return jnp.full(
        (lanes, zcodec3.N_ROW, zcodec3.N_REFINE, 2, 2), init, jnp.int32
    )


def init_mapper(n_imgs: int):
    base = (2 * (N_MAP - 1 - jnp.arange(N_MAP, dtype=jnp.int32)))[None, :]
    return jnp.tile(base, (n_imgs, MAP_KEYS, 1)).reshape(
        n_imgs, MAP_KEYS, N_MAP
    )


def prob_table(tab):
    """Counter pairs (..., 2) -> 12-bit P(bin=1), clipped to [1, 4095]."""
    c0 = tab[..., 0]
    c1 = tab[..., 1]
    return jnp.clip((PROB_MAX * c1) // (c0 + c1), 1, PROB_MAX - 1)


def mix_prob(pu, pv, qw):
    """Dual-counter interpolation (AriCodec, NBLIC.c:628-631)."""
    p = (pu * (QW_MAX - qw) + pv * qw + QW_MAX // 2) // QW_MAX
    return jnp.clip(p, 1, PROB_MAX - 1)


def mapper_ranks(mhist):
    """(B, 512, N_MAP) counts -> (ranks y->z, order z->y), stable by y."""
    order = jnp.argsort(-mhist, axis=-1, stable=True)
    ranks = jnp.argsort(order, axis=-1)  # inverse permutation
    return ranks.astype(jnp.int32), order.astype(jnp.int32)


def halve_pairs(tab, thresh: int):
    over = (tab[..., 0] + tab[..., 1]) > thresh
    return jnp.where(over[..., None], (tab + 1) >> 1, tab)


def _oh(v, n):
    return jax.nn.one_hot(v.astype(jnp.int32), n, dtype=jnp.float32)


def row_updates(utab, rtab, qw, unary, refine, row_end, k_end, k_step: int,
                n_unary: int = zcodec3.N_UNARY, halve: int = CNT_HALVE):
    """Fold one row's coded events into the counter tables.

    All row planes are (L, W); ``unary``/``refine`` are zcodec3 layer lists
    for this row (escape bypass bits are priced at 1/2 and never counted).
    Returns updated (utab, rtab).
    """
    lc = zcodec3.layer_consts(k_step, n_unary)
    qwf = qw.astype(jnp.float32)

    du = jnp.zeros(utab.shape, jnp.float32)
    for l, (row_u, row_v, b, act) in enumerate(unary):
        actf = act.astype(jnp.float32)
        ohu = _oh(row_u, zcodec3.N_ROW) * actf[..., None]
        ohv = _oh(row_v, zcodec3.N_ROW) * actf[..., None]
        ohb = _oh(b, 2)
        c = lc.cls_vals[l]
        contrib = jnp.einsum(
            "lwr,lwx,lw->lrx", ohu, ohb, QW_MAX - qwf
        , precision=jax.lax.Precision.HIGHEST) + jnp.einsum("lwr,lwx,lw->lrx", ohv, ohb, qwf, precision=jax.lax.Precision.HIGHEST)
        du = du.at[:, :, c, :].add(contrib)
    utab = halve_pairs(utab + du.astype(jnp.int32), halve)

    dr = jnp.zeros(rtab.shape, jnp.float32)
    for l, (bit, act, msb) in enumerate(refine):
        actf = act.astype(jnp.float32)
        ohr = _oh(row_end, zcodec3.N_ROW) * actf[..., None]
        kk = jnp.maximum(k_end - 1 - l, 0)
        ohk = _oh(kk, zcodec3.N_REFINE)
        ohm = _oh(msb, 2)
        ohb = _oh(bit, 2)
        dr = dr + jnp.einsum(
            "lwr,lwk,lwm,lwx->lrkmx", ohr, ohk, ohm, ohb
        , precision=jax.lax.Precision.HIGHEST)
    rtab = halve_pairs(rtab + dr.astype(jnp.int32), halve)
    return utab, rtab


def mapper_updates(mhist, img_of_lane, key, y,
                   bump: int = MAP_BUMP, halve: int = MAP_HALVE):
    """Decayed per-(key, y) frequency update for one row (order-free).

    ``bump``/``halve`` set the decay dynamic; they are replay-contract
    values carried by the container version (strips.Tune)."""
    small = (y < N_MAP).astype(jnp.float32)
    ohy = _oh(jnp.minimum(y, N_MAP - 1), N_MAP) * small[..., None]
    ohkey = _oh(key, MAP_KEYS)
    ohimg = _oh(img_of_lane, mhist.shape[0])
    counts = jnp.einsum("lwk,lwy,lb->bky", ohkey, ohy, ohimg, precision=jax.lax.Precision.HIGHEST)
    mhist = mhist + bump * counts.astype(jnp.int32)
    over = jnp.max(mhist, axis=-1, keepdims=True) > halve
    return jnp.where(over, mhist >> 1, mhist)


def mapper_lookup(table, img_of_lane, key, val):
    """table (B, 512, N_MAP) int32; key/val (L, W).  Exact one-hot gather."""
    t = jnp.einsum(
        "lb,bky->lky", _oh(img_of_lane, table.shape[0]),
        table.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    ohkey = _oh(key, MAP_KEYS)
    per_key = jnp.einsum("lwk,lky->lwy", ohkey, t, precision=jax.lax.Precision.HIGHEST)
    ohv = _oh(jnp.minimum(val, N_MAP - 1), N_MAP)
    return jnp.sum(per_key * ohv, -1).astype(jnp.int32)
