"""Binary rANS with 12-bit probabilities (NBTC profile-3 entropy stage).

The profile-3 coder emits a *bounded, layer-aligned* sequence of binary
decisions per pixel (ops/zcodec3.py).  Those bins are coded with a binary
rANS whose 12-bit probabilities come from the band-frozen counter tables —
the rANS equivalent of the reference's carry-less arithmetic coder
(NBLIC.c:527-586), chosen because the rANS *encode fold factors into many
independent lockstep lanes* while an arithmetic coder's fold cannot split.

Interleaving: every (strip, phase) pair owns an independent rANS state.
Slots are assigned to phases statically — phase = slot_index mod N_PHASE —
so the per-state slot subsequence is a pure reshape of the dense slot grid
(no data-dependent compaction anywhere).  Masked slots pass the state
through untouched; the decoder skips the same slots (it walks the same
layer structure), so both sides stay in phase lock by construction.

State machine: 32-bit state, range [2^16, 2^32), one uint16 word per
renormalization (at most one per symbol on both sides — proof: encode
renorm leaves state < 2^16 <= freq << 20; decode renorm starts from
state >= 16 so one word lifts it past 2^16).  Streams are packed in decode
order [state_hi, state_lo, words...] by the shared rans.pack_streams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PROB_BITS = 12
PROB_MAX = 1 << PROB_BITS          # 4096
ANS_BITS = 16
ANS_MASK = (1 << ANS_BITS) - 1
ANS_LOW = 1 << ANS_BITS

N_PHASE = 16                        # interleaved states per strip lane
BYPASS_P1 = PROB_MAX // 2           # raw-bit probability


def _freq_acc(bins, p1):
    """(freq, acc) of each binary symbol.  Layout: 0 -> [0, p0), 1 -> [p0, 4096)."""
    p1 = p1.astype(jnp.uint32)
    p0 = PROB_MAX - p1
    freq = jnp.where(bins == 1, p1, p0)
    acc = jnp.where(bins == 1, p0, 0)
    return freq, acc


def fold(p1, bins, mask, unroll: int = 8):
    """Lockstep reverse fold of S independent bin sequences.

    p1/bins/mask: (S, L) int32 in *decode* order (the fold walks them
    backwards).  Masked slots leave the state untouched and emit nothing.
    Returns (words, emits, state) with words/emits (S, L) in fold order,
    ready for rans.pack_streams.
    """
    freq, acc = _freq_acc(bins, jnp.clip(p1, 1, PROB_MAX - 1))

    def step(state, inp):
        f, a, m = inp
        renorm = (state >= (f << (2 * ANS_BITS - PROB_BITS))) & m
        word = (state & ANS_MASK).astype(jnp.int32)
        state2 = jnp.where(renorm, state >> ANS_BITS, state)
        state3 = ((state2 // f) << PROB_BITS) + (state2 % f) + a
        state = jnp.where(m, state3, state)
        return state, (word, renorm)

    s = p1.shape[0]
    state0 = jnp.full((s,), ANS_LOW, jnp.uint32)
    xs = (freq[:, ::-1].T, acc[:, ::-1].T, mask[:, ::-1].T)
    state, (words, emits) = jax.lax.scan(step, state0, xs, unroll=unroll)
    return words.T, emits.T, state


def dec_init(words):
    """words: (S, W) stream matrix rows [hi, lo, ...].  Returns (state, ptr)."""
    w = words.astype(jnp.uint32)
    return (w[..., 0] << ANS_BITS) | w[..., 1], jnp.full(words.shape[:-1], 2, jnp.int32)


def dec_bit(state, p1):
    """Decode one binary symbol from each lane's state (no renorm).

    Returns (bin, new_state_pre_renorm)."""
    p1 = jnp.clip(p1, 1, PROB_MAX - 1).astype(jnp.uint32)
    p0 = PROB_MAX - p1
    lb = state & (PROB_MAX - 1)
    b = (lb >= p0).astype(jnp.int32)
    freq = jnp.where(b == 1, p1, p0)
    acc = jnp.where(b == 1, p0, 0)
    state = (state >> PROB_BITS) * freq + lb - acc
    return b, state


def dec_renorm(state, ptr, words):
    """Per-lane renorm against each lane's own stream row.

    state: (...,) uint32; ptr: (...,) int32; words: (..., W)."""
    need = state < ANS_LOW
    idx = jnp.minimum(ptr, words.shape[-1] - 1)
    nxt = jnp.take_along_axis(words, idx[..., None], axis=-1)[..., 0]
    state = jnp.where(need, (state << ANS_BITS) | nxt.astype(jnp.uint32), state)
    return state, ptr + need.astype(jnp.int32)
