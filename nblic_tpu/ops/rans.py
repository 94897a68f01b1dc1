"""Device rANS entropy coding (static tables, 16-bit renorm, 15-bit hists).

The coder state machine matches the reference exactly (QNBLIC.c:221-274):
32-bit state, low bound 2^16, one 16-bit word per renormalization, symbols
drawn from histograms normalized to 2^15.

TPU-native structure (SURVEY.md §7.1.3): the fold is serial *per stream* but
the framework runs **many independent streams in lockstep vector lanes** —
one stream per tile (NBTC) or per image (interop).  The per-symbol frequency
and cumulative-frequency values are gathered in a fully parallel pass first,
so the encode fold body is pure branch-free vector arithmetic with no table
lookups inside the scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

ANS_BITS = 16
ANS_MASK = (1 << ANS_BITS) - 1
ANS_LOW_BOUND = 1 << ANS_BITS
NORM_BITS = 15
NORM_MASK = (1 << NORM_BITS) - 1
ANS_HIGH_BOUND_NORM = (1 << (2 * ANS_BITS - NORM_BITS)) - 1


def encode_scan(freq: jnp.ndarray, acc: jnp.ndarray):
    """Lockstep rANS encode of S parallel streams.

    freq/acc: (S, L) uint32 per-symbol frequency / cumulative frequency in
    *raster* order (the fold itself walks them in reverse, QNBLIC.c:639-645).

    Returns (words, emits, state):
      words: (S, L) int32 — candidate u16 word at each fold step,
      emits: (S, L) bool  — whether that step renormalized (emitted a word),
      state: (S,)  uint32 — final coder state (two trailing words).
    Step order along L is fold order (reverse raster).
    """
    freq = freq.astype(jnp.uint32)
    acc = acc.astype(jnp.uint32)
    s = freq.shape[0]

    def step(state, inp):
        h, ha = inp
        quot = state // h
        renorm = quot > ANS_HIGH_BOUND_NORM
        word = (state & ANS_MASK).astype(jnp.int32)
        state = jnp.where(renorm, state >> ANS_BITS, state)
        quot = jnp.where(renorm, state // h, quot)
        state = (state % h) + (quot << NORM_BITS) + ha
        return state, (word, renorm)

    # derive the init from the input so its sharding/varying-axis metadata
    # matches under shard_map (a literal init trips the scan vma check)
    state0 = jnp.full_like(freq[:, 0], ANS_LOW_BOUND)
    # fold walks the symbol sequence backwards; unroll amortizes the TPU
    # loop-step overhead over several symbols
    xs = (freq[:, ::-1].T, acc[:, ::-1].T)
    state, (words, emits) = jax.lax.scan(step, state0, xs, unroll=8)
    return words.T, emits.T, state


def pack_streams(words, emits, state):
    """Device-side compaction of S fold outputs into decode-ready streams.

    Returns (flat, lengths): ``flat`` is a (S*(L+2),) uint16 buffer holding
    every stream back to back in decode order ([state_hi, state_lo, emitted
    words reversed]); ``lengths`` (S,) int32 gives each stream's word count.
    Only ``flat[:lengths.sum()]`` is meaningful — callers fetch the lengths
    first and then slice, so the host transfer is the *compressed* size, not
    the padded fold layout.
    """
    s, l = words.shape
    cap = s * (l + 2)
    counts = jnp.sum(emits, axis=1, dtype=jnp.int32)
    lengths = counts + 2
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lengths)[:-1].astype(jnp.int32)]
    )
    rank = jnp.cumsum(emits, axis=1, dtype=jnp.int32) - 1  # fold-order rank
    # decode order reverses the emitted words after the two state words
    pos = offsets[:, None] + 2 + (counts[:, None] - 1 - rank)
    idx = jnp.where(emits, pos, cap)  # dropped by scatter mode="drop"
    flat = jnp.zeros((cap,), jnp.int32)
    flat = flat.at[idx.reshape(-1)].set(words.reshape(-1), mode="drop")
    st = state.astype(jnp.int32)
    flat = flat.at[offsets].set((st >> ANS_BITS) & ANS_MASK)
    flat = flat.at[offsets + 1].set(st & ANS_MASK)
    return flat.astype(jnp.uint16), lengths


def interleave_pack(words, emits, state):
    """Pack a lockstep fold into ONE interleaved stream (decode-read order).

    Classic multi-stream rANS interleaving: the encoder (which runs the
    symbols in reverse) lays renormalization words out so that the lockstep
    decoder — processing all lanes simultaneously, lane-ascending within each
    step — reads the stream strictly sequentially.  This removes every
    per-lane stream pointer from the decoder: one scalar cursor serves all
    lanes (the heart of the Pallas decode kernel, ops/pallas_decode.py).

    Layout: head = S hi-words (lane ascending) then S lo-words (the split
    keeps kernel-side reads contiguous); body: for decode step t ascending,
    the words consumed at step t in lane-ascending order (= fold step
    f = L-1-t).

    Returns (flat int32 buffer sized S*(L+2) — only the first ``total``
    entries meaningful — and ``total``, the stream word count, as a scalar).
    """
    s, l = words.shape
    cap = s * (l + 2)
    cnt = jnp.sum(emits, axis=0, dtype=jnp.int32)  # (L,) per fold step
    # decode step t consumes fold step L-1-t: words of fold step f start
    # after all fold steps f' > f
    suffix = jnp.cumsum(cnt[::-1])[::-1] - cnt
    block_start = 2 * s + suffix
    rank = jnp.cumsum(emits, axis=0, dtype=jnp.int32) - emits  # lane-prefix
    pos = block_start[None, :] + rank
    idx = jnp.where(emits, pos, cap)
    flat = jnp.zeros((cap,), jnp.int32)
    flat = flat.at[idx.reshape(-1)].set(words.reshape(-1), mode="drop")
    st = state.astype(jnp.int32)
    lane = jnp.arange(s, dtype=jnp.int32)
    flat = flat.at[lane].set((st >> ANS_BITS) & ANS_MASK)
    flat = flat.at[s + lane].set(st & ANS_MASK)
    total = 2 * s + jnp.sum(cnt)
    return flat, total


def interleaved_dec_init(stream, n_lanes: int):
    """Lockstep decoder init from an interleaved stream (one shared cursor)."""
    hi = stream[:n_lanes].astype(jnp.uint32)
    lo = stream[n_lanes : 2 * n_lanes].astype(jnp.uint32)
    return (hi << ANS_BITS) | lo, jnp.int32(2 * n_lanes)


def interleaved_dec_renorm(state, sp, stream, active):
    """Post-symbol renorm for all lanes against the shared cursor.

    state: (G,) uint32; sp: scalar int32 cursor; active: (G,) bool lane mask.
    Returns (state, sp).
    """
    need = (state < ANS_LOW_BOUND) & active
    rank = jnp.cumsum(need.astype(jnp.int32)) - need.astype(jnp.int32)
    idx = jnp.minimum(sp + rank, stream.shape[0] - 1)
    word = stream[idx].astype(jnp.uint32)
    state = jnp.where(need, (state << ANS_BITS) | word, state)
    sp = sp + jnp.sum(need.astype(jnp.int32))
    return state, sp


def split_streams(flat: np.ndarray, lengths: np.ndarray) -> list[np.ndarray]:
    """Host-side split of a packed buffer into per-stream u16 arrays."""
    bounds = np.cumsum(lengths)[:-1]
    return np.split(np.asarray(flat, dtype=np.uint16), bounds)


def pad_streams(flat: np.ndarray, lengths: np.ndarray, wmax: int) -> np.ndarray:
    """Host-side layout of packed streams into a (S, wmax) lockstep matrix."""
    lengths = np.asarray(lengths, dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    idx = offsets[:, None] + np.arange(wmax)[None, :]
    mask = np.arange(wmax)[None, :] < lengths[:, None]
    idx = np.minimum(idx, len(flat) - 1)
    return np.where(mask, np.asarray(flat)[idx], 0).astype(np.int32)


def finalize_streams(words, emits, state) -> list[np.ndarray]:
    """Host-side compaction: per-stream decode-ready u16 arrays.

    Reproduces the reference's end-of-fold flush + word reversal
    (QNBLIC.c:250-253, 277-287): decode order is [state_hi, state_lo,
    emitted words in reverse fold order].
    """
    words = np.asarray(words)
    emits = np.asarray(emits)
    state = np.asarray(state)
    out = []
    for t in range(words.shape[0]):
        emitted = words[t][emits[t]].astype(np.uint16)
        head = np.array(
            [(state[t] >> ANS_BITS) & ANS_MASK, state[t] & ANS_MASK], dtype=np.uint16
        )
        out.append(np.concatenate([head, emitted[::-1]]))
    return out


def dec_start(words: jnp.ndarray):
    """Initial decoder state from the first two stream words (QNBLIC.c:256-260).

    words: (W,) uint16/int32 one stream.  Returns (state uint32, ptr int32).
    """
    w = words.astype(jnp.uint32)
    state = (w[0] << ANS_BITS) | w[1]
    return state, jnp.int32(2)


def dec_step(state, ptr, words, h, ha, lb):
    """One rANS symbol-decode state advance (QNBLIC.c:263-274).

    The symbol itself is looked up by the caller (lut[qd, state & NORM_MASK])
    because the table layout differs between engines; this advances the state
    given the symbol's (freq, acc) and the pre-extracted low bits ``lb``.
    """
    state = (state >> NORM_BITS) * h.astype(jnp.uint32) + lb - ha.astype(jnp.uint32)
    need = state < ANS_LOW_BOUND
    nxt = words[jnp.minimum(ptr, words.shape[0] - 1)].astype(jnp.uint32)
    state = jnp.where(need, (state << ANS_BITS) | nxt, state)
    ptr = ptr + need.astype(jnp.int32)
    return state, ptr
