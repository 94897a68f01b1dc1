"""Binary range coder + adaptive counters + escalating symbol coder (device).

Scan-step building blocks for the NBLIC0.3 interop engine, matching the
reference bit for bit:

- carry-less 32-bit range coder, 12-bit probability split, byte
  renormalization (NBLIC.c:527-586),
- (c0,c1) counter pairs with interpolated-weight updates and halving at
  32*256 (NBLIC.c:589-637),
- the Zcodec escalating unary/binary symbol walk over a 16x256 counter tree
  (NBLIC.c:640-679).

All state lives in scan carries: coder registers are uint32 scalars, the
counter tree is a (16,256,2) int32 array, and the byte stream is a carried
buffer with a write/read pointer.  Aliasing when qu==qv is preserved by
updating the tree functionally between the two counter bumps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

N_QD = 16
N_QW = 32
MAX_COUNTER = 256
PROB_MAX = 1 << 12
TOP_MASK = jnp.uint32(0xFF000000)


class CoderState(NamedTuple):
    lo: jnp.ndarray  # uint32
    hi: jnp.ndarray  # uint32
    window: jnp.ndarray  # uint32 (decoder stream window)
    ptr: jnp.ndarray  # int32 (next byte to write/read)
    buf: jnp.ndarray  # uint8 byte stream (carried)


def coder_init_encode(buf: jnp.ndarray) -> CoderState:
    return CoderState(
        jnp.uint32(0), jnp.uint32(0xFFFFFFFF), jnp.uint32(0), jnp.int32(0), buf
    )


def coder_init_decode(buf: jnp.ndarray) -> CoderState:
    w = (
        (buf[0].astype(jnp.uint32) << 24)
        | (buf[1].astype(jnp.uint32) << 16)
        | (buf[2].astype(jnp.uint32) << 8)
        | buf[3].astype(jnp.uint32)
    )
    return CoderState(
        jnp.uint32(0), jnp.uint32(0xFFFFFFFF), w, jnp.int32(4), buf
    )


def _read_byte(buf, ptr):
    """Byte fetch mirroring ByteSource semantics (0 past the end)."""
    v = buf[jnp.minimum(ptr, buf.shape[0] - 1)].astype(jnp.uint32)
    return jnp.where(ptr < buf.shape[0], v, 0)


def _renorm(st: CoderState, decode: bool) -> CoderState:
    def cond(s):
        return ((s.lo ^ s.hi) & TOP_MASK) == 0

    def body(s):
        if decode:
            window = (s.window << 8) | _read_byte(s.buf, s.ptr)
            buf = s.buf
        else:
            window = s.window
            buf = s.buf.at[s.ptr].set((s.hi >> 24).astype(jnp.uint8))
        return CoderState(
            s.lo << 8, (s.hi << 8) | 0xFF, window, s.ptr + 1, buf
        )

    return jax.lax.while_loop(cond, body, st)


def code_bit(st: CoderState, bin_in, prob, decode: bool):
    """One binary decision (NBLIC.c:552-573). Returns (state, bin)."""
    span = st.hi - st.lo
    prob = prob.astype(jnp.uint32)
    mid = st.lo + (span >> 12) * prob + (((span & 0xFFF) * prob) >> 12)
    if decode:
        b = (st.window <= mid).astype(jnp.int32)
    else:
        b = bin_in
    hi = jnp.where(b == 1, mid, st.hi)
    lo = jnp.where(b == 1, st.lo, mid + 1)
    st = CoderState(lo, hi, st.window, st.ptr, st.buf)
    return _renorm(st, decode), b


def coder_flush(st: CoderState) -> CoderState:
    """Encoder flush: emit 4 bytes of lo (NBLIC.c:576-586)."""
    def body(k, s):
        buf = s.buf.at[s.ptr].set((s.lo >> 24).astype(jnp.uint8))
        return CoderState(s.lo << 8, s.hi, s.window, s.ptr + 1, buf)

    return jax.lax.fori_loop(0, 4, body, st)


# ---------------------------------------------------------------------------
# adaptive counters + mixed coding
# ---------------------------------------------------------------------------


def counter_bump(tree, row, idx, b, amount):
    """counterUpdate (NBLIC.c:606-618) on tree (16,256,2) at [row, idx]."""
    c = tree[row, idx]  # (2,) [c0, c1]
    c = c.at[jnp.where(b == 1, 1, 0)].add(amount)
    over = (c[0] + c[1]) > (N_QW * MAX_COUNTER)
    c = jnp.where(over, (c + 1) >> 1, c)
    return tree.at[row, idx].set(c)


def _prob1(tree, row, idx):
    c = tree[row, idx]
    return (PROB_MAX * c[1]) // (c[0] + c[1])


def mixed_code_bit(st: CoderState, tree, qu, qv, i, qw, bin_in, decode: bool):
    """AriCodec (NBLIC.c:628-637): two-counter mix, code, sequential bumps."""
    prob = (_prob1(tree, qu, i) * (N_QW - qw) + _prob1(tree, qv, i) * qw + N_QW // 2) // N_QW
    prob = jnp.clip(prob, 1, PROB_MAX - 1)
    st, b = code_bit(st, bin_in, prob, decode)
    tree = counter_bump(tree, qu, i, b, N_QW - qw)
    tree = counter_bump(tree, qv, i, b, qw)  # sees u's update if aliased
    return st, tree, b


def code_symbol(st: CoderState, tree, k_step: int, qu, qv, qw, z_in, decode: bool):
    """Zcodec walk (NBLIC.c:640-679). Returns (state, tree, z)."""
    k_max = (N_QD - 1) // k_step
    qv = jnp.where(qv // k_step != qu // k_step, qu, qv)

    def unary_cond(c):
        return ~c[5]

    def unary_body(c):
        st, tree, i, qu, qv, stop, k, guard = c
        k = qu // k_step
        if decode:
            bin_in = jnp.int32(0)
        else:
            bin_in = ((i >> k_max) < (z_in >> k)).astype(jnp.int32)
        st, tree, b = mixed_code_bit(st, tree, qu, qv, i, qw, bin_in, decode)
        stop = b == 0
        i2 = i + (1 << k_max)
        esc = (i2 >= 256) & ~stop
        i2 = jnp.where(stop, i, jnp.where(esc, i2 >> 1, i2))
        qn = jnp.minimum((k + 1) * k_step, N_QD - 1)
        qu = jnp.where(esc, qn, qu)
        qv = jnp.where(esc, qn, qv)
        # corrupt streams can feed continuation bins forever; bound the walk
        stop = stop | (guard > 4096)
        return (st, tree, i2, qu, qv, stop, k, guard + 1)

    init = (st, tree, jnp.int32(0), qu, qv, jnp.asarray(False), jnp.int32(0),
            jnp.int32(0))
    st, tree, i, qu, qv, _, k, _ = jax.lax.while_loop(
        unary_cond, unary_body, init
    )
    k = qu // k_step  # k of the final unary bin

    z = ((i >> k_max) << k) if decode else z_in
    if decode:
        z = (i >> k_max) << k

    # binary refinement: k bits MSB-first through a tree walk of the row
    def bit_body(c):
        st, tree, i, z, kk = c
        if decode:
            bin_in = jnp.int32(0)
        else:
            bin_in = (z_in >> kk) & 1
        st, tree, b = mixed_code_bit(st, tree, qu, qv, i, qw, bin_in, decode)
        if decode:
            z = z + jnp.where(b == 1, 1 << kk, 0)
        i = i + jnp.where(b == 1, 1 << kk, 1)
        return (st, tree, i, z, kk - 1)

    def bit_cond(c):
        return c[4] >= 0

    st, tree, _, z, _ = jax.lax.while_loop(
        bit_cond, bit_body, (st, tree, i + 1, z, k - 1)
    )
    return st, tree, z
