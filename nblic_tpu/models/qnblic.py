"""Device-native interop engine for the ``Q0.2`` container (effort 0).

Produces/consumes byte streams **bit-identical** to the reference encoder
(QNBLIC.c:562-655) and decoder (QNBLIC.c:493-555), with the computation
structured for the device:

- Encode stage 1 (prediction/activity/context address) is the fully-parallel
  whole-plane pass (ops/predict.py) — the reference's own MT pipeline proves
  this factorization is exact (QNBLIC.c:683-739).
- The only truly sequential piece — the per-context EWMA chain — runs as a
  single fused ``lax.scan`` over raster order carrying the 3072-cell table
  (QNBLIC.c:176-188 semantics, including the +63 rounding constant).
- The rANS fold rides the shared lockstep coder (ops/rans.py).
- Decode is one fused scan with the sliding-window registers (ops/window.py),
  mirroring the reference's fundamentally sequential decode loop.

The native host runtime (runtime/) is the fast path for this container; this
engine is the device-resident golden model (SURVEY.md §7.2.2) used to
validate every constant and rounding rule on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import Q_N_CONTEXT
from ..ops import context as ctx_ops
from ..ops import histogram as hist_ops
from ..ops import rans
from ..ops.predict import model_stage1
from ..ops.window import pixel_model, row_start_window, slide_window
from ..utils.container import QnblicHeader, check_size

N_QD = 12
NORM_SUM = hist_ops.NORM_SUM


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


@jax.jit
def _context_chain(x, px0, err, adr):
    """Raster-order per-context EWMA chain -> y plane (QNBLIC.c:592-619)."""
    flat = lambda v: v.reshape(-1)

    def step(ctx_arr, inp):
        xx, p0, ee, ad = inp
        ctx = ctx_arr[ad]
        px, sign = ctx_ops.q_correct_px(ctx, p0)
        y = ctx_ops.residual_fold(xx, px, sign, 0)
        ctx_arr = ctx_arr.at[ad].set(ctx_ops.q_update_ctx(ctx, ee))
        return ctx_arr, y

    init = jnp.zeros((Q_N_CONTEXT,), jnp.int32)
    _, y = jax.lax.scan(step, init, (flat(x), flat(px0), flat(err), flat(adr)))
    return y.reshape(x.shape)


@jax.jit
def _stage1(img):
    x = img.astype(jnp.int32)
    px0, err, qd, adr = model_stage1(x)
    return x, px0, err, qd, adr


def encode(img: np.ndarray) -> bytes:
    """Lossless effort-0 encode, bit-identical to QNBLICcompress."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    check_size(h, w)
    x, px0, err, qd, adr = _stage1(jnp.asarray(img))
    y = _context_chain(x, px0, err, adr)

    qd_np = np.asarray(qd).reshape(-1)
    y_np = np.asarray(y).reshape(-1)
    hist = np.zeros((N_QD, 256), dtype=np.uint32)
    np.add.at(hist, (qd_np, y_np), 1)

    hist_n = np.stack([hist_ops.normalize(hh) for hh in hist])
    acc = np.stack([hist_ops.accumulate(hh) for hh in hist_n])

    freq = hist_n[qd_np, y_np].astype(np.int32)[None, :]
    facc = acc[qd_np, y_np].astype(np.int32)[None, :]
    words, emits, state = rans.encode_scan(jnp.asarray(freq), jnp.asarray(facc))
    (payload,) = rans.finalize_streams(words, emits, state)

    head = QnblicHeader(h, w).to_bytes()
    hist_words: list[int] = []
    for hh in hist_n:
        hist_words.extend(hist_ops.serialize(hh))
    return head + np.asarray(hist_words, np.uint16).tobytes() + payload.tobytes()


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _decode_scan(words, hist_n, acc, lut_flat, h: int, w: int):
    """Fused sequential decode (QNBLIC.c:520-552) as a double scan."""
    state0, ptr0 = rans.dec_start(words)

    def row_body(carry, i):
        prev1, prev2, ctx_arr, state, ptr = carry
        regs = row_start_window(i, prev1, prev2, w)

        def col_body(ccarry, j):
            regs, err, row, ctx_arr, state, ptr = ccarry
            px0, qd, adr = pixel_model(regs, err)
            ctx = ctx_arr[adr]
            px, sign = ctx_ops.q_correct_px(ctx, px0)
            lb = state & rans.NORM_MASK
            y = lut_flat[qd * NORM_SUM + lb.astype(jnp.int32)]
            state, ptr = rans.dec_step(
                state, ptr, words, hist_n[qd, y], acc[qd, y], lb
            )
            x = ctx_ops.residual_unfold(y, px, sign, 0)
            err = x - px0
            ctx_arr = ctx_arr.at[adr].set(ctx_ops.q_update_ctx(ctx, err))
            row = row.at[j].set(x)
            regs = slide_window(regs, x, i, j, prev1, prev2, w)
            return (regs, err, row, ctx_arr, state, ptr), None

        row0 = jnp.zeros((w,), jnp.int32)
        (regs, _, row, ctx_arr, state, ptr), _ = jax.lax.scan(
            col_body,
            (regs, jnp.int32(0), row0, ctx_arr, state, ptr),
            jnp.arange(w, dtype=jnp.int32),
            unroll=4,
        )
        return (row, prev1, ctx_arr, state, ptr), row

    init = (
        jnp.zeros((w,), jnp.int32),
        jnp.zeros((w,), jnp.int32),
        jnp.zeros((Q_N_CONTEXT,), jnp.int32),
        state0,
        ptr0,
    )
    _, rows = jax.lax.scan(row_body, init, jnp.arange(h, dtype=jnp.int32))
    return rows


_decode_scan_jit = jax.jit(_decode_scan, static_argnums=(4, 5))


def decode(stream: bytes) -> np.ndarray:
    """Decode a Q0.2 container, bit-compatible with QNBLICdecompress."""
    hdr = QnblicHeader.from_bytes(stream)
    check_size(hdr.height, hdr.width)
    words = np.frombuffer(stream, dtype=np.uint16)
    pos = 4
    hists = []
    for _ in range(N_QD):
        hh, pos = hist_ops.deserialize(words, pos)
        hists.append(hh)
    hist_n = np.stack(hists)
    acc = np.stack([hist_ops.accumulate(hh) for hh in hist_n])
    lut = np.stack([hist_ops.decode_lut(a) for a in acc]).astype(np.int32)

    payload = words[pos:].astype(np.int32)
    img = _decode_scan_jit(
        jnp.asarray(payload),
        jnp.asarray(hist_n.astype(np.int32)),
        jnp.asarray(acc.astype(np.int32)),
        jnp.asarray(lut.reshape(-1)),
        hdr.height,
        hdr.width,
    )
    return np.asarray(img, dtype=np.uint8)
