"""Device-native interop engine for the ``NBLIC0.3`` container (effort 1).

Bit-identical to the reference codec loop (NBLIC.c:749-908) at effort 1 for
every ``near`` in 0..9.  The whole codec is one fused ``lax.scan`` over the
raster: per pixel it fresh-samples the causal window from three carried rows
(ops/window.py), runs the blend predictor + dual-bin quantizer + context
correction (ops/predict.py, ops/context.py), walks the rank mapper
(ops/automapper.py), and drives the adaptive binary range coder
(ops/range_coder.py).  Encode and decode share the body, like the
reference's single ``NBLICcodec`` function.

Efforts 2-3 add the int64 online least-squares predictor (AVP); those
interop paths are served by the native runtime (runtime/nbrt_nblic.cpp) —
the device engine rejects them explicitly.  The TPU-native re-design of the
AVP idea (batched per-tile least squares on the MXU) lives in the NBTC
engine, not here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MAX_PX_INC, MIN_K_STEP, N_CONTEXT
from ..ops import automapper, context as ctx_ops, range_coder as rc
from ..ops.predict import (
    activity,
    n_context_address,
    n_quantize_activity,
    n_simple_predict,
)
from ..ops.window import fresh_window_rows
from ..utils.container import NblicHeader, check_size


def _codec_scan(buf, img_flat, h: int, w: int, near: int, k_step: int, decode: bool):
    """Fused effort-1 codec loop. Returns (reconstruction, coder state)."""

    if decode:
        st0 = rc.coder_init_decode(buf)
    else:
        st0 = rc.coder_init_encode(buf)

    tree0 = jnp.full((rc.N_QD, 256, 2), rc.N_QW, jnp.int32)
    maps0 = automapper.init_mappers()
    ctx0 = jnp.zeros((N_CONTEXT,), jnp.int32)

    def row_body(carry, i):
        cur0, prev1, prev2, ctx, tree, maps, st = carry

        def col_body(ccarry, j):
            cur, ctx, tree, maps, st, err = ccarry
            nb = fresh_window_rows(i, j, cur, prev1, prev2, w)
            px0 = n_simple_predict(nb)
            delta = activity(nb, err)
            qu, qv, qw = n_quantize_activity(delta)
            adr = n_context_address(nb, px0, qu)
            px, sign = ctx_ops.n_correct_px(ctx[adr], px0)
            key = px * 2 + sign

            if decode:
                z_in = jnp.int32(0)
            else:
                x_orig = img_flat[i * w + j]
                y_enc = ctx_ops.residual_fold(x_orig, px, sign, near)
                z_in = automapper.fold(maps, key, y_enc)
            st, tree, z = rc.code_symbol(
                st, tree, k_step, qu, qv, qw, z_in, decode
            )
            y = automapper.unfold(maps, key, z) if decode else y_enc
            maps = automapper.observe(maps, key, y)
            x = ctx_ops.residual_unfold(y, px, sign, near)
            err = jnp.clip(x - px0, -MAX_PX_INC, MAX_PX_INC)
            ctx = ctx.at[adr].set(ctx_ops.n_update_ctx(ctx[adr], err))
            cur = cur.at[j].set(x)
            return (cur, ctx, tree, maps, st, err), None

        (cur, ctx, tree, maps, st, _), _ = jax.lax.scan(
            col_body,
            (cur0, ctx, tree, maps, st, jnp.int32(0)),
            jnp.arange(w, dtype=jnp.int32),
        )
        return (jnp.zeros((w,), jnp.int32), cur, prev1, ctx, tree, maps, st), cur

    z = jnp.zeros((w,), jnp.int32)
    init = (z, z, z, ctx0, tree0, maps0, st0)
    (_, _, _, _, _, _, st), rows = jax.lax.scan(
        row_body, init, jnp.arange(h, dtype=jnp.int32)
    )
    if not decode:
        st = rc.coder_flush(st)
    return rows, st


_codec_scan_jit = jax.jit(_codec_scan, static_argnums=(2, 3, 4, 5, 6))


def encode(img: np.ndarray, near: int = 0, effort: int = 1) -> bytes:
    """Effort-1 encode, bit-identical to NBLICcompress (NBLIC.c:915-917)."""
    if effort != 1:
        raise NotImplementedError(
            "device interop engine supports effort 1; use the native runtime "
            "for the AVP efforts (2-3), or the NBTC engine for the TPU path"
        )
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    check_size(h, w)
    near = int(np.clip(near, 0, 9))
    k_step = int(np.clip(MIN_K_STEP + 2 * near, MIN_K_STEP, 16))

    cap = 4 * h * w + 4096
    buf = jnp.zeros((cap,), jnp.uint8)
    _, st = _codec_scan_jit(
        buf, jnp.asarray(img.reshape(-1).astype(np.int32)), h, w, near, k_step, False
    )
    n_bytes = int(st.ptr)
    payload = np.asarray(st.buf[:n_bytes]).tobytes()
    head = NblicHeader(1, h, w, near, k_step, 1).to_bytes()
    return head + payload


def decode(stream: bytes) -> np.ndarray:
    """NBLIC0.3 decode (effort 1), bit-compatible with NBLICdecompress."""
    hdr = NblicHeader.from_bytes(stream)
    if hdr.effort != 1:
        raise NotImplementedError(
            "device interop engine decodes effort 1; efforts 2-3 are served "
            "by the native runtime"
        )
    check_size(hdr.height, hdr.width)
    payload = np.frombuffer(stream, dtype=np.uint8, offset=NblicHeader.SIZE)
    rows, _ = _codec_scan_jit(
        jnp.asarray(payload),
        jnp.zeros((1,), jnp.int32),  # unused on decode
        hdr.height,
        hdr.width,
        hdr.near,
        hdr.k_step,
        True,
    )
    return np.asarray(rows, dtype=np.uint8)
