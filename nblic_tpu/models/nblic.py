"""Device-native interop engine for the ``NBLIC0.3`` container (efforts 1-3).

Bit-identical to the reference codec loop (NBLIC.c:749-908) at effort 1 for
every ``near`` in 0..9.  The whole codec is one fused ``lax.scan`` over the
raster: per pixel it fresh-samples the causal window from three carried rows
(ops/window.py), runs the blend predictor + dual-bin quantizer + context
correction (ops/predict.py, ops/context.py), walks the rank mapper
(ops/automapper.py), and drives the adaptive binary range coder
(ops/range_coder.py).  Encode and decode share the body, like the
reference's single ``NBLICcodec`` function.

Efforts 2-3 add the int64 online least-squares predictor (AVP, ops/avp.py)
and run under x64 mode — bit-identical to the reference on CPU devices
(tests/test_interop_jax.py); the native runtime (runtime/nbrt_nblic.cpp) is
the host fast path for the same containers.  The TPU-native re-design of
the AVP idea (batched per-tile least squares on the MXU) lives in the NBTC
engine, not here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MAX_PX_INC, MIN_K_STEP, N_CONTEXT
from ..ops import automapper, avp, context as ctx_ops, range_coder as rc
from ..ops.predict import (
    activity,
    n_context_address,
    n_quantize_activity,
    n_simple_predict,
)
from ..ops.window import fresh_t_tap, fresh_window_rows
from ..utils.container import NblicHeader, check_size


def _codec_scan(buf, img_flat, h: int, w: int, near: int, k_step: int,
                decode: bool, effort: int = 1):
    """Fused effort-1..3 codec loop. Returns (reconstruction, coder state).

    Efforts 2-3 add the online int64 least-squares predictor (ops/avp.py);
    they require x64 mode (the callers wrap with enable_x64)."""
    n_feat = avp.N_LIST[effort]
    use_avp = n_feat > 0
    m_stat = avp.get_m(n_feat) if use_avp else 1

    if decode:
        st0 = rc.coder_init_decode(buf)
    else:
        st0 = rc.coder_init_encode(buf)

    tree0 = jnp.full((rc.N_QD, 256, 2), rc.N_QW, jnp.int32)
    maps0 = automapper.init_mappers()
    ctx0 = jnp.zeros((N_CONTEXT,), jnp.int32)

    def row_body(carry, i):
        cur0, prev1, prev2, ctx, tree, maps, st, b_cols, biasv = carry
        f_cols = (
            avp.precalculate_f(b_cols, m_stat) if use_avp else b_cols
        )
        e0 = jnp.zeros((m_stat,), jnp.int64)

        def col_body(ccarry, j):
            cur, ctx, tree, maps, st, err, b_cols, e_acc, biasv = ccarry
            nb = fresh_window_rows(i, j, cur, prev1, prev2, w)
            px_simple = n_simple_predict(nb)
            if use_avp:
                t_tap = fresh_t_tap(i, j, prev1, w, nb.d)
                feat = avp.features(nb, t_tap, n_feat)
                bias1, bias2 = avp.dual_biases(biasv)
                f_col = f_cols[j]
                px1f, ok1 = avp.predict(e_acc, f_col, feat, bias1, n_feat)
                px2f, ok2 = avp.predict(e_acc, f_col, feat, bias2, n_feat)
                px0 = jnp.where(
                    ok1,
                    ((px1f + (1 << (avp.FB1 - 1))) >> avp.FB1).astype(
                        jnp.int32
                    ),
                    px_simple,
                )
                px1f = jnp.where(
                    ok1, px1f, px0.astype(jnp.int64) << avp.FB1
                )
            else:
                px0 = px_simple
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
            if use_avp:
                xf = x.astype(jnp.int64) << avp.FB1
                s_curr = jnp.abs(px1f - xf)
                s_sum = e_acc[0] + f_col[0] + avp.tdiv(
                    s_curr * avp.BETA, avp.BETA - 1
                )
                e_acc, b_col = avp.update(
                    e_acc, b_cols[j], feat, x, s_curr, s_sum, n_feat
                )
                b_cols = b_cols.at[j].set(b_col)
                biasv = jnp.where(
                    ok1 & ok2,
                    jnp.where(
                        jnp.abs(px1f - xf) > jnp.abs(px2f - xf), bias2, bias1
                    ),
                    biasv,
                )
            return (cur, ctx, tree, maps, st, err, b_cols, e_acc, biasv), None

        (cur, ctx, tree, maps, st, _, b_cols2, _, biasv), _ = jax.lax.scan(
            col_body,
            (cur0, ctx, tree, maps, st, jnp.int32(0), b_cols, e0, biasv),
            jnp.arange(w, dtype=jnp.int32),
        )
        return (
            (jnp.zeros((w,), jnp.int32), cur, prev1, ctx, tree, maps, st,
             b_cols2, biasv),
            cur,
        )

    z = jnp.zeros((w,), jnp.int32)
    b0 = jnp.zeros((w, m_stat), jnp.int64)
    init = (z, z, z, ctx0, tree0, maps0, st0, b0, jnp.int64(avp.BIAS_INIT))
    (_, _, _, _, _, _, st, _, _), rows = jax.lax.scan(
        row_body, init, jnp.arange(h, dtype=jnp.int32)
    )
    if not decode:
        st = rc.coder_flush(st)
    return rows, st


_codec_scan_jit = jax.jit(_codec_scan, static_argnums=(2, 3, 4, 5, 6, 7))


def _run_codec(buf, img_flat, h, w, near, k_step, decode, effort):
    """Dispatch the fused scan; efforts 2-3 run under x64 (int64 AVP)."""
    if effort == 1:
        return _codec_scan_jit(buf, img_flat, h, w, near, k_step, decode, 1)
    with jax.enable_x64():
        return _codec_scan_jit(
            buf, img_flat, h, w, near, k_step, decode, effort
        )


def encode(img: np.ndarray, near: int = 0, effort: int = 1) -> bytes:
    """Efforts 1-3 encode, bit-identical to NBLICcompress (NBLIC.c:915-917).

    Efforts 2-3 engage the int64 AVP (ops/avp.py) under x64 mode — supported
    on CPU devices; the native runtime serves them on any host, and the NBTC
    profile-2 engine is the TPU-native counterpart.
    """
    if effort not in (1, 2, 3):
        raise NotImplementedError("effort must be 1..3")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    check_size(h, w)
    near = int(np.clip(near, 0, 9))
    k_step = int(np.clip(MIN_K_STEP + 2 * near, MIN_K_STEP, 16))

    cap = 4 * h * w + 4096
    buf = jnp.zeros((cap,), jnp.uint8)
    _, st = _run_codec(
        buf, jnp.asarray(img.reshape(-1).astype(np.int32)), h, w, near,
        k_step, False, effort,
    )
    n_bytes = int(st.ptr)
    if n_bytes > cap:
        # JAX scatter writes clip at the buffer end, so an overrun would
        # otherwise return a silently truncated stream (the native path
        # detects this via ByteSink::overflowed)
        raise ValueError("compressed stream exceeded output capacity")
    payload = np.asarray(st.buf[:n_bytes]).tobytes()
    head = NblicHeader(1, h, w, near, k_step, effort).to_bytes()
    return head + payload


def decode(stream: bytes) -> np.ndarray:
    """NBLIC0.3 decode (effort 1), bit-compatible with NBLICdecompress."""
    hdr = NblicHeader.from_bytes(stream)
    if hdr.effort not in (1, 2, 3):
        raise ValueError(f"bad effort {hdr.effort}")
    check_size(hdr.height, hdr.width)
    payload = np.frombuffer(stream, dtype=np.uint8, offset=NblicHeader.SIZE)
    rows, _ = _run_codec(
        jnp.asarray(payload),
        jnp.zeros((1,), jnp.int32),  # unused on decode
        hdr.height,
        hdr.width,
        hdr.near,
        hdr.k_step,
        True,
        hdr.effort,
    )
    return np.asarray(rows, dtype=np.uint8)
