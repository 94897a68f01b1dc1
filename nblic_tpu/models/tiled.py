"""NBTC — the TPU-native tiled codec (this framework's performance path).

Design (SURVEY.md §7.1.5, re-thought for TPU rather than translated from the
reference's raster-sequential C):

- The image is cut into fixed-size tiles; every tile is an independent
  entropy stream, so encode *and* decode parallelize across tiles in lockstep
  vector lanes.
- Lossless encode is two fully-parallel device passes: (1) whole-plane
  modeling (ops/predict.py) + a segment-sum static context-bias table +
  residual fold + histogram scatter; (2) per-tile rANS folds in lockstep
  (ops/rans.py).  The only raster-sequential piece of the reference — the
  per-context EWMA (QNBLIC.c:176-188) — is replaced by a *transmitted*
  two-pass bias table, which removes the sequential chain from the decoder
  entirely.
- Decode (and near-lossless encode, which needs reconstruction feedback) run
  as one fused scan per tile: all lanes march over pixel positions in
  lockstep, so every buffer access is uniform across lanes and the per-lane
  state is O(1) registers (the reference's sliding window, QNBLIC.c:67-79).

Container: ``NBTC0001`` (utils/container.py) — shared bias + histograms,
per-tile stream length table, concatenated forward-readable rANS payloads.
"""

from __future__ import annotations

import functools
import zlib

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import Q_N_CONTEXT
from ..ops import context as ctx_ops
from ..ops import histogram as hist_ops
from ..ops import rans
from ..ops.predict import model_stage1
from ..ops.window import pixel_model, row_start_window, slide_window
from ..utils.container import NbtcHeader, check_size

DEFAULT_TILE = (64, 64)
N_QD = 12
N_SYM = 256
NORM_SUM = hist_ops.NORM_SUM


# ---------------------------------------------------------------------------
# tiling helpers (host)
# ---------------------------------------------------------------------------


def _tile_grid(h, w, th, tw):
    gh = -(-h // th)
    gw = -(-w // tw)
    return gh, gw


def to_tiles(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Pad (edge-replicate) and cut into (T, th, tw)."""
    h, w = img.shape
    gh, gw = _tile_grid(h, w, th, tw)
    pad_h, pad_w = gh * th - h, gw * tw - w
    padded = np.pad(img, ((0, pad_h), (0, pad_w)), mode="edge")
    t = padded.reshape(gh, th, gw, tw).swapaxes(1, 2).reshape(gh * gw, th, tw)
    return np.ascontiguousarray(t)


def from_tiles(tiles: np.ndarray, h: int, w: int, th: int, tw: int) -> np.ndarray:
    gh, gw = _tile_grid(h, w, th, tw)
    img = tiles.reshape(gh, gw, th, tw).swapaxes(1, 2).reshape(gh * th, gw * tw)
    return np.ascontiguousarray(img[:h, :w])


# ---------------------------------------------------------------------------
# device pass 1: parallel modeling (lossless)
# ---------------------------------------------------------------------------


def _model_lossless_impl(tiles: jnp.ndarray):
    """tiles (T,th,tw) uint8 -> (y, qd, bias, hist) — one parallel pass."""
    x = tiles.astype(jnp.int32)
    px0, err, qd, adr = jax.vmap(model_stage1)(x)
    bias = ctx_ops.build_static_bias(adr, err, Q_N_CONTEXT)
    px, sign = ctx_ops.apply_static_bias(bias, adr, px0)
    y = ctx_ops.residual_fold(x, px, sign, 0)
    hist = ctx_ops.pair_segment_sum(
        qd.reshape(-1) * N_SYM + y.reshape(-1), None, N_QD * N_SYM
    ).reshape(N_QD, N_SYM)
    return y, qd, bias, hist


_model_lossless = jax.jit(_model_lossless_impl)
# batched over an image axis: per-image bias tables and histograms
_model_lossless_batch = jax.jit(jax.vmap(_model_lossless_impl))


def _norm_hist_dev(h: jnp.ndarray) -> jnp.ndarray:
    """Device-side histogram normalization to sum 2^15 (NBTC containers).

    A vectorizable largest-bin remainder scheme replacing the reference's
    loop-based ``normHist`` (QNBLIC.c:308-358) for the native format: scale
    with a small reserve so every nonzero bin keeps >=1 and the floor sum
    never overshoots, then dump the remainder on the argmax bin (capped at
    2^15-1, spilling to the next slot like normHist's single-bin case).  Any
    table summing to exactly 2^15 is decodable; this one is within ~1% of
    the reference's entropy-optimal rounding.
    """
    total = h.sum()
    nz = (h > 0).astype(jnp.int32)
    scale = (NORM_SUM - 260.0) / jnp.maximum(total, 1).astype(jnp.float32)
    s = jnp.floor(h.astype(jnp.float32) * scale).astype(jnp.int32) + nz
    rem = NORM_SUM - s.sum()
    top = jnp.argmax(s)
    s = s.at[top].add(rem)
    over = jnp.maximum(s[top] - (NORM_SUM - 1), 0)
    s = s.at[top].add(-over).at[(top + 1) % N_SYM].add(over)
    empty = jnp.zeros((N_SYM,), jnp.int32).at[0].set(NORM_SUM - 1).at[1].set(1)
    return jnp.where(total == 0, empty, s)


def _gather_tables(y, qd, hist_n, acc):
    """Exact (freq, acc) lookup for every pixel via one-hot matmuls.

    XLA's native gather is the encode bottleneck on TPU (~25 ns/elem); the
    bilinear one-hot contraction runs on the MXU instead.  Tables are <=
    2^15 so float32 at HIGHEST precision is exact.
    """
    idx = (qd.reshape(-1) * N_SYM + y.reshape(-1)).astype(jnp.int32)
    # f32 one-hots: bf16 byte-split variants win un-batched (~1.7x) but
    # collapse ~5x under the per-image vmap (batched bf16 dots fall off the
    # MXU fast path on v5e) — measured both; keep f32 here
    table = jnp.stack([hist_n.reshape(-1), acc.reshape(-1)], -1)
    t3 = table.reshape(24, 128, 2).astype(jnp.float32)
    rows = jax.nn.one_hot(idx >> 7, 24, dtype=jnp.float32)
    cols = jax.nn.one_hot(idx & 127, 128, dtype=jnp.float32)
    # contract the 128-wide axis first: (P,128) @ (128, 24*2) keeps the
    # intermediate at (P, 48) floats
    ctmp = jnp.einsum(
        "pc,rcx->prx", cols, t3, precision=jax.lax.Precision.HIGHEST
    )
    out = jnp.einsum(
        "pr,prx->px", rows, ctmp, precision=jax.lax.Precision.HIGHEST
    )
    freq = out[:, 0].astype(jnp.uint32)
    facc = out[:, 1].astype(jnp.uint32)
    return freq, facc


# interleave-group width: one shared-cursor stream per G tiles (profile 1)
G_LANES = 128

# near>0: bias-table refinement passes over the feedback scan (measured on
# Kodak-24: 1 pass captures ~all of the gain, 2 adds <0.1%)
NEAR_BIAS_ITERS = 1


def _fold_streams(freq, facc):
    """rANS fold: Mosaic kernel on real TPUs, lax.scan elsewhere.

    Bit-identical either way (ops/pallas_fold.py is tested against
    ops/rans.py encode_scan); the kernel amortizes the scan's fixed
    per-step cost (~5x on the Kodak batch).
    """
    if _use_pallas() and freq.ndim == 2 and freq.shape[1] % 256 == 0:
        from ..ops import pallas_fold

        return pallas_fold.encode_fold(
            freq.astype(jnp.int32), facc.astype(jnp.int32)
        )
    return rans.encode_scan(freq, facc)


def _encode_tables(y, qd, bias, g_lanes: int = G_LANES,
                   hist_in=None, valid=None):
    """Histogram build/normalize + per-pixel (freq, facc) table gather.

    First half of the encode tail; returns (freq, facc, hist_n) with the
    lane axis padded to a multiple of ``g_lanes`` (pad lanes are identity
    symbols that encode nothing).

    ``g_lanes`` sets the interleave-group width (the container records it);
    the SPMD path passes its per-shard tile count so groups stay
    shard-local.  ``hist_in`` lets that path supply psum'd histograms.
    """
    t = y.shape[0]
    if hist_in is None:
        hist = ctx_ops.pair_segment_sum(
            qd.reshape(-1) * N_SYM + y.reshape(-1), None, N_QD * N_SYM
        ).reshape(N_QD, N_SYM)
    else:
        hist = hist_in
    hist_n = jax.vmap(_norm_hist_dev)(hist)
    acc = jnp.cumsum(hist_n.reshape(-1)).reshape(N_QD, N_SYM) - hist_n
    acc = acc - (jnp.arange(N_QD, dtype=jnp.int32) * NORM_SUM)[:, None]
    freq, facc = _gather_tables(y, qd, hist_n, acc)
    freq = freq.reshape(t, -1)
    facc = facc.reshape(t, -1)
    if valid is not None:
        # mesh padding lanes become identity symbols (decoded as inactive)
        freq = jnp.where(valid[:, None], freq, jnp.uint32(NORM_SUM))
        facc = jnp.where(valid[:, None], facc, jnp.uint32(0))
    l = freq.shape[1]

    # pad the lane count to the group width with identity symbols
    # (freq == 2^15 encodes nothing and never renormalizes)
    n_groups = -(-t // g_lanes)
    t_pad = n_groups * g_lanes
    if t_pad > t:
        freq = jnp.concatenate(
            [freq, jnp.full((t_pad - t, l), NORM_SUM, freq.dtype)]
        )
        facc = jnp.concatenate([facc, jnp.zeros((t_pad - t, l), facc.dtype)])
    return freq, facc, hist_n


def _pack_groups(words, emits, state, g_lanes: int = G_LANES):
    """Interleave-pack a fold's outputs into per-group payload buffers."""
    s, l = words.shape
    n_groups = s // g_lanes
    flats, totals = jax.vmap(rans.interleave_pack)(
        words.reshape(n_groups, g_lanes, l),
        emits.reshape(n_groups, g_lanes, l),
        state.reshape(n_groups, g_lanes),
    )
    flat32 = flats[:, 0::2] | (flats[:, 1::2] << 16)
    return totals, flat32


def _finish_encode_parts(y, qd, bias, g_lanes: int = G_LANES,
                         hist_in=None, valid=None,
                         allow_pallas: bool = True):
    """Encode tail for ONE image: tables + rANS fold + group packing.

    Returns ``(totals, bias, hist_n, flat32)`` with ``flat32`` the
    (n_groups, cap32) worst-case-capacity payload buffers (u16 word pairs
    packed in int32) — the batch compactor gathers the live prefixes of
    these into one small transfer buffer.  Batch encoders call the pieces
    directly so the fold runs ONCE over all images' lanes (the Mosaic fold
    kernel must sit outside any vmap).
    """
    freq, facc, hist_n = _encode_tables(y, qd, bias, g_lanes, hist_in, valid)
    words, emits, state = (
        _fold_streams(freq, facc) if allow_pallas
        else rans.encode_scan(freq, facc)
    )
    totals, flat32 = _pack_groups(words, emits, state, g_lanes)
    return totals, bias, hist_n, flat32


def _finish_encode_device(y, qd, bias, g_lanes: int = G_LANES,
                          hist_in=None, valid=None,
                          allow_pallas: bool = True):
    """One packed int32 buffer per image (worst-case payload capacity):
      [ group totals (n_groups) | bias (3072) | hist_n (12*256) |
        group payloads (n_groups * cap_g/2 packed u16 pairs) ]
    """
    totals, bias, hist_n, flat32 = _finish_encode_parts(
        y, qd, bias, g_lanes, hist_in, valid, allow_pallas
    )
    return jnp.concatenate(
        [totals, bias, hist_n.reshape(-1), flat32.reshape(-1)]
    )


def _finish_encode_batch(y, qd, bias):
    """Batched encode tail: per-image tables, ONE fold over all images'
    lanes (keeps the Mosaic fold kernel out of vmap — batched Pallas calls
    and batched bf16 dots both fall off the TPU fast paths), per-image
    packing.  Returns (totals, bias, hist_n, flats32) with a leading image
    axis, same as vmapping ``_finish_encode_parts``."""
    freq, facc, hist_n = jax.vmap(_encode_tables)(y, qd, bias)
    b, t_pad, l = freq.shape
    words, emits, state = _fold_streams(
        freq.reshape(b * t_pad, l), facc.reshape(b * t_pad, l)
    )
    totals, flats32 = jax.vmap(_pack_groups)(
        words.reshape(b, t_pad, l),
        emits.reshape(b, t_pad, l),
        state.reshape(b, t_pad),
    )
    return totals, bias, hist_n, flats32


def _encode_device_impl(tiles: jnp.ndarray):
    """Whole lossless encode as ONE device program (no host round trips)."""
    y, qd, bias, _ = _model_lossless_impl(tiles)
    return _finish_encode_device(y, qd, bias)


def _encode_device_batch_impl(tiles: jnp.ndarray):
    """Batched worst-case-capacity encode; one fold program for the batch."""
    y, qd, bias, _ = jax.vmap(_model_lossless_impl)(tiles)
    totals, bias_o, hist_n, flats32 = _finish_encode_batch(y, qd, bias)
    b = tiles.shape[0]
    return jnp.concatenate(
        [totals, bias_o, hist_n.reshape(b, -1), flats32.reshape(b, -1)],
        axis=1,
    )


def _model_lossless2_impl(tiles: jnp.ndarray, near: int = 0):
    """Profile-2 modeling: per-tile MXU least-squares predictors (ops/lsq.py)
    raced against the blend predictor, winner transmitted per tile.

    ``near`` only rescales the race's code-length proxy (residuals are
    coded at magnitude ~|e|/(2*near+1)); the returned planes/bias are the
    lossless proxies either way."""
    from ..ops import lsq
    from ..ops.neighbors import sample
    from ..ops.predict import (
        activity, context_address, quantize_activity, shift_err,
        simple_predict,
    )

    x = tiles.astype(jnp.int32)
    n = jax.vmap(sample)(x)
    px_s = simple_predict(n)
    w_q, valid = lsq.fit_tile_weights(tiles)
    px_l = lsq.predict_plane(n, w_q)
    px_a = (px_s + px_l + 1) >> 1
    # 3-way per-tile race: blend / learned / their average (flag 0/1/2).
    # Scored with a Laplacian code-length proxy (2*log2(1+|err|) bits/px);
    # the learned choices carry the ~24 B weight-transmission cost plus
    # slack for the context-model shift they induce.
    def bits(px):
        e = jnp.abs(x - px).astype(jnp.float32) / (2.0 * near + 1.0)
        return jnp.sum(2.0 * jnp.log2(1.0 + e), axis=(1, 2))

    pen = jnp.float32(700.0)
    big = jnp.float32(3e38)
    cost_s = bits(px_s)
    cost_l = jnp.where(valid, bits(px_l) + pen, big)
    cost_a = jnp.where(valid, bits(px_a) + pen, big)
    flag = jnp.argmin(jnp.stack([cost_s, cost_l, cost_a]), axis=0).astype(
        jnp.int32
    )
    px0 = jnp.where(
        (flag == 1)[:, None, None],
        px_l,
        jnp.where((flag == 2)[:, None, None], px_a, px_s),
    )
    err = x - px0
    qd = quantize_activity(activity(n, shift_err(err)))
    adr = context_address(n, px0, qd)
    bias = ctx_ops.build_static_bias(adr, err, Q_N_CONTEXT)
    px, sign = ctx_ops.apply_static_bias(bias, adr, px0)
    y = ctx_ops.residual_fold(x, px, sign, 0)
    w_out = jnp.where((flag > 0)[:, None], w_q, 0)
    return y, qd, bias, w_out, flag


def _encode_device2_impl(tiles: jnp.ndarray):
    y, qd, bias, w_q, flags = _model_lossless2_impl(tiles)
    packed = _finish_encode_device(y, qd, bias)
    # append the weight planes + flags for host serialization
    return jnp.concatenate(
        [packed, w_q.reshape(-1), flags]
    )


def _refine_near_bias(x, bias, wcols, th: int, tw: int, near: int,
                      profile: int, n_iter: int):
    """Re-estimate the transmitted bias from the feedback scan's own errors.

    The proxy bias comes from lossless-stage errors, but near>0 quantization
    feedback shifts the per-context error distribution (the causal window
    holds reconstructed pixels).  Each iteration runs the feedback scan with
    the current table and rebuilds the table from the (address, x - px0)
    pairs the scan actually saw; the final table is transmitted, so the
    decoder replay stays exact regardless of iteration count.
    """
    for _ in range(n_iter):
        fn = functools.partial(
            _tile_encode_scan, th=th, tw=tw, near=near, profile=profile,
            stats=True,
        )
        _, _, adr, err, _ = jax.vmap(fn, in_axes=(0, None, 0))(x, bias, wcols)
        bias = ctx_ops.build_static_bias(adr, err, Q_N_CONTEXT)
    return bias


def _encode_near2_impl(tiles, th: int, tw: int, near: int,
                       n_iter: int = 1):
    """Near-lossless profile-2 encode: lossless-proxy predictor race, then
    ``n_iter`` joint refinement passes — each runs the feedback scan and
    rebuilds the transmitted bias from the scan's own errors AND refits the
    learned per-tile predictors on the scan's *reconstructed* windows
    (targets stay the originals), so both tables match what the decoder
    will actually see — then the final reconstruction-feedback scan."""
    from ..ops import lsq

    _, _, bias, w_q, flags = _model_lossless2_impl(tiles, near)
    x = tiles.astype(jnp.int32)
    zeros3 = jnp.zeros((tiles.shape[0], 3), jnp.int32)
    fn_stats = functools.partial(
        _tile_encode_scan, th=th, tw=tw, near=near, profile=2, stats=True
    )
    for _ in range(n_iter):
        wcols = jnp.concatenate([w_q, flags[:, None], zeros3], axis=1)
        _, _, adr, err, rec = jax.vmap(fn_stats, in_axes=(0, None, 0))(
            x, bias, wcols
        )
        bias = ctx_ops.build_static_bias(adr, err, Q_N_CONTEXT)
        w_new, valid = lsq.fit_tile_weights(rec, target=x)
        w_q = jnp.where((valid & (flags > 0))[:, None], w_new, w_q)
    wcols = jnp.concatenate([w_q, flags[:, None], zeros3], axis=1)
    fn = functools.partial(
        _tile_encode_scan, th=th, tw=tw, near=near, profile=2
    )
    y, qd = jax.vmap(fn, in_axes=(0, None, 0))(x, bias, wcols)
    packed = _finish_encode_device(y, qd, bias)
    return jnp.concatenate([packed, w_q.reshape(-1), flags])


def _encode_device2_batch_impl(tiles: jnp.ndarray):
    y, qd, bias, w_q, flags = jax.vmap(_model_lossless2_impl)(tiles)
    totals, bias_o, hist_n, flats32 = _finish_encode_batch(y, qd, bias)
    b = tiles.shape[0]
    return jnp.concatenate(
        [totals, bias_o, hist_n.reshape(b, -1), flats32.reshape(b, -1),
         w_q.reshape(b, -1), flags.reshape(b, -1)],
        axis=1,
    )


_encode_device_batch = jax.jit(_encode_device_batch_impl)
_encode_device2_batch = jax.jit(_encode_device2_batch_impl)
_finish_encode_jit = jax.jit(_finish_encode_device)
_encode_near2_jit = jax.jit(_encode_near2_impl, static_argnums=(1, 2, 3, 4))
_refine_near_jit = jax.jit(_refine_near_bias, static_argnums=(3, 4, 5, 6, 7))

# ---------------------------------------------------------------------------
# compact batch encode: one small transfer buffer for the whole batch
# ---------------------------------------------------------------------------

# Per-group payload buffers are sized for the entropy-coder worst case
# (16 bit/px), but natural images compress to ~4-6 bpp, so fetching the
# full-capacity buffers moves ~4x more bytes than the containers hold —
# and the host link is the scarce resource under the TPU tunnel.  The
# compactor gathers every group's live payload prefix into ONE buffer
# sized at a COMPACT_BPP batch average.  If a batch genuinely exceeds the
# budget (adversarial noise), the host detects it from the exact totals
# and re-fetches via the worst-case-capacity program.
COMPACT_BPP = 6


def _compact_cap32(n_imgs: int, n_tiles: int, l: int,
                   g_lanes: int = G_LANES) -> int:
    n_groups = -(-n_tiles // g_lanes)
    payload_bits = COMPACT_BPP * n_imgs * n_tiles * l
    head_bits = n_imgs * n_groups * 2 * g_lanes * 16  # rANS state flushes
    return (payload_bits + head_bits + 31) // 32 + n_imgs * n_groups


def _compact_payloads(flats32, totals, cap32: int):
    """Gather the live prefix of every group's payload into one buffer.

    flats32: (G, cap_full32) u16-pair buffers; totals: (G,) u16 counts.
    Groups are laid out back to back at int32 (pair) granularity, so the
    host can slice by the transmitted totals.  One linear gather (~25
    ns/elem on this platform) of cap32 elements — far cheaper than
    transferring the worst-case buffers.
    """
    g, cap_full = flats32.shape
    words32 = (totals + 1) // 2
    starts = jnp.cumsum(words32) - words32
    p = jnp.arange(cap32, dtype=jnp.int32)
    ends = (starts + words32).astype(jnp.int32)
    # group of each output position: #{ends <= p} (a (cap32, G) compare-sum
    # beats searchsorted's sequential binary search on TPU)
    gidx = jnp.sum(
        p[:, None] >= ends[None, :], axis=1, dtype=jnp.int32
    )
    gidx = jnp.minimum(gidx, g - 1)
    src = gidx * cap_full + (p - starts[gidx])
    compact = jnp.take(
        flats32.reshape(-1), jnp.clip(src, 0, flats32.size - 1)
    )
    return compact


def _encode_batch_compact_impl(tiles, profile: int, cap32: int):
    """Whole-batch lossless encode with compacted payload transfer.

    Returns one int32 buffer:
      [ totals (B*n_groups) | bias (B*3072) | hist_n (B*3072) |
        profile 2 only: w_q (B*T*N_FEAT) | flags (B*T) |
        compact payload (cap32) ]
    """
    if profile == 2:
        y, qd, bias, w_q, flags = jax.vmap(_model_lossless2_impl)(tiles)
    else:
        y, qd, bias, _ = jax.vmap(_model_lossless_impl)(tiles)
    totals, bias_o, hist_n, flats32 = _finish_encode_batch(y, qd, bias)
    b, n_groups, cap_full = flats32.shape
    compact = _compact_payloads(
        flats32.reshape(b * n_groups, cap_full),
        totals.reshape(-1),
        cap32,
    )
    parts = [totals.reshape(-1), bias_o.reshape(-1), hist_n.reshape(-1)]
    if profile == 2:
        parts += [w_q.reshape(-1), flags.reshape(-1)]
    parts.append(compact)
    return jnp.concatenate(parts)


_encode_compact_jit = jax.jit(
    _encode_batch_compact_impl, static_argnums=(1, 2)
)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _encode_compact_imgs_jit(imgs, profile: int, cap32: int, th: int,
                             tw: int):
    """Compact batch encode from whole images, tiling on device.

    Saves the host-side tile shuffle (and one host copy) when the image
    divides the tile grid evenly; callers fall back to host ``to_tiles``
    otherwise.
    """
    b, h, w = imgs.shape
    t = imgs.reshape(b, h // th, th, w // tw, tw)
    tiles = jnp.transpose(t, (0, 1, 3, 2, 4)).reshape(b, -1, th, tw)
    return _encode_batch_compact_impl(tiles, profile, cap32)


def _rans_fold_impl(y, qd, hist_n, acc):
    """Parallel (freq, acc) gather + lockstep rANS fold + device-side packing.

    Returns (flat uint16 packed streams, per-tile word lengths); only the
    compressed prefix of ``flat`` is ever fetched to the host.
    """
    t = y.shape[0]
    ys = y.reshape(t, -1)
    qs = qd.reshape(t, -1)
    freq = hist_n[qs, ys]
    facc = acc[qs, ys]
    words, emits, state = rans.encode_scan(freq, facc)
    return rans.pack_streams(words, emits, state)


_rans_fold = jax.jit(_rans_fold_impl)
_rans_fold_batch = jax.jit(jax.vmap(_rans_fold_impl))


# ---------------------------------------------------------------------------
# fused per-tile scan (decode; also near-lossless encode)
# ---------------------------------------------------------------------------


def _tile_decode_scan(words, bias, hist_n, acc, lut_flat, th: int, tw: int, near: int):
    """Decode one tile stream; lanes are added by vmap. Returns (th, tw) int32."""
    state0, ptr0 = rans.dec_start(words)

    def row_body(carry, i):
        prev1, prev2, state, ptr = carry
        regs = row_start_window(i, prev1, prev2, tw)

        def col_body(ccarry, j):
            regs, err, row, state, ptr = ccarry
            px0, qd, adr = pixel_model(regs, err)
            px, sign = ctx_ops.apply_static_bias(bias, adr, px0)
            lb = state & rans.NORM_MASK
            y = lut_flat[qd * NORM_SUM + lb.astype(jnp.int32)]
            state, ptr = rans.dec_step(
                state, ptr, words, hist_n[qd, y], acc[qd, y], lb
            )
            x = ctx_ops.residual_unfold(y, px, sign, near)
            err = x - px0
            row = row.at[j].set(x)
            regs = slide_window(regs, x, i, j, prev1, prev2, tw)
            return (regs, err, row, state, ptr), None

        row0 = jnp.zeros((tw,), jnp.int32)
        (regs, _, row, state, ptr), _ = jax.lax.scan(
            col_body,
            (regs, jnp.int32(0), row0, state, ptr),
            jnp.arange(tw, dtype=jnp.int32),
        )
        return (row, prev1, state, ptr), row

    init = (
        jnp.zeros((tw,), jnp.int32),
        jnp.zeros((tw,), jnp.int32),
        state0,
        ptr0,
    )
    _, rows = jax.lax.scan(row_body, init, jnp.arange(th, dtype=jnp.int32))
    return rows


def _tile_encode_scan(tile, bias, wvec, th: int, tw: int, near: int,
                      profile: int = 1, stats: bool = False):
    """Near-lossless modeling scan for one tile: reconstruction feedback.

    Returns (y, qd) planes; window slides on *reconstructed* pixels so the
    decoder replays the identical chain (NBLIC's in-place feedback analog,
    NBLIC.c:876,915-916).  ``wvec`` (16,): per-tile learned-predictor
    weights + flag (profile 2; ignored at profile 1).

    ``stats=True`` additionally returns the (adr, x_orig - px0, x_rec)
    planes the scan observed, so the encoder can rebuild the transmitted
    bias table from the *feedback* error distribution (which near>0
    quantization shifts away from the lossless proxy), refit the learned
    predictor on the reconstructed windows, and run the scan again.
    """
    from ..ops import lsq
    from ..ops.neighbors import Neighbors
    from ..ops.predict import (
        activity, context_address, quantize_activity, simple_predict,
    )

    def model_px(regs, err):
        nb = Neighbors(*regs)
        px0 = simple_predict(nb)
        if profile == 2:
            acc_w = wvec[lsq.N_FEAT - 1]
            for k, tap in enumerate(regs):
                acc_w = acc_w + wvec[k] * (tap - 128)
            px_l = jnp.clip(
                128 + ((acc_w + (1 << (lsq.W_FRAC_BITS - 1)))
                       >> lsq.W_FRAC_BITS),
                0, 255,
            )
            flag = wvec[lsq.N_FEAT]
            px_a = (px0 + px_l + 1) >> 1
            px0 = jnp.where(
                flag == 1, px_l, jnp.where(flag == 2, px_a, px0)
            )
        qd = quantize_activity(activity(nb, err))
        adr = context_address(nb, px0, qd)
        return px0, qd, adr

    def row_body(carry, i):
        prev1, prev2 = carry
        regs = row_start_window(i, prev1, prev2, tw)

        def col_body(ccarry, j):
            regs, err, rec_row = ccarry
            px0, qd, adr = model_px(regs, err)
            px, sign = ctx_ops.apply_static_bias(bias, adr, px0)
            x_orig = tile[i, j]
            y = ctx_ops.residual_fold(x_orig, px, sign, near)
            x_rec = ctx_ops.residual_unfold(y, px, sign, near)
            err = x_rec - px0
            rec_row = rec_row.at[j].set(x_rec)
            regs = slide_window(regs, x_rec, i, j, prev1, prev2, tw)
            out = (y, qd, adr, x_orig - px0, x_rec) if stats else (y, qd)
            return (regs, err, rec_row), out

        row0 = jnp.zeros((tw,), jnp.int32)
        (_, _, rec_row), outs = jax.lax.scan(
            col_body,
            (regs, jnp.int32(0), row0),
            jnp.arange(tw, dtype=jnp.int32),
        )
        return (rec_row, prev1), outs

    init = (jnp.zeros((tw,), jnp.int32), jnp.zeros((tw,), jnp.int32))
    _, outs = jax.lax.scan(row_body, init, jnp.arange(th, dtype=jnp.int32))
    return outs


def _group_decode_scan(stream, n_active, bias, hist_n, acc, lut_flat,
                       wcols, th: int, tw: int, near: int, g: int,
                       profile: int):
    """Lockstep decode of one interleaved group (profiles 1/2): all ``g``
    lanes march in raster lockstep, renormalizing against ONE shared stream
    cursor (ops/rans.py interleave layout).  Profile 2 adds per-tile
    least-squares predictors (``wcols`` (16, g): 12 weight rows + flag row).
    Returns (g, th, tw) int32 tiles."""
    from ..ops import lsq
    from ..ops.neighbors import Neighbors
    from ..ops.predict import (
        activity, context_address, quantize_activity, simple_predict,
    )

    state, sp = rans.interleaved_dec_init(stream, g)
    active = jnp.arange(g, dtype=jnp.int32) < n_active
    hist_u = hist_n.astype(jnp.uint32)
    acc_u = acc.astype(jnp.uint32)

    def model_pixel(regs, err):
        nb = Neighbors(*regs)
        px0 = simple_predict(nb)
        if profile == 2:
            px_l = lsq.predict_lanes(regs, wcols)[0]
            flagv = wcols[lsq.N_FEAT]
            px_a = (px0 + px_l + 1) >> 1
            px0 = jnp.where(
                flagv == 1, px_l, jnp.where(flagv == 2, px_a, px0)
            )
        qd = quantize_activity(activity(nb, err))
        adr = context_address(nb, px0, qd)
        return px0, qd, adr

    def row_body(carry, i):
        prev1, prev2, state, sp = carry  # rows: (g, tw)
        regs = row_start_window(i, prev1, prev2, tw)

        def col_body(c, j):
            regs, err, row, state, sp = c
            px0, qd, adr = model_pixel(regs, err)
            px, sign = ctx_ops.apply_static_bias(bias, adr, px0)
            lb = (state & rans.NORM_MASK).astype(jnp.int32)
            y = lut_flat[qd * NORM_SUM + lb]
            state = (state >> rans.NORM_BITS) * hist_u[qd, y] + lb.astype(
                jnp.uint32
            ) - acc_u[qd, y]
            state, sp = rans.interleaved_dec_renorm(state, sp, stream, active)
            x = ctx_ops.residual_unfold(y, px, sign, near)
            err = x - px0
            row = row.at[:, j].set(x)
            regs = slide_window(regs, x, i, j, prev1, prev2, tw)
            return (regs, err, row, state, sp), None

        row0 = jnp.zeros((g, tw), jnp.int32)
        err0 = jnp.zeros((g,), jnp.int32)
        (_, _, row, state, sp), _ = jax.lax.scan(
            col_body,
            (regs, err0, row0, state, sp),
            jnp.arange(tw, dtype=jnp.int32),
        )
        return (row, prev1, state, sp), row

    init = (
        jnp.zeros((g, tw), jnp.int32),
        jnp.zeros((g, tw), jnp.int32),
        state,
        sp,
    )
    _, rows = jax.lax.scan(row_body, init, jnp.arange(th, dtype=jnp.int32))
    return jnp.transpose(rows, (1, 0, 2))  # (th, g, tw) -> (g, th, tw)


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11))
def _decode_groups(streams, n_active, bias, hist_n, acc, lut_flat, wcols,
                   th: int, tw: int, near: int, g: int, profile: int):
    fn = functools.partial(
        _group_decode_scan, th=th, tw=tw, near=near, g=g, profile=profile
    )
    return jax.vmap(fn, in_axes=(0, 0, None, None, None, None, 0))(
        streams, n_active, bias, hist_n, acc, lut_flat, wcols
    )


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11))
def _decode_groups_batch(streams, n_active, bias, hist_n, acc, lut_flat,
                         wcols, th: int, tw: int, near: int, g: int,
                         profile: int):
    """Batched over images: streams (B, n_groups, W), per-image tables."""
    fn = functools.partial(
        _group_decode_scan, th=th, tw=tw, near=near, g=g, profile=profile
    )
    per_image = jax.vmap(fn, in_axes=(0, 0, None, None, None, None, 0))
    return jax.vmap(per_image)(
        streams, n_active, bias, hist_n, acc, lut_flat, wcols
    )


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _decode_tiles(streams, bias, hist_n, acc, lut_flat, th: int, tw: int, near: int):
    fn = functools.partial(
        _tile_decode_scan, th=th, tw=tw, near=near
    )
    return jax.vmap(fn, in_axes=(0, None, None, None, None))(
        streams, bias, hist_n, acc, lut_flat
    )


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _decode_tiles_batch(streams, bias, hist_n, acc, lut_flat, th, tw, near):
    """Batched over images: streams (B,T,W), per-image tables."""
    fn = functools.partial(_tile_decode_scan, th=th, tw=tw, near=near)
    per_image = jax.vmap(fn, in_axes=(0, None, None, None, None))
    return jax.vmap(per_image)(streams, bias, hist_n, acc, lut_flat)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _model_near(tiles, bias, wcols, th: int, tw: int, near: int,
                profile: int = 1):
    x = tiles.astype(jnp.int32)
    fn = functools.partial(
        _tile_encode_scan, th=th, tw=tw, near=near, profile=profile
    )
    y, qd = jax.vmap(fn, in_axes=(0, None, 0))(x, bias, wcols)
    hist = ctx_ops.pair_segment_sum(
        qd.reshape(-1) * N_SYM + y.reshape(-1), None, N_QD * N_SYM
    ).reshape(N_QD, N_SYM)
    return y, qd, hist


# ---------------------------------------------------------------------------
# public encode / decode
# ---------------------------------------------------------------------------


def _normalize_tables(hist_counts: np.ndarray):
    hist_n = np.stack([hist_ops.normalize(h) for h in hist_counts])
    acc = np.stack([hist_ops.accumulate(h) for h in hist_n])
    return hist_n.astype(np.int32), acc.astype(np.int32)


def _serialize_hists(hist_n: np.ndarray) -> bytes:
    words: list[int] = []
    for h in hist_n:
        words.extend(hist_ops.serialize(h))
    return np.asarray(words, dtype=np.uint16).tobytes()


def _deserialize_hists(data: bytes):
    words = np.frombuffer(data, dtype=np.uint16)
    hists, pos = [], 0
    for _ in range(N_QD):
        h, pos = hist_ops.deserialize(words, pos)
        hists.append(h)
    return np.stack(hists)


def encode(
    img: np.ndarray,
    near: int = 0,
    tile_h: int = DEFAULT_TILE[0],
    tile_w: int = DEFAULT_TILE[1],
    effort: int = 1,
) -> bytes:
    """Encode a gray-8 image into an NBTC container (device-parallel).

    ``effort`` 2 selects profile 2 (per-tile MXU least-squares predictors
    raced against the blend predictor); ``effort`` >= 3 selects profile 3
    (the adaptive-coding strip engine, models/strips.py — best ratio).
    """
    if near == 0:
        return encode_batch(
            [img], near=0, tile_h=tile_h, tile_w=tile_w, effort=effort
        )[0]

    if effort >= 3:
        # profile 3 codes near-lossless with its adaptive stack + per-pixel
        # feedback scan (models/strips.py), like the reference's near mode
        from . import strips

        return strips.encode(img, near=near)

    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    check_size(h, w)
    tiles = jnp.asarray(to_tiles(img, tile_h, tile_w))
    profile = 2 if effort >= 2 else 1

    if profile == 1:
        # encoder-side bias estimate from the lossless stage, refined from
        # the feedback scan's own errors (any transmitted table is
        # decodable; the scan replays whatever we send)
        _, _, bias, _ = _model_lossless(tiles)
        wcols = jnp.zeros((tiles.shape[0], 16), jnp.int32)
        bias = _refine_near_jit(
            tiles.astype(jnp.int32), bias, wcols, tile_h, tile_w, near, 1,
            NEAR_BIAS_ITERS,
        )
        y, qd, _ = _model_near(tiles, bias, wcols, tile_h, tile_w, near, 1)
        packed = np.asarray(_finish_encode_jit(y, qd, bias))[None]
    else:
        packed = np.asarray(
            _encode_near2_jit(tiles, tile_h, tile_w, near, NEAR_BIAS_ITERS)
        )[None]
    return _unpack_containers(
        packed, 1, tiles.shape[0], h, w, tile_h, tile_w, near, profile
    )[0]


def _unpack_containers(packed, n_imgs, n_tiles, h, w, tile_h, tile_w, near,
                       profile: int = 1, g_lanes: int = G_LANES,
                       t_packed: int | None = None,
                       transposed=None):
    """Split the fetched device buffer(s) into NBTC containers.

    ``g_lanes``/``t_packed`` override the interleave-group geometry for the
    SPMD mesh encoder (one group per tile shard).  ``transposed`` is an
    optional per-image bool sequence: images stored transposed get header
    flag bit 0 and are transposed back by the decoder (orientation merging
    lets both Kodak orientations share one device program)."""
    l = tile_h * tile_w
    n_groups = -(-(t_packed or n_tiles) // g_lanes)
    cap32 = g_lanes * (l + 2) // 2
    out = []
    for b in range(n_imgs):
        pos = 0
        totals = packed[b, pos : pos + n_groups].astype(np.uint32)
        pos += n_groups
        bias_i16 = packed[b, pos : pos + Q_N_CONTEXT].astype(np.int16)
        pos += Q_N_CONTEXT
        hist_n = (
            packed[b, pos : pos + N_QD * N_SYM]
            .astype(np.uint32)
            .reshape(N_QD, N_SYM)
        )
        pos += N_QD * N_SYM
        chunks = []
        for g in range(n_groups):
            total = int(totals[g])
            span = packed[b, pos : pos + (total + 1) // 2].astype(np.uint32)
            chunks.append(span.view(np.uint16)[:total].tobytes())
            pos += cap32
        payload = b"".join(chunks)

        weights_bytes = b""
        if profile == 2:
            from ..ops import lsq as lsq_ops

            w_q = packed[b, pos : pos + n_tiles * lsq_ops.N_FEAT].astype(
                np.int16
            ).reshape(n_tiles, lsq_ops.N_FEAT)
            pos += n_tiles * lsq_ops.N_FEAT
            flags = packed[b, pos : pos + n_tiles].astype(np.uint8)
            pos += n_tiles
            weights_bytes = _serialize_weights(w_q, flags)

        out.append(_emit_container(
            profile, near, h, w, tile_h, tile_w, n_tiles, g_lanes,
            totals, bias_i16, hist_n, payload, weights_bytes,
            bool(transposed[b]) if transposed is not None else False,
        ))
    return out


def _serialize_weights(w_q, flags) -> bytes:
    """Profile-2 weight block: flags + weights of learned tiles, zlib'd."""
    raw = zlib.compress(flags.tobytes() + w_q[flags > 0].tobytes(), 6)
    return (
        np.asarray([len(raw)], np.uint32).tobytes()
        + raw
        + b"\x00" * (len(raw) & 1)
    )


def _emit_container(profile, near, h, w, tile_h, tile_w, n_tiles, g_lanes,
                    totals, bias_i16, hist_n, payload, weights_bytes,
                    transposed_flag) -> bytes:
    """Serialize one NBTC container from its parsed device outputs."""
    n_groups = len(totals)
    bias_bytes = zlib.compress(bias_i16.tobytes(), 6)
    bias_bytes += b"\x00" * (len(bias_bytes) & 1)  # keep u16 aligned
    hist_bytes = _serialize_hists(hist_n)
    meta = np.asarray(
        [g_lanes, n_groups] + [2 * int(t) for t in totals], dtype=np.uint32
    ).tobytes()
    header = NbtcHeader(
        profile=profile,
        near=near,
        height=h,
        width=w,
        tile_h=tile_h,
        tile_w=tile_w,
        n_tiles=n_tiles,
        bias_len=len(bias_bytes),
        hist_len=len(hist_bytes),
        flags=int(transposed_flag),
    )
    return (
        header.to_bytes() + bias_bytes + weights_bytes + hist_bytes
        + meta + payload
    )


def _unpack_containers_compact(packed, n_imgs, n_tiles, h, w, tile_h, tile_w,
                               near, profile, cap32, transposed=None):
    """Split a compact batch buffer into containers; None if it overflowed.

    Layout must mirror ``_encode_batch_compact_impl``.  The exact per-group
    totals always arrive (they precede the payload region), so overflow —
    the batch compressing past the COMPACT_BPP budget — is detected
    reliably and the caller re-fetches via the worst-case-capacity path.
    """
    l = tile_h * tile_w
    n_groups = -(-n_tiles // G_LANES)
    g_total = n_imgs * n_groups
    pos = 0
    totals = packed[pos : pos + g_total].astype(np.uint32).reshape(
        n_imgs, n_groups
    )
    pos += g_total
    words32 = (totals.reshape(-1).astype(np.int64) + 1) // 2
    if int(words32.sum()) > cap32:
        return None
    starts = np.cumsum(words32) - words32
    biases = packed[pos : pos + n_imgs * Q_N_CONTEXT].reshape(
        n_imgs, Q_N_CONTEXT
    )
    pos += n_imgs * Q_N_CONTEXT
    hists = packed[pos : pos + n_imgs * N_QD * N_SYM].reshape(
        n_imgs, N_QD, N_SYM
    )
    pos += n_imgs * N_QD * N_SYM
    w_qs = flag_arrs = None
    if profile == 2:
        from ..ops import lsq as lsq_ops

        w_qs = packed[pos : pos + n_imgs * n_tiles * lsq_ops.N_FEAT].astype(
            np.int16
        ).reshape(n_imgs, n_tiles, lsq_ops.N_FEAT)
        pos += n_imgs * n_tiles * lsq_ops.N_FEAT
        flag_arrs = packed[pos : pos + n_imgs * n_tiles].astype(
            np.uint8
        ).reshape(n_imgs, n_tiles)
        pos += n_imgs * n_tiles
    compact = packed[pos : pos + cap32]
    out = []
    for b in range(n_imgs):
        chunks = []
        for g in range(n_groups):
            gi = b * n_groups + g
            total = int(totals[b, g])
            span = compact[starts[gi] : starts[gi] + words32[gi]].astype(
                np.uint32
            )
            chunks.append(span.view(np.uint16)[:total].tobytes())
        weights_bytes = b""
        if profile == 2:
            weights_bytes = _serialize_weights(w_qs[b], flag_arrs[b])
        out.append(_emit_container(
            profile, near, h, w, tile_h, tile_w, n_tiles, G_LANES,
            totals[b], biases[b].astype(np.int16), hists[b].astype(np.uint32),
            b"".join(chunks), weights_bytes,
            bool(transposed[b]) if transposed is not None else False,
        ))
    return out


def encode_batch(
    imgs,
    near: int = 0,
    tile_h: int = DEFAULT_TILE[0],
    tile_w: int = DEFAULT_TILE[1],
    effort: int = 1,
    transposed=None,
) -> list[bytes]:
    """Encode a batch of same-shape images in one device program.

    This is the production/serving path: all images' tiles ride the same
    lockstep scans, so device fixed costs amortize across the batch.  At
    effort>=3 every mode (including near>0) batches via the profile-3
    strips engine; at efforts 1-2 only lossless (near=0) is batched and
    near>0 falls back to per-image encode.
    """
    if effort >= 3:
        from . import strips

        return strips.encode_batch(imgs, near=near)
    if near != 0:
        return [
            encode(im, near=near, tile_h=tile_h, tile_w=tile_w,
                   effort=min(effort, 2))
            for im in imgs
        ]
    profile = 2 if effort >= 2 else 1
    imgs = [np.ascontiguousarray(im, dtype=np.uint8) for im in imgs]
    h, w = imgs[0].shape
    for im in imgs:
        if im.shape != (h, w):
            raise ValueError("encode_batch requires same-shape images")
    check_size(h, w)
    gh, gw = _tile_grid(h, w, tile_h, tile_w)
    n_tiles = gh * gw

    # ONE device program + ONE compacted fetch for the whole batch (the
    # host link is the scarce resource under the TPU tunnel)
    cap32 = _compact_cap32(len(imgs), n_tiles, tile_h * tile_w)
    packed_dev = _dispatch_compact(imgs, h, w, tile_h, tile_w, profile, cap32)
    return _fetch_compact(
        packed_dev, imgs, cap32, len(imgs), n_tiles, h, w, tile_h, tile_w,
        profile, transposed,
    )


def _dispatch_compact(imgs, h, w, tile_h, tile_w, profile, cap32):
    """Launch the compact batch encode; tiles on device when aligned."""
    if h % tile_h == 0 and w % tile_w == 0:
        return _encode_compact_imgs_jit(
            jnp.asarray(np.stack(imgs)), profile, cap32, tile_h, tile_w
        )
    tiles = jnp.asarray(
        np.stack([to_tiles(im, tile_h, tile_w) for im in imgs])
    )
    return _encode_compact_jit(tiles, profile, cap32)


def _fetch_compact(packed_dev, imgs, cap32, n_imgs, n_tiles, h, w,
                   tile_h, tile_w, profile, transposed):
    """Fetch a compact encode; fall back to worst-case capacity on overflow."""
    packed = np.asarray(packed_dev)
    res = _unpack_containers_compact(
        packed, n_imgs, n_tiles, h, w, tile_h, tile_w, 0, profile, cap32,
        transposed=transposed,
    )
    if res is None:
        tiles = jnp.asarray(
            np.stack([to_tiles(im, tile_h, tile_w) for im in imgs])
        )
        fn = _encode_device2_batch if profile == 2 else _encode_device_batch
        packed = np.asarray(fn(tiles))
        res = _unpack_containers(
            packed, n_imgs, n_tiles, h, w, tile_h, tile_w, 0, profile,
            transposed=transposed,
        )
    return res


def encode_batches(image_groups, near: int = 0,
                   tile_h: int = DEFAULT_TILE[0],
                   tile_w: int = DEFAULT_TILE[1],
                   effort: int = 1,
                   transposed_groups=None) -> list[list[bytes]]:
    """Encode several same-shape batches, pipelining the device programs.

    Dispatch is asynchronous under the tunnel; issuing every group's program
    before the first fetch overlaps their ~250 ms launch/transfer costs.
    """
    if near != 0:
        return [
            encode_batch(g, near=near, tile_h=tile_h, tile_w=tile_w,
                         effort=effort)
            for g in image_groups
        ]
    profile = 2 if effort >= 2 else 1
    dispatched = []
    for gi, imgs in enumerate(image_groups):
        imgs = [np.ascontiguousarray(im, dtype=np.uint8) for im in imgs]
        h, w = imgs[0].shape
        check_size(h, w)
        gh, gw = _tile_grid(h, w, tile_h, tile_w)
        n_tiles = gh * gw
        cap32 = _compact_cap32(len(imgs), n_tiles, tile_h * tile_w)
        dispatched.append(
            (imgs, h, w, n_tiles, cap32,
             _dispatch_compact(imgs, h, w, tile_h, tile_w, profile, cap32))
        )
    out = []
    for gi, (imgs, h, w, n_tiles, cap32, packed_dev) in enumerate(dispatched):
        out.append(_fetch_compact(
            packed_dev, imgs, cap32, len(imgs), n_tiles, h, w,
            tile_h, tile_w, profile,
            transposed_groups[gi] if transposed_groups else None,
        ))
    return out


def encode_corpus(imgs, near: int = 0,
                  tile_h: int = DEFAULT_TILE[0],
                  tile_w: int = DEFAULT_TILE[1],
                  effort: int = 1) -> list[bytes]:
    """Encode arbitrary-shape images with orientation normalization.

    Portrait images are transposed to landscape (header flag bit 0) so both
    orientations of a corpus share one device-program shape — on Kodak this
    halves the program count vs per-orientation batches.  Containers come
    back in input order; ``decode``/``decode_batch`` undo the transpose.
    """
    if effort >= 3:
        from . import strips

        return strips.encode_batch(imgs, near=near)  # normalizes internally
    if near != 0:
        # near>0 encodes per image; orientation merging buys nothing there
        return [
            encode(im, near=near, tile_h=tile_h, tile_w=tile_w, effort=effort)
            for im in imgs
        ]
    norm, flags = [], []
    for im in imgs:
        im = np.ascontiguousarray(im, dtype=np.uint8)
        t = im.shape[0] > im.shape[1]
        norm.append(np.ascontiguousarray(im.T) if t else im)
        flags.append(t)
    order: dict[tuple, list[int]] = {}
    for i, im in enumerate(norm):
        order.setdefault(im.shape, []).append(i)
    idx_groups = list(order.values())
    streams_by_group = encode_batches(
        [[norm[i] for i in g] for g in idx_groups],
        near=near, tile_h=tile_h, tile_w=tile_w, effort=effort,
        transposed_groups=[[flags[i] for i in g] for g in idx_groups],
    )
    out: list[bytes] = [b""] * len(imgs)
    for g, streams in zip(idx_groups, streams_by_group):
        for i, s in zip(g, streams):
            out[i] = s
    return out


def decode_batch(streams: list[bytes]) -> list[np.ndarray]:
    """Decode a batch of same-geometry NBTC containers in one device program."""
    work = _decode_batch_dispatch(streams)
    return _decode_batch_finalize(work)


def decode_batches(stream_groups) -> list[list[np.ndarray]]:
    """Decode several batches, pipelining the device programs.

    Mirror of ``encode_batches``: every group's decode program is dispatched
    before the first pixel fetch, overlapping the tunnel's per-program
    launch/transfer latency across groups.
    """
    work = [_decode_batch_dispatch(g) for g in stream_groups]
    return [_decode_batch_finalize(w) for w in work]


def _decode_batch_dispatch(streams: list[bytes]):
    """Parse containers and launch the device decode; no fetch.

    Returns an opaque work item for ``_decode_batch_finalize``.  Mixed
    geometries and profile 3 fall back to eager paths (result is carried
    as a finished list).
    """
    if not streams:
        return ("done", [])
    if NbtcHeader.from_bytes(streams[0]).profile == 3:
        from . import strips

        return ("done", strips.decode_batch(streams))
    parsed = [_Parsed(s) for s in streams]
    h0 = parsed[0].hdr
    if any(
        (p.hdr.height, p.hdr.width, p.hdr.tile_h, p.hdr.tile_w, p.hdr.near,
         p.hdr.profile)
        != (h0.height, h0.width, h0.tile_h, h0.tile_w, h0.near, h0.profile)
        for p in parsed
    ):
        return ("done", [decode(s) for s in streams])

    b = len(streams)
    wmax = _bucket(max(int(p.counts.max()) for p in parsed))
    biases = jnp.asarray(np.stack([p.bias for p in parsed]))
    hist_ns = jnp.asarray(np.stack([p.hist_n for p in parsed]))
    accs = jnp.asarray(np.stack([p.acc for p in parsed]))

    if h0.profile == 0:
        stream_mat = np.stack([p.stream_matrix(wmax) for p in parsed])
        luts = jnp.asarray(np.stack([p.lut.reshape(-1) for p in parsed]))
        tiles = _decode_tiles_batch(
            jnp.asarray(stream_mat), biases, hist_ns, accs, luts,
            h0.tile_h, h0.tile_w, h0.near,
        )
        return ("dev", parsed, h0, b, tiles, False, False)
    elif _use_pallas():
        wmax32 = (wmax + 1) // 2
        gsz = parsed[0].group_size
        # ONE combined upload + ONE device program + ONE fetch: every
        # extra host<->device interaction costs a tunnel round trip
        buf = np.concatenate(
            [np.concatenate([p.n_active() for p in parsed]).astype(np.int32)]
            + [np.stack([p.bias for p in parsed]).reshape(-1)]
            + [np.stack([p.hist_n for p in parsed]).reshape(-1)]
            + [np.stack([p.acc for p in parsed]).reshape(-1)]
            + [np.concatenate(
                [p.weight_cols() for p in parsed]
            ).reshape(-1)]
            + [np.concatenate(
                [p.stream_matrix32(wmax32) for p in parsed]
            ).reshape(-1)]
        )
        tiles = _pallas_decode_packed(
            jnp.asarray(buf), b, wmax32, h0.tile_h, h0.tile_w, h0.near,
            gsz, h0.n_tiles, h0.profile,
        )
        return ("dev", parsed, h0, b, tiles, True, h0.tile_w % 4 == 0)
    else:
        stream_mat = np.stack([p.stream_matrix(wmax) for p in parsed])
        luts = jnp.asarray(np.stack([p.lut.reshape(-1) for p in parsed]))
        n_active = jnp.asarray(np.stack([p.n_active() for p in parsed]))
        wcols = jnp.asarray(np.stack([p.weight_cols() for p in parsed]))
        tiles = _decode_groups_batch(
            jnp.asarray(stream_mat), n_active, biases, hist_ns, accs, luts,
            wcols, h0.tile_h, h0.tile_w, h0.near, parsed[0].group_size,
            h0.profile,
        )
        return ("dev", parsed, h0, b, tiles, True, False)


@functools.partial(jax.jit, static_argnums=(1,))
def _trim_lanes(tiles, n_keep: int):
    """Drop interleave-group pad lanes before the host fetch."""
    return tiles[:, :n_keep]


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7, 8))
def _pallas_decode_packed(buf, b: int, wmax32: int, th: int, tw: int,
                          near: int, gsz: int, n_tiles: int, profile: int):
    """Unpack the combined decode input buffer and run the Mosaic kernel.

    Layout (int32, mirrors ``_decode_batch_dispatch``):
      [ n_active (G) | bias (B*3072) | hist_n (B*3072) | acc (B*3072) |
        wcols (G*16*gsz) | streams (G*wmax32 u16 pairs) ]
    Pad lanes are trimmed on device when each image is a single group.
    """
    from ..ops import pallas_decode

    n_groups = b * (-(-n_tiles // gsz))
    pos = 0

    def take(n, shape):
        nonlocal pos
        out = jax.lax.dynamic_slice_in_dim(buf, pos, n).reshape(shape)
        pos += n
        return out

    n_active = take(n_groups, (n_groups,))
    bias = take(b * Q_N_CONTEXT, (b, Q_N_CONTEXT))
    hist_n = take(b * N_QD * N_SYM, (b, N_QD, N_SYM))
    acc = take(b * N_QD * N_SYM, (b, N_QD, N_SYM))
    wcols = take(n_groups * 16 * gsz, (n_groups, 16, gsz))
    streams = take(n_groups * wmax32, (n_groups, wmax32))
    tiles = pallas_decode.decode_groups_pallas(
        streams, n_active, bias, hist_n, acc, wcols,
        th, tw, near, gsz, profile,
    )
    if n_tiles < gsz:
        tiles = tiles[:, :n_tiles]
    if tw % 4 == 0:
        # pack 4 px/int32: the tunnel moves uint8 arrays at half the
        # int32 rate (measured), and pixels are the decode's biggest
        # transfer.  Host side: .view(np.uint8) (little-endian match).
        t = tiles.astype(jnp.int32)
        tiles = (t[..., 0::4] | (t[..., 1::4] << 8)
                 | (t[..., 2::4] << 16) | (t[..., 3::4] << 24))
    return tiles


def _decode_batch_finalize(work) -> list[np.ndarray]:
    """Fetch a dispatched decode and assemble host images."""
    kind, *rest = work
    if kind == "done":
        return rest[0]
    parsed, h0, b, tiles, regroup, packed4 = rest
    if packed4:
        # 4-px/int32 packed fetch (_pallas_decode_packed): LE bytes are
        # the pixels in order along the tile-width axis
        raw = np.ascontiguousarray(np.asarray(tiles))
        tiles_np = raw.view(np.uint8).reshape(raw.shape[:-1] + (-1,))
    else:
        tiles_np = np.asarray(tiles, dtype=np.uint8)
    if regroup:
        tiles_np = tiles_np.reshape(b, -1, h0.tile_h, h0.tile_w)[
            :, : h0.n_tiles
        ]
    out = []
    for bi in range(b):
        img = from_tiles(
            tiles_np[bi], h0.height, h0.width, h0.tile_h, h0.tile_w
        )
        if parsed[bi].hdr.transposed:
            img = np.ascontiguousarray(img.T)
        out.append(img)
    return out


def _use_pallas() -> bool:
    """Use the Mosaic decode kernel when a real TPU is the default backend."""
    import os

    if os.environ.get("NBLIC_TPU_NO_PALLAS"):
        return False
    dd = jax.config.jax_default_device
    if dd is not None:  # tests pin the default device to CPU
        return getattr(dd, "platform", None) == "tpu"
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


class _Parsed:
    """Host-side view of one NBTC container."""

    def __init__(self, stream: bytes):
        self.hdr = hdr = NbtcHeader.from_bytes(stream)
        check_size(hdr.height, hdr.width)
        pos = NbtcHeader.SIZE
        self.bias = np.frombuffer(
            zlib.decompress(stream[pos : pos + hdr.bias_len]), dtype=np.int16
        ).astype(np.int32)
        pos += hdr.bias_len
        self.weights = None
        self.flags = None
        if hdr.profile == 2:
            from ..ops import lsq as lsq_ops

            (wlen,) = np.frombuffer(stream[pos : pos + 4], dtype=np.uint32)
            pos += 4
            raw = zlib.decompress(stream[pos : pos + int(wlen)])
            pos += int(wlen) + (int(wlen) & 1)
            t = hdr.n_tiles
            self.flags = np.frombuffer(raw[:t], dtype=np.uint8)
            dense = np.frombuffer(raw[t:], dtype=np.int16).reshape(
                -1, lsq_ops.N_FEAT
            )
            self.weights = np.zeros((t, lsq_ops.N_FEAT), dtype=np.int16)
            self.weights[self.flags > 0] = dense
        self.hist_n = _deserialize_hists(
            stream[pos : pos + hdr.hist_len]
        ).astype(np.int32)
        pos += hdr.hist_len
        self.acc = np.stack(
            [hist_ops.accumulate(h.astype(np.uint32)) for h in self.hist_n]
        ).astype(np.int32)
        self._lut = None  # 12x32768 decode LUT: built lazily (the Pallas
        # kernel searches acc directly and never needs it)

        if hdr.profile == 0:
            lengths = np.frombuffer(
                stream[pos : pos + 4 * hdr.n_tiles], dtype=np.uint32
            )
            pos += 4 * hdr.n_tiles
            self.counts = (lengths // 2).astype(np.int64)
        elif hdr.profile in (1, 2):
            g, n_groups = np.frombuffer(stream[pos : pos + 8], dtype=np.uint32)
            pos += 8
            self.group_size = int(g)
            lengths = np.frombuffer(
                stream[pos : pos + 4 * int(n_groups)], dtype=np.uint32
            )
            pos += 4 * int(n_groups)
            self.counts = (lengths // 2).astype(np.int64)
        else:
            raise ValueError(f"unknown NBTC profile {hdr.profile}")
        self.payload = np.frombuffer(stream, dtype=np.uint16, offset=pos)

    @property
    def lut(self) -> np.ndarray:
        if self._lut is None:
            self._lut = np.stack(
                [hist_ops.decode_lut(a.astype(np.uint32)) for a in self.acc]
            ).astype(np.int32)
        return self._lut

    def stream_matrix(self, wmax: int) -> np.ndarray:
        return rans.pad_streams(self.payload, self.counts, wmax)

    def stream_matrix32(self, wmax32: int) -> np.ndarray:
        """Pair-packed stream matrix: 2 u16 words per int32 (half the
        upload bytes of ``stream_matrix``; the Pallas kernel's format)."""
        m = rans.pad_streams(self.payload, self.counts, 2 * wmax32)
        return (m[:, 0::2] | (m[:, 1::2] << 16)).astype(np.int32)

    def weight_cols(self) -> np.ndarray:
        """Per-group (16, G) weight/flag columns for the lockstep decoders."""
        from ..ops import lsq as lsq_ops

        g = self.group_size
        n_groups = len(self.counts)
        t_pad = n_groups * g
        wf = np.zeros((t_pad, 16), dtype=np.int32)
        if self.weights is not None:
            t = self.hdr.n_tiles
            wf[:t, : lsq_ops.N_FEAT] = self.weights.astype(np.int32)
            wf[:t, lsq_ops.N_FEAT] = self.flags.astype(np.int32)
        return np.ascontiguousarray(
            wf.reshape(n_groups, g, 16).transpose(0, 2, 1)
        )

    def n_active(self) -> np.ndarray:
        """Per-group active-lane counts (profile 1)."""
        t = self.hdr.n_tiles
        g = self.group_size
        n_groups = len(self.counts)
        return np.minimum(t - g * np.arange(n_groups, dtype=np.int64), g).astype(
            np.int32
        )


def _bucket(wmax: int) -> int:
    return -(-max(wmax, 2) // 512) * 512


def decode(stream: bytes) -> np.ndarray:
    """Decode an NBTC container (tile-parallel lockstep scan on device)."""
    if NbtcHeader.from_bytes(stream).profile == 3:
        from . import strips

        return strips.decode(stream)
    p = _Parsed(stream)
    hdr = p.hdr
    wmax = _bucket(int(p.counts.max()) if len(p.counts) else 2)
    streams_np = p.stream_matrix(wmax)

    if hdr.profile == 0:
        tiles = _decode_tiles(
            jnp.asarray(streams_np),
            jnp.asarray(p.bias),
            jnp.asarray(p.hist_n),
            jnp.asarray(p.acc),
            jnp.asarray(p.lut.reshape(-1)),
            hdr.tile_h,
            hdr.tile_w,
            hdr.near,
        )
    elif _use_pallas():
        from ..ops import pallas_decode

        tiles = pallas_decode.decode_groups_pallas(
            jnp.asarray(p.stream_matrix32((wmax + 1) // 2)),
            jnp.asarray(p.n_active()),
            jnp.asarray(p.bias)[None],
            jnp.asarray(p.hist_n)[None],
            jnp.asarray(p.acc)[None],
            jnp.asarray(p.weight_cols()),
            hdr.tile_h,
            hdr.tile_w,
            hdr.near,
            p.group_size,
            hdr.profile,
        )
        tiles = tiles.reshape(-1, hdr.tile_h, hdr.tile_w)[: hdr.n_tiles]
    else:
        tiles = _decode_groups(
            jnp.asarray(streams_np.astype(np.int32)),
            jnp.asarray(p.n_active()),
            jnp.asarray(p.bias),
            jnp.asarray(p.hist_n),
            jnp.asarray(p.acc),
            jnp.asarray(p.lut.reshape(-1)),
            jnp.asarray(p.weight_cols()),
            hdr.tile_h,
            hdr.tile_w,
            hdr.near,
            p.group_size,
            hdr.profile,
        )
        tiles = tiles.reshape(-1, hdr.tile_h, hdr.tile_w)[: hdr.n_tiles]
    img = from_tiles(
        np.asarray(tiles, dtype=np.uint8), hdr.height, hdr.width, hdr.tile_h, hdr.tile_w
    )
    return np.ascontiguousarray(img.T) if hdr.transposed else img
