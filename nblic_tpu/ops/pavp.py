"""Parallel AVP — the NBTC profile-3 predictor (TPU-native AVP redesign).

The reference AVP (NBLIC.c:112-283) is an online int64 ridge regression
whose spatial statistics decay per column (B), per row position (E), and as
a right-to-left prefix (F).  At near=0 every input to those recurrences is
the *original* image, so the whole predictor decomposes into three short
vectorized scans plus one independent 6x6 integer solve per pixel — no
raster-sequential chain at all (SURVEY.md §7.1, hard part #2 resolved by
restructuring rather than emulation):

- ``col_chain``  — B: per-column decay over rows      (H steps, (m, T*W) body)
- ``e_chain``    — E: in-row left accumulation         (W steps, (m, T*H) body)
- ``f_chain``    — F: right-to-left decayed prefix     (W steps, (m, T*H) body)
- ``solve_batch``— per-pixel Gaussian elimination with partial pivoting,
  vectorized with the *pixel axis last* (a (P, n, n) layout pads 28x on TPU
  tiling; (n, n, P) pads only 8/6).

Two deliberate format-level departures from the reference (this is the NBTC
native profile, not interop): the per-sample inverse-error-energy weight
uses the *simple predictor's* local error (fully parallel) instead of the
AVP's own prediction error (sequential feedback), and the ridge strength is
fixed at BIAS_INIT instead of the dual-bias random walk (measured: <0.001
bpp on Kodak).  All arithmetic is int64 (emulated on TPU) so encoder and
decoder replay bit-identically on every backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .avp import ALPHA, BETA, FB1, FB2, FB3, tdiv

FIT_BASE = 128
RIDGE_BIAS = 8  # BIAS_INIT (NBLIC.c:82); prediction is insensitive to it
N_FEAT = 6      # effort-2 class predictor (N_LIST[2], NBLIC.c:88)


def get_m(n: int) -> int:
    return 1 + n + n * n


def _ab_vec(m: int, first_beta: bool = True):
    """Per-channel decay denominators: BETA for the energy channel, ALPHA
    for the regression moments (NBLIC.c:272-282).  ``first_beta=False``
    when the stack excludes the energy channel."""
    first = BETA if first_beta else ALPHA
    return jnp.asarray([first] + [ALPHA] * (m - 1), jnp.int64)[:, None]


# --- predictor mixing (strips.Tune.mix_e replay contract) -----------------
# Two extra causal B/E/F chain channels carry spatially-decayed |err|
# energies of the hard-fallback AVP prediction (channel 0) and the simple
# prediction (channel 1); px0 blends the two predictions by SQUARED
# energies (sharper than linear: near-hard when one predictor clearly
# dominates — measured on Kodak, linear weights lose, squared wins;
# scripts/exp_mix.py).  All arithmetic int64, identical on both sides.
MIX_SH = 12  # pre-square downshift keeps squared energies in int64


def mix_ab():
    """Decay denominators of the two mix channels (both energy-class)."""
    return jnp.asarray([[BETA], [BETA]], jnp.int64)


# --- division-free quantized-weight prediction (strips.Tune.w_pred) ------
# The per-pixel AVP prediction divides each term by the solve's pivot
# product (predict_from_stats) — ~10 emulated int64 divisions per pixel on
# the decoder's critical path.  The w_pred contract instead quantizes the
# solution to int32 fixed-point weights ONCE per solve (off the critical
# path, batched with the seg_stats solves) and predicts with a pure int32
# dot product.  Quantization step 2^-FBW of a pixel unit; |coeff| clipped
# to 2^(WCLIP_BITS-FBW) so a 10-term dot stays within int32.
FBW = 12
WCLIP = (1 << 19) - 1


def quantize_weights(diag, num):
    """(diag, num) solve output -> int32 fixed-point weights (w_pred).

    The reference term is num*2^FB2/safe in FB1 fixed point, so the
    PIXEL-unit coefficient is num*2^(FB2-FB1)/safe and its FBW encoding
    is (num << (FBW-FB1+FB2)) / safe.  Computed without forming the
    shifted numerator (elimination pivots/numerators reach ~2^60; the
    naive shift overflows int64 — measured as 6.5-bpp garbage weights):
    decompose on magnitudes, an = q0*ad + r, quotient = q0*2^s +
    (r << s)/ad with r < ad, which matches the truncating division."""
    efb = FBW - FB1 + FB2  # = 2
    safe = jnp.where(diag == 0, 1, diag)
    ad = jnp.abs(safe)
    an = jnp.abs(num)
    # range-normalize (>>16 when huge: ~2^-32 relative precision; the
    # contract only needs the SAME deterministic function on both sides)
    big = ad >= (jnp.int64(1) << 48)
    ad = jnp.maximum(jnp.where(big, ad >> 16, ad), 1)
    an = jnp.where(big, an >> 16, an)
    q0 = an // ad
    r = an - q0 * ad
    mag = (jnp.minimum(q0, 1 << 28) << efb) + ((r << efb) // ad)
    sgn = jnp.sign(num) * jnp.sign(safe)
    return jnp.clip(sgn * mag, -WCLIP, WCLIP).astype(jnp.int32)


def predict_wq(wq, feats32):
    """int32 prediction from quantized weights: the w_pred walk formula.

    wq/feats32: (n, ...) int32 (feats = tap - FIT_BASE).  Bit-identical
    on every backend (pure int32); callers apply the ``ok`` fallback.
    The dot stays within int32 by construction: |wq| < 2^19 (WCLIP),
    |feat| <= 2^7, n <= 12 -> |acc| < 2^30."""
    acc = jnp.sum(wq * feats32, axis=0, dtype=jnp.int32)
    px = (jnp.int32(FIT_BASE) << FBW) + acc
    px = jnp.clip(px, 0, jnp.int32(255) << FBW)
    return (px + (1 << (FBW - 1))) >> FBW


def mix_blend(px_a, px_s, e_a, e_s, ok):
    """Blend: px0 = (px_a*(e_s'+1) + px_s*(e_a'+1)) / (e_a'+e_s'+2),
    e' = (e >> MIX_SH)^2; falls back to px_s where the solve failed."""
    ea2 = (e_a >> MIX_SH) * (e_a >> MIX_SH)
    es2 = (e_s >> MIX_SH) * (e_s >> MIX_SH)
    den = ea2 + es2 + 2
    num = (
        px_a.astype(jnp.int64) * (es2 + 1)
        + px_s.astype(jnp.int64) * (ea2 + 1)
        + (den >> 1)
    )
    return jnp.where(ok, (num // den).astype(jnp.int32), px_s)


def col_chain(contrib, first_beta: bool = True, ab=None):
    """B state after the update at each row.  contrib: (H, m, L) int64."""
    if ab is None:
        ab = _ab_vec(contrib.shape[1], first_beta)

    def step(b, c):
        b = tdiv(b * (ab - 1) + (ab >> 1), ab) + c
        return b, b

    _, out = jax.lax.scan(step, jnp.zeros_like(contrib[0]), contrib)
    return out


def e_chain(b_new, first_beta: bool = True, ab=None):
    """E before each pixel: in-row accumulation of post-update B columns.

    b_new: (W, m, L) row-major per-column states for one row set; returns E
    *before* column j (E after j-1), zero at j=0 (NBLIC.c:826, 276-281).
    """
    if ab is None:
        ab = _ab_vec(b_new.shape[1], first_beta)

    def step(e, b):
        # emit E before column j, then fold column j's post-update B in
        e2 = tdiv(e * (ab - 1) + (ab >> 1), ab) + b
        return e2, e

    _, out = jax.lax.scan(step, jnp.zeros_like(b_new[0]), b_new)
    return out


def e_freeze_extend(e, seg_w: int, first_beta: bool = True):
    """Segment-frozen E: keep E at block starts, decay-extend within.

    e: (W, c, L) E-before-col planes.  Returns the lagged contract's E:
    E'(j0 + k) = decay^k(E(j0)) for block starts j0 (multiples of
    ``seg_w``) — exactly what a decoder that batches a whole segment's
    ridge solves can compute before decoding the segment (strips.Tune
    seg_stats).  Integer-identical on both sides (same tdiv chain).
    """
    w = e.shape[0]
    if seg_w <= 1 or w % seg_w:
        return e
    ab = _ab_vec(e.shape[1], first_beta)
    starts = e[::seg_w]  # (nb, c, L)

    def step(st, _):
        st = tdiv(st * (ab - 1) + (ab >> 1), ab)
        return st, st

    _, ext = jax.lax.scan(step, starts, None, length=seg_w - 1)
    full = jnp.concatenate([starts[None], ext], axis=0)  # (seg_w, nb, ...)
    return full.transpose(1, 0, 2, 3).reshape(e.shape)


def hold_starts(e, seg_w: int):
    """Hold chain values at segment starts: e'(j0+k) = e(j0).

    The w_pred contract freezes the WHOLE (E+F) stats at each segment's
    first column (no decay extension), so the decoder runs ONE ridge
    solve per segment instead of per column.  e: (W, c, L)."""
    w = e.shape[0]
    if seg_w <= 1 or w % seg_w:
        return e
    starts = e[::seg_w][:, None]  # (nb, 1, c, L)
    return jnp.broadcast_to(
        starts, (w // seg_w, seg_w) + e.shape[1:]
    ).reshape(e.shape)


def f_chain(b_prev, first_beta: bool = True, ab=None):
    """F at each column from the previous row's B (AVPprecalcuate,
    NBLIC.c:186-204).  b_prev: (W, m, L); returns F: (W, m, L)."""
    if ab is None:
        ab = _ab_vec(b_prev.shape[1], first_beta)

    def step(f, b):
        f2 = tdiv(f * (ab - 1) + (ab >> 1), ab) + b
        return f2, f2

    _, out = jax.lax.scan(step, jnp.zeros_like(b_prev[0]), b_prev[::-1])
    return out[::-1]


def _is_tpu() -> bool:
    """Trace-time platform guess (same heuristic as _solve_chunk)."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return getattr(dd, "platform", None) == "tpu"
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


def _level_barrier(vals):
    """Materialize an elimination level — except on TPU.

    On CPU the barrier keeps XLA from duplicating whole elimination levels
    into each consumer (3x compile/runtime measured without it).  On TPU the
    barrier must be OMITTED: XLA:TPU miscompiles int64 optimization_barrier
    inside lax.map/scan bodies (predictions silently diverge from the
    identical body run standalone; measured on this platform).  The TPU
    compile blowup the barrier once guarded against is already cured by the
    flat masked-sum pivot swap and the level-batched divides.
    """
    if _is_tpu():
        return vals
    return jax.lax.optimization_barrier(vals)


def solve_batch(a, b, n: int):
    """int64 Gaussian elimination, pixel axis LAST.  a: (n, n, P), b: (n, P).

    Matches AVPsolveAxb (NBLIC.c:112-161): partial pivoting by |A[i,k]|
    (first max wins, like the C scan), C-truncating quotients of full
    products.  Returns (diag, x_num, ok) where solution k = x_num[k]/diag[k].

    The matrix lives as n*n separate (P,) registers — pure dataflow, no
    in-place array updates — which keeps the unrolled graph XLA-friendly
    (the .at[].set() form provoked pathological compile times on TPU).
    """
    A = [[a[i, j] for j in range(n)] for i in range(n)]
    bb = [b[i] for i in range(n)]
    ok = jnp.ones(a.shape[2], bool)

    for k in range(n - 1):
        # pivot: first row index with max |A[i,k]| over i >= k (argmax
        # returns the first maximum, matching the C strict-> scan)
        col = jnp.stack([jnp.abs(A[i][k]) for i in range(n)])
        piv = jnp.argmax(
            jnp.where((jnp.arange(n) >= k)[:, None], col, -1), axis=0
        ).astype(jnp.int32)
        # swap rows k and piv as FLAT masked sums — nested where() chains
        # trip XLA's select-sinking into exponential subtree duplication
        # (measured: 7570 divides in the optimized HLO from ~25 in source)
        sel = [(piv == i) for i in range(n)]
        selz = [s.astype(jnp.int64) for s in sel]

        def pick(vals):
            acc = vals[k] * selz[k]
            for i in range(k + 1, n):
                acc = acc + vals[i] * selz[i]
            return acc

        rowk = [pick([A[i][j] for i in range(n)]) for j in range(k, n)]
        bk = pick(bb)
        for i in range(k + 1, n):
            swi = selz[i]
            for j in range(k, n):
                A[i][j] = A[i][j] + (A[k][j] - A[i][j]) * swi
            bb[i] = bb[i] + (bb[k] - bb[i]) * swi
        for j in range(k, n):
            A[k][j] = rowk[j - k]
        bb[k] = bk

        akk = A[k][k]
        ok &= akk != 0
        safe = jnp.where(akk == 0, 1, akk)
        # ONE stacked divide per elimination level: int64 division is the
        # expensive op for the TPU backend to *compile* (~8 s of compile per
        # divide instruction, superlinear past ~50); every quotient at this
        # level shares the divisor `safe`, so batching them is free and
        # bit-identical while cutting the program's divide count from ~85
        # to ~10.
        nums = jnp.stack(
            [A[k][j] * A[i][k] for i in range(k + 1, n)
             for j in range(k + 1, n)]
            + [bb[k] * A[i][k] for i in range(k + 1, n)]
        )
        quo = tdiv(nums, safe[None, :])
        w_k = n - 1 - k  # rows below the pivot
        for idx, i in enumerate(range(k + 1, n)):
            for jdx, j in enumerate(range(k + 1, n)):
                A[i][j] = A[i][j] - quo[idx * w_k + jdx]
            bb[i] = bb[i] - quo[w_k * w_k + idx]
            A[i][k] = jnp.zeros_like(akk)
        flat = _level_barrier([x for row in A for x in row] + bb + [ok])
        A = [[flat[i * n + j] for j in range(n)] for i in range(n)]
        bb = list(flat[n * n : n * n + n])
        ok = flat[-1]

    for k in range(n - 1, 0, -1):
        akk = A[k][k]
        ok &= akk != 0
        safe = jnp.where(akk == 0, 1, akk)
        quo = tdiv(
            jnp.stack([bb[k] * A[i][k] for i in range(k)]), safe[None, :]
        )
        for i in range(k):
            bb[i] = bb[i] - quo[i]
        bb = list(_level_barrier(bb))

    diag = jnp.stack([A[k][k] for k in range(n)])
    return diag, jnp.stack(bb), ok


def _solve_chunk() -> int:
    """Pixels per solve chunk: big enough to keep the device busy, small
    enough that XLA's compile stays flat across image sizes."""
    import os

    env = os.environ.get("NBLIC_SOLVE_CHUNK")
    if env:
        return int(env)
    dd = jax.config.jax_default_device  # tests pin this to CPU
    if dd is not None:
        return 131072 if getattr(dd, "platform", None) == "tpu" else 4096
    try:
        tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        tpu = False
    return 131072 if tpu else 4096


def predict_chunked(stats, feats, n: int, w_quant: bool = False):
    """predict_from_stats via lax.map over fixed-size pixel chunks.

    XLA's compile time for the unrolled solve grows superlinearly with the
    batch extent; mapping over fixed chunks compiles the body once at a
    known-cheap shape (runtime cost of the chunking is nil — the solve is
    a tiny fraction of the encode).

    ``w_quant``: the w_pred contract — quantize the solve to int32 weights
    and predict with the int32 dot (returns pixel-unit px0, not FB1 fixed
    point; the decoder's walk computes the identical predict_wq).
    """
    SOLVE_CHUNK = _solve_chunk()
    m, p = stats.shape
    pad = (-p) % SOLVE_CHUNK
    stats_p = jnp.pad(stats, ((0, 0), (0, pad)))
    feats_p = jnp.pad(feats, ((0, 0), (0, pad)))
    nc = stats_p.shape[1] // SOLVE_CHUNK
    stats_c = stats_p.reshape(m, nc, SOLVE_CHUNK).transpose(1, 0, 2)
    feats_c = feats_p.reshape(n, nc, SOLVE_CHUNK).transpose(1, 0, 2)
    # REQUIRED barrier (both backends): without it XLA fuses the
    # pad/reshape/transpose above into the map body and miscompiles the
    # int64 solve when this sits inside a larger program — predictions
    # silently diverge at fusion-heuristic-dependent shapes (e.g. a
    # (1, 96, 192) strip batch; kodak-sized planes happened to fuse
    # correctly).  Measured: map+barrier == scan-chunking == the unchunked
    # solve, on TPU and CPU; without the barrier all three disagree.
    stats_c, feats_c = jax.lax.optimization_barrier((stats_c, feats_c))

    def body(args):
        s, f = args
        if w_quant:
            return predict_from_stats_wq(s, f, n)
        return predict_from_stats(s, f, n)

    px, ok = jax.lax.map(body, (stats_c, feats_c))
    return px.reshape(-1)[:p], ok.reshape(-1)[:p]


def predict_from_stats(stats, feats, n: int):
    """Ridge solve + fixed-point prediction (AVPpredict, NBLIC.c:210-239).

    stats: (m, P) = E + F; feats: (n, P).  Returns (px_fixed, ok)."""
    bias = jnp.int64(RIDGE_BIAS)
    bvec = stats[1 : 1 + n] + (bias << FB3)
    amat = stats[1 + n :].reshape(n, n, -1)
    eye = jnp.eye(n, dtype=jnp.int64)[:, :, None]
    amat = amat + eye * (bias * n)
    diag, num, ok = solve_batch(amat, bvec, n)
    safe = jnp.where(diag == 0, 1, diag)
    terms = tdiv(((num * feats) << FB2) + (safe >> 1), safe)
    px = (jnp.int64(FIT_BASE) << FB1) + jnp.sum(terms, axis=0)
    px = jnp.clip(px, 0, jnp.int64(255) << FB1)
    return px, ok


def predict_from_stats_wq(stats, feats, n: int):
    """Ridge solve + w_pred int32 quantized-weight prediction.

    Returns (px0 in PIXEL units int32, ok) — the encoder twin of the
    decoder's batched quantize_weights + per-pixel predict_wq."""
    bias = jnp.int64(RIDGE_BIAS)
    bvec = stats[1 : 1 + n] + (bias << FB3)
    amat = stats[1 + n :].reshape(n, n, -1)
    eye = jnp.eye(n, dtype=jnp.int64)[:, :, None]
    amat = amat + eye * (bias * n)
    diag, num, ok = solve_batch(amat, bvec, n)
    wq = quantize_weights(diag, num)
    return predict_wq(wq, feats.astype(jnp.int32)), ok


def predict_plane(strips, n: int = N_FEAT, row_frozen: bool = False,
                  seg_w: int = 0, mix: bool = False,
                  w_quant: bool = False):
    """AVP prediction for every pixel of (S, H, W) int32 strips, in parallel.

    Returns the int32 px0 plane.  Decomposition of the reference's per-pixel
    loop (NBLIC.c:807-894) into three vectorized scans + one batched solve:
    B is a per-column chain over rows, E an in-row left chain, F the
    right-to-left decayed prefix of the previous row's B.  The per-sample
    inverse-error-energy weight uses the simple predictor's error (parallel
    proxy for the reference's own-prediction feedback, NBLIC.c:884-886;
    a two-pass variant weighting by the AVP's own first-pass error measured
    no gain — 4.1115 vs 4.1114 bpp on Kodak-24 — and was dropped).

    ``row_frozen``: use only rows < i for the stats at row i (the left
    chain runs over the PREVIOUS row's B instead of the current row's) —
    the profile-3 v2 contract, which lets the decoder hoist the solve out
    of its per-pixel walk.

    ``mix``: blend the hard-fallback prediction with the simple one by
    squared causal decayed |err| energies (strips.Tune.mix_e; the
    reference blends implicitly via its error-energy sample weights,
    NBLIC.c:257-262).  The mix chains are always live (e over the current
    row's B), so the combination with ``row_frozen``/``seg_w`` is
    undefined and rejected.
    """
    from .neighbors import sample
    from .predict import simple_predict

    if mix and (row_frozen or seg_w):
        raise ValueError("mix_e is incompatible with row_frozen/seg_stats")

    s, h, w = strips.shape
    m = get_m(n)
    x32 = strips.astype(jnp.int32)
    nb = sample(x32)
    px_s = simple_predict(nb)
    x = strips.astype(jnp.int64)

    # t tap: img[i-1, j+2], falling back to d out of range
    # (sampleNeighbourPixels, NBLIC.c:303)
    d64 = nb.d.astype(jnp.int64)
    up2r = jnp.roll(jnp.roll(x, 1, axis=1), -2, axis=2)
    t_ok = (jnp.arange(h)[None, :, None] >= 1) & (
        jnp.arange(w)[None, None, :] + 2 < w
    )
    t_tap = jnp.where(t_ok, up2r, d64)
    # taps beyond the reference's 10 (N_LIST[3]) are a TPU-native extension:
    # r=(i-2,j+2) and s=(i-2,j-2) come free from the same sampled window
    taps = (nb.a, nb.b, nb.c, nb.d, nb.e, nb.f, t_tap, nb.h, nb.q, nb.g,
            nb.r, nb.s)
    feats = jnp.stack(
        [jnp.asarray(v, jnp.int64) - FIT_BASE for v in taps[:n]]
    )  # (n, S, H, W)

    s_curr = jnp.abs(x - px_s.astype(jnp.int64)) << FB1

    def run_chains(contrib, first_beta=True, ab=None):
        """contrib (C, S, H, W) -> (E + F) stats, same leading C."""
        c = contrib.shape[0]
        # B: per-column chain over rows; scan over H with (C, S*W) body
        b_in = contrib.transpose(2, 0, 1, 3).reshape(h, c, s * w)
        b_new = col_chain(b_in, first_beta, ab).reshape(
            h, c, s, w
        ).transpose(1, 2, 0, 3)
        b_prev = jnp.concatenate(
            [jnp.zeros_like(b_new[:, :, :1]), b_new[:, :, :-1]], axis=2
        )
        # E: in-row left chain (v2/row_frozen: over the previous row's B,
        # so the stats at (i, j) use rows < i only); with ``seg_w`` the
        # chain is frozen at segment starts and decay-extended (the
        # seg_stats serving contract — lets the decoder batch solves)
        e_src = b_prev if row_frozen else b_new
        e_in = e_src.transpose(3, 0, 1, 2).reshape(w, c, s * h)
        e = e_chain(e_in, first_beta, ab)
        if seg_w and w_quant:
            # w_pred: hold at starts (one solve per segment, decoder-side)
            e = hold_starts(e, seg_w)
        elif seg_w:
            e = e_freeze_extend(e, seg_w, first_beta)
        e = e.reshape(w, c, s, h).transpose(1, 2, 3, 0)
        # F: right-to-left prefix of the previous row's B
        f_in = b_prev.transpose(3, 0, 1, 2).reshape(w, c, s * h)
        f = f_chain(f_in, first_beta, ab)
        if seg_w and w_quant:
            f = hold_starts(f, seg_w)
        f = f.reshape(w, c, s, h).transpose(1, 2, 3, 0)
        return e + f

    # energy channel first: its E+F feeds every other channel's weight
    ef0 = run_chains(s_curr[None])[0]
    s_sum = ef0 + tdiv(s_curr * BETA, jnp.int64(BETA - 1))

    # moment channels in blocks of n through the chains (lax.map):
    # materializing all n + n^2 int64 channel planes at once is ~2 GB/image
    # at n=10 and OOMs the chip on whole-image batches.  Channels are
    # independent, and each block body reproduces ``contributions``
    # (AVPupdate, NBLIC.c:242-270) exactly: vb_k = xf*feats_k, a_ij =
    # feats_i*feats_j, with their respective fixed-point shifts.
    xf = x - FIT_BASE
    s_sum_c = jnp.clip(
        s_sum + (jnp.int64(1) << FB1), jnp.int64(1) << FB1,
        jnp.int64(16) << FB1,
    )
    half = s_sum_c >> 1
    feats_ext = jnp.concatenate([xf[None], feats])  # (n+1, S, H, W)
    left_idx = jnp.asarray(
        [0] * n + [1 + i for i in range(n) for _ in range(n)], jnp.int32
    )
    right_idx = jnp.asarray(
        [1 + k for k in range(n)]
        + [1 + j for _ in range(n) for j in range(n)],
        jnp.int32,
    )
    shifts = jnp.asarray(
        [4 + FB1 + FB1] * n + [4 + FB2 + FB1] * (n * n), jnp.int64
    )
    nb_blk = (n + n * n) // n  # == 1 + n, exact

    def block_stats(args):
        lidx, ridx, shv = args
        lf = jnp.take(feats_ext, lidx, axis=0)
        rf = jnp.take(feats_ext, ridx, axis=0)
        contrib = tdiv(
            ((lf * rf) << shv[:, None, None, None]) + half, s_sum_c
        )
        return run_chains(contrib, first_beta=False)

    stats = jax.lax.map(
        block_stats,
        (left_idx.reshape(nb_blk, n), right_idx.reshape(nb_blk, n),
         shifts.reshape(nb_blk, n)),
    ).reshape(n + n * n, s, h, w)

    stats_flat = jnp.concatenate(
        [ef0.reshape(1, -1), stats.reshape(n + n * n, -1)]
    )
    px_v, ok = predict_chunked(stats_flat, feats.reshape(n, -1), n, w_quant)
    if w_quant:  # already pixel units (predict_wq)
        px0 = px_v.astype(jnp.int32).reshape(s, h, w)
    else:
        px0 = ((px_v + (1 << (FB1 - 1))) >> FB1).astype(
            jnp.int32
        ).reshape(s, h, w)
    okp = ok.reshape(s, h, w)
    px_hard = jnp.where(okp, px0, px_s)
    if not mix:
        return px_hard
    # mix chains: causal decayed |err| energies of both predictors (the
    # decoder replays them per pixel from its reconstructions)
    c_mix = jnp.stack([
        jnp.abs(x - px_hard.astype(jnp.int64)) << FB1,
        jnp.abs(x - px_s.astype(jnp.int64)) << FB1,
    ])
    ef_mix = run_chains(c_mix, ab=mix_ab())
    return mix_blend(px_hard, px_s, ef_mix[0], ef_mix[1], okp)


def contributions(x, feats, s_curr, s_sum, n: int):
    """Per-pixel moment contributions (AVPupdate, NBLIC.c:242-270).

    x: (..., P) int64 pixels; feats: (n, P); s_curr/s_sum: (P,).
    Returns (m, P) int64 [energy, b-vector, A-matrix flattened]."""
    xf = x - FIT_BASE
    s_sum = jnp.clip(s_sum + (jnp.int64(1) << FB1), jnp.int64(1) << FB1,
                     jnp.int64(16) << FB1)
    half = s_sum >> 1
    vb = tdiv(((xf * feats) << (4 + FB1 + FB1)) + half, s_sum)
    va = tdiv(((feats[:, None] * feats[None, :]) << (4 + FB2 + FB1))
              + half, s_sum).reshape(n * n, -1)
    return jnp.concatenate([s_curr[None], vb, va])
