"""AVP — the reference's online int64 least-squares predictor, as scan ops.

Efforts 2-3 of the NBLIC engine run an online weighted ridge regression per
pixel (NBLIC.c:112-283): spatially decayed sufficient statistics per column,
two ridge-regularized solves per pixel (dual-bias adaptation), int64
throughout with C-truncating division.  These functions are the exact
functional translation used by the device interop engine
(models/nblic.py, efforts 2-3) under ``jax.experimental.enable_x64`` —
int64 runs on CPU; the TPU-native redesign of the same idea is the NBTC
profile-2 batched per-tile fit (ops/lsq.py).

All constants cite NBLIC.c: FIT_BASE=128 (:78), ALPHA=5/BETA=3 (:79-80),
FB1/FB2/FB3 = 12/2/10 (:74-76), BIAS_* (:82-84), feature order
a,b,c,d,e,f,t,h,q,g (:164-175).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FIT_BASE = 128
ALPHA = 5
BETA = 3
FB1 = 12
FB2 = 2
FB3 = FB1 - FB2
BIAS_INIT = 2 << FB2
BIAS_MAX = 1024 << FB2
BIAS_COEF = 21
N_LIST = (-1, 0, 6, 10)


def get_m(n: int) -> int:
    return 1 + n + n * n


def tdiv(a, b):
    """C-truncating (round-toward-zero) integer division."""
    q = jnp.abs(a) // jnp.abs(b)
    return jnp.where((a < 0) ^ (b < 0), -q, q)


def features(nb, t_tap, n: int):
    """Causal feature vector minus FIT_BASE (NBLIC.c:164-183)."""
    order = (nb.a, nb.b, nb.c, nb.d, nb.e, nb.f, t_tap, nb.h, nb.q, nb.g)
    return jnp.stack(
        [v.astype(jnp.int64) - FIT_BASE for v in order[:n]]
    )


def precalculate_f(b_cols: jnp.ndarray, m: int) -> jnp.ndarray:
    """Right-to-left decayed prefix F of the column moments B
    (AVPprecalcuate, NBLIC.c:186-204).  b_cols: (W, m) int64 -> F (W, m)."""
    ab = jnp.asarray(
        [BETA] + [ALPHA] * (m - 1), dtype=jnp.int64
    )

    def step(f_right, b_col):
        f = tdiv(f_right * (ab - 1) + ab // 2, ab) + b_col
        return f, f

    # the decay applies to F of column j+1; the rightmost column starts at 0
    _, f_rev = jax.lax.scan(
        step, jnp.zeros((m,), jnp.int64), b_cols[::-1]
    )
    return f_rev[::-1]


def solve_axb(a: jnp.ndarray, b: jnp.ndarray, n: int):
    """int64 Gaussian elimination with partial pivoting (NBLIC.c:112-161).

    a: (n, n), b: (n,).  Returns (a_diag-ready, b_solved, ok).  Quotients use
    C truncation of the full product, matching the reference exactly.
    """
    ok = jnp.asarray(True)
    rows = jnp.arange(n)

    for k in range(n - 1):
        col = jnp.where(rows >= k, jnp.abs(a[:, k]), -1)
        piv = jnp.argmax(col)
        # swap rows k and piv (full-row swap; columns < k are already zero)
        swap = piv != k
        rk, rp = a[k], a[piv]
        a = a.at[k].set(jnp.where(swap, rp, rk)).at[piv].set(
            jnp.where(swap, rk, rp)
        )
        bk, bp = b[k], b[piv]
        b = b.at[k].set(jnp.where(swap, bp, bk)).at[piv].set(
            jnp.where(swap, bk, bp)
        )
        akk = a[k, k]
        ok &= akk != 0
        safe = jnp.where(akk == 0, 1, akk)
        fac = a[:, k]  # (n,)
        elim = rows > k
        quot = tdiv(a[k][None, :] * fac[:, None], safe)  # (n, n)
        a = jnp.where(elim[:, None], a - quot, a)
        bq = tdiv(b[k] * fac, safe)
        b = jnp.where(elim, b - bq, b)
        a = a.at[:, k].set(jnp.where(elim, 0, a[:, k]))

    for k in range(n - 1, 0, -1):
        akk = a[k, k]
        ok &= akk != 0
        safe = jnp.where(akk == 0, 1, akk)
        fac = a[:, k]
        elim = rows < k
        b = jnp.where(elim, b - tdiv(b[k] * fac, safe), b)
        a = a.at[:, k].set(jnp.where(elim, 0, a[:, k]))
    return a, b, ok


def predict(e_acc, f_col, feat, bias, n: int):
    """AVPpredict (NBLIC.c:210-239): ridge solve -> fixed-point prediction."""
    m = get_m(n)
    stats = e_acc + f_col  # (m,)
    b = stats[1 : 1 + n]
    a = stats[1 + n :].reshape(n, n)
    b = b + (bias << FB3)
    a = a + jnp.eye(n, dtype=jnp.int64) * (bias * n)
    a, b, ok = solve_axb(a, b, n)
    akk = jnp.diagonal(a)
    safe = jnp.where(akk == 0, 1, akk)
    px = (jnp.int64(FIT_BASE) << FB1) + jnp.sum(
        tdiv(((b * feat) << FB2) + (akk >> 1), safe)
    )
    px = jnp.clip(px, 0, jnp.int64(255) << FB1)
    return px, ok


def update(e_acc, b_col, feat, x, s_curr, s_sum, n: int):
    """AVPupdate (NBLIC.c:242-283): decayed rank-1 moment update.

    Returns (e_acc', b_col')."""
    m = get_m(n)
    xf = jnp.int64(x) - FIT_BASE
    s_sum = jnp.clip(
        s_sum + (jnp.int64(1) << FB1), jnp.int64(1) << FB1, jnp.int64(16) << FB1
    )
    half = s_sum >> 1
    vb = tdiv(((xf * feat) << (4 + FB1 + FB1)) + half, s_sum)
    va = tdiv(
        ((feat[:, None] * feat[None, :]) << (4 + FB2 + FB1)) + half, s_sum
    ).reshape(-1)
    stats = jnp.concatenate([jnp.asarray([s_curr], jnp.int64), vb, va])
    ab = jnp.asarray([BETA] + [ALPHA] * (m - 1), dtype=jnp.int64)
    b_col = tdiv(b_col * (ab - 1) + (ab >> 1), ab) + stats
    e_acc = tdiv(e_acc * (ab - 1) + (ab >> 1), ab) + b_col
    return e_acc, b_col


def dual_biases(bias):
    """The two candidate ridge strengths (NBLIC.c:837-842)."""
    b1 = tdiv(bias * BIAS_COEF, BIAS_COEF + 1)
    b2 = tdiv(bias * (BIAS_COEF + 1), BIAS_COEF)
    b1 = jnp.clip(b1, -1, bias - 1)
    b2 = jnp.clip(b2, bias + 1, BIAS_MAX + 1)
    b1 = jnp.clip(b1, 0, BIAS_MAX)
    b2 = jnp.clip(b2, 0, BIAS_MAX)
    return b1, b2
