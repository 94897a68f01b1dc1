"""Unit tests for the profile-3 building blocks (pavp, zcodec3, rans_bin)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nblic_tpu.ops import rans_bin, zcodec3


def _walk_reference(z, qu, qv, k_step, n_unary):
    """Scalar Zcodec unary walk (mirrors NBLIC.c:649-672 + our budget)."""
    k_max = (zcodec3.N_ROW - 1) // k_step
    if qv // k_step != qu // k_step:
        qv = qu
    i, events = 0, []
    for _ in range(n_unary):
        k = qu // k_step
        b = int((i >> k_max) < (z >> k))
        events.append((qu, qv, i, b))
        if not b:
            return events, qu, k, False
        i += 1 << k_max
        if i >= 256:
            i >>= 1
            qn = min((k + 1) * k_step, zcodec3.N_ROW - 1)
            qu = qv = qn
    return events, qu, qu // k_step, True


@pytest.mark.parametrize("k_step", [3, 5, 9])
@pytest.mark.parametrize("n_unary", [9, 13])
def test_unary_layers_match_scalar_walk(k_step, n_unary):
    rng = np.random.default_rng(3)
    z = rng.integers(0, 256, 512).astype(np.int32)
    qu = rng.integers(0, 16, 512).astype(np.int32)
    qv = np.clip(qu + rng.integers(-1, 2, 512), 0, 15).astype(np.int32)

    layers, row_end, k_end, escaped = jax.jit(
        zcodec3.unary_layers, static_argnums=(3, 4)
    )(jnp.asarray(z), jnp.asarray(qu), jnp.asarray(qv), k_step, n_unary)
    layers = [[np.asarray(v) for v in l] for l in layers]

    for p in range(512):
        ev, end_row, k, esc = _walk_reference(
            int(z[p]), int(qu[p]), int(qv[p]), k_step, n_unary
        )
        lc = zcodec3.layer_consts(k_step, n_unary)
        for l, (u, v, i, b) in enumerate(ev):
            ru, rv, bb, act = layers[l]
            assert act[p], (p, l)
            assert (ru[p], rv[p], int(bb[p])) == (u, v, b), (p, l)
            assert lc.i_vals[l] == i, (p, l)
        for l in range(len(ev), n_unary):
            assert not layers[l][3][p]
        assert bool(np.asarray(escaped)[p]) == esc
        if not esc:
            assert int(np.asarray(row_end)[p]) == end_row
            assert int(np.asarray(k_end)[p]) == k


def test_refine_layers_reconstruct_bits():
    rng = np.random.default_rng(4)
    z = rng.integers(0, 256, 256).astype(np.int32)
    k_end = rng.integers(0, 6, 256).astype(np.int32)
    esc = jnp.zeros(256, bool)
    layers = zcodec3.refine_layers(jnp.asarray(z), jnp.asarray(k_end), esc)
    # bits MSB-first reconstruct z mod 2^k_end
    val = np.zeros(256, np.int64)
    for l, (bit, act, msb) in enumerate(layers):
        kk = k_end - 1 - l
        m = np.asarray(act)
        val[m] += np.asarray(bit)[m].astype(np.int64) << kk[m]
    assert np.array_equal(val, z & ((1 << k_end) - 1))


def test_rans_bin_roundtrip():
    rng = np.random.default_rng(5)
    s, l = 8, 4096
    p1 = rng.integers(1, 4096, (s, l)).astype(np.int32)
    bins = (rng.random((s, l)) < p1 / 4096.0).astype(np.int32)
    mask = rng.random((s, l)) < 0.35

    words, emits, state = jax.jit(rans_bin.fold)(
        jnp.asarray(p1), jnp.asarray(bins), jnp.asarray(mask)
    )
    from nblic_tpu.ops import rans

    flat, lengths = rans.pack_streams(words, emits, state)
    mat = rans.pad_streams(
        np.asarray(flat), np.asarray(lengths), int(np.asarray(lengths).max())
    )

    st, ptr = rans_bin.dec_init(jnp.asarray(mat))
    out = np.zeros((s, l), np.int32)
    st = np.asarray(st, dtype=np.uint32).copy()
    ptr = np.asarray(ptr).copy()
    mat = np.asarray(mat)
    for t in range(l):
        for lane in range(s):
            if not mask[lane, t]:
                continue
            b, st2 = rans_bin.dec_bit(jnp.uint32(st[lane]), jnp.int32(p1[lane, t]))
            st2 = int(st2)
            if st2 < rans_bin.ANS_LOW:
                st2 = (st2 << 16) | int(mat[lane, ptr[lane]])
                ptr[lane] += 1
            st[lane] = st2
            out[lane, t] = int(b)
    assert np.array_equal(out[mask], bins[np.asarray(mask)])
    # every stream must drain exactly to the initial state
    assert np.all(st == rans_bin.ANS_LOW)


def test_predict_plane_runs_and_beats_simple():
    from nblic_tpu.ops import pavp
    from nblic_tpu.ops.neighbors import sample
    from nblic_tpu.ops.predict import simple_predict
    from nblic_tpu.utils import imageio

    img = imageio.load_image("/root/reference/img_kodak/05.bmp")[:96, :192]
    with jax.enable_x64():
        px0 = np.asarray(
            jax.jit(pavp.predict_plane, static_argnums=1)(
                jnp.asarray(img[None].astype(np.int32)), 6
            )
        )
    px_s = np.asarray(simple_predict(sample(jnp.asarray(img[None].astype(np.int32)))))
    x = img[None].astype(np.int64)
    # AVP must reduce mean absolute prediction error on natural content
    assert np.abs(x - px0).mean() < np.abs(x - px_s).mean()


def _wrap64(v: int) -> int:
    return (v + 2**63) % 2**64 - 2**63


def _tdiv_scalar(p: int, q: int) -> int:
    if q == 0:
        return 0
    s = -1 if (p < 0) != (q < 0) else 1
    return _wrap64(s * (abs(p) // abs(q)))


def _scalar_solve(a, b, n):
    """Scalar replay of AVPsolveAxb semantics (NBLIC.c:112-161) with int64
    WRAPPING on every product/difference — the device arithmetic model."""
    A = [[int(a[i, j]) for j in range(n)] for i in range(n)]
    bb = [int(b[i]) for i in range(n)]
    ok = True
    for k in range(n - 1):
        piv, best = k, -1
        for i in range(k, n):
            if abs(A[i][k]) > best:
                best, piv = abs(A[i][k]), i
        if piv != k:
            A[k], A[piv] = A[piv], A[k]
            bb[k], bb[piv] = bb[piv], bb[k]
        akk = A[k][k]
        if akk == 0:
            ok = False
            akk = 1
        for i in range(k + 1, n):
            aik = A[i][k]
            for j in range(k + 1, n):
                A[i][j] = _wrap64(A[i][j] - _tdiv_scalar(_wrap64(A[k][j] * aik), akk))
            bb[i] = _wrap64(bb[i] - _tdiv_scalar(_wrap64(bb[k] * aik), akk))
            A[i][k] = 0
    for k in range(n - 1, 0, -1):
        akk = A[k][k]
        if akk == 0:
            ok = False
            akk = 1
        for i in range(k):
            bb[i] = _wrap64(bb[i] - _tdiv_scalar(_wrap64(bb[k] * A[i][k]), akk))
    return (
        np.array([A[i][i] for i in range(n)], np.int64),
        np.array(bb, np.int64),
        ok,
    )


def test_solve_batch_matches_scalar_oracle():
    """solve_batch (level-batched divides) == scalar Gaussian elimination,
    including singular and rank-deficient systems."""
    from nblic_tpu.ops import pavp

    rng = np.random.default_rng(3)
    n, p = 6, 96
    a_np = rng.integers(-(2**40), 2**40, size=(n, n, p))
    a_np[:, :, :8] = 0                      # singular block
    a_np[2, :, 8:16] = a_np[3, :, 8:16]     # rank-deficient block
    b_np = rng.integers(-(2**45), 2**45, size=(n, p))
    with jax.enable_x64():
        d1, x1, ok1 = jax.jit(pavp.solve_batch, static_argnums=2)(
            jnp.asarray(a_np, jnp.int64), jnp.asarray(b_np, jnp.int64), n
        )
    d1, x1, ok1 = np.asarray(d1), np.asarray(x1), np.asarray(ok1)
    for pi in range(p):
        d2, x2, ok2 = _scalar_solve(a_np[:, :, pi], b_np[:, pi], n)
        np.testing.assert_array_equal(d1[:, pi], d2)
        np.testing.assert_array_equal(x1[:, pi], x2)
        assert bool(ok1[pi]) == ok2
