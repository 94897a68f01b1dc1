"""Multi-chip SPMD encode over a jax.sharding.Mesh.

The reference's only parallelism is a 4-thread row-band pipeline on one host
(QNBLIC.c:660-868).  The TPU-native counterpart shards the *tile axis* of the
NBTC engine across a device mesh:

- modeling + residual fold are embarrassingly parallel per tile (local),
- the two global reductions — context-bias moments and symbol histograms —
  ride the ICI as ``psum`` collectives,
- the per-tile rANS folds stay device-local (each shard folds its own tiles),
- per-tile stream lengths are implicitly all-gathered when the host fetches
  the sharded outputs for container assembly.

Batch-of-images workloads extend the same mesh with a leading ``data`` axis
(images are independent; only the tile axis needs collectives).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import Q_N_CONTEXT
from ..ops import context as ctx_ops
from ..ops import rans
from ..ops.predict import model_stage1

N_QD = 12
N_SYM = 256


def make_mesh(
    n_devices: int | None = None, axis: str = "tiles", devices=None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            # single-accelerator session: fall back to the virtual CPU mesh
            devices = jax.devices("cpu")
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def _encode_step_local(tiles, axis: str):
    """Shard-local body of the lossless encode step (runs under shard_map)."""
    x = tiles.astype(jnp.int32)
    px0, err, qd, adr = jax.vmap(model_stage1)(x)
    sums, cnts = ctx_ops.bias_moments(adr, err, Q_N_CONTEXT)
    sums = jax.lax.psum(sums, axis)
    cnts = jax.lax.psum(cnts, axis)
    bias = ctx_ops.quantize_bias(sums, cnts)
    px, sign = ctx_ops.apply_static_bias(bias, adr, px0)
    y = ctx_ops.residual_fold(x, px, sign, 0)
    hist = ctx_ops.pair_segment_sum(
        qd.reshape(-1) * N_SYM + y.reshape(-1), None, N_QD * N_SYM
    ).reshape(N_QD, N_SYM)
    hist = jax.lax.psum(hist, axis)
    return y, qd, bias, hist


def sharded_model_lossless(mesh: Mesh, axis: str = "tiles"):
    """jit-compiled SPMD modeling pass: tiles sharded, tables replicated."""
    fn = jax.shard_map(
        functools.partial(_encode_step_local, axis=axis),
        mesh=mesh,
        in_specs=(P(axis, None, None),),
        out_specs=(P(axis, None, None), P(axis, None, None), P(None), P(None, None)),
    )
    return jax.jit(fn)


def _fold_local(y, qd, hist_n, acc):
    t = y.shape[0]
    freq = hist_n[qd.reshape(t, -1), y.reshape(t, -1)]
    facc = acc[qd.reshape(t, -1), y.reshape(t, -1)]
    return rans.encode_scan(freq, facc)


def sharded_rans_fold(mesh: Mesh, axis: str = "tiles"):
    """jit-compiled SPMD rANS fold: per-tile streams, device-local."""
    fn = jax.shard_map(
        _fold_local,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None), P(None, None), P(None, None)),
        out_specs=(P(axis, None), P(axis, None), P(axis)),
    )
    return jax.jit(fn)


def shard_tiles(tiles: jnp.ndarray, mesh: Mesh, axis: str = "tiles"):
    """Place a (T, th, tw) tile batch with the tile axis sharded over the mesh."""
    return jax.device_put(tiles, NamedSharding(mesh, P(axis, None, None)))


# ---------------------------------------------------------------------------
# full-program SPMD: whole encode / decode over a data x tiles mesh
# ---------------------------------------------------------------------------


def make_mesh2(n_data: int, n_tiles: int, devices=None) -> Mesh:
    """2-D mesh: ``data`` shards images (pure DP, no collectives), ``tiles``
    shards each image's tile axis (psum for the shared tables).  This is the
    production layout: data parallelism rides DCN-sized batches, tile
    parallelism rides ICI (SURVEY.md §7.2.8)."""
    if devices is None:
        devices = jax.devices()
        if len(devices) < n_data * n_tiles:
            devices = jax.devices("cpu")
    devices = np.asarray(devices[: n_data * n_tiles]).reshape(n_data, n_tiles)
    return Mesh(devices, ("data", "tiles"))


def _encode_full_local(tiles, g_lanes: int, t_real: int):
    """Whole lossless encode for the local (B_loc, T_loc, th, tw) block.

    Tables are psum'd over the ``tiles`` axis so every shard sees its
    image's full statistics; the rANS fold and the interleave pack stay
    shard-local (one interleave group per shard).  Tiles past ``t_real``
    (mesh padding) contribute nothing: they are masked out of the table
    moments and encoded as identity lanes."""
    from ..models import tiled

    shard = jax.lax.axis_index("tiles")
    t_loc = tiles.shape[1]
    gidx = shard * t_loc + jnp.arange(t_loc)
    valid = gidx < t_real

    def one_image(img_tiles):
        x = img_tiles.astype(jnp.int32)
        px0, err, qd, adr = jax.vmap(model_stage1)(x)
        vmask = jnp.broadcast_to(valid[:, None, None], adr.shape)
        adr_m = jnp.where(vmask, adr, Q_N_CONTEXT - 1)
        err_m = jnp.where(vmask, err, 0)
        sums, cnts = ctx_ops.bias_moments(adr_m, err_m, Q_N_CONTEXT)
        cnts = cnts - jnp.zeros_like(cnts).at[Q_N_CONTEXT - 1].add(
            jnp.sum(~valid) * x.shape[1] * x.shape[2]
        )
        sums = jax.lax.psum(sums, "tiles")
        cnts = jax.lax.psum(cnts, "tiles")
        bias = ctx_ops.quantize_bias(sums, cnts)
        px, sign = ctx_ops.apply_static_bias(bias, adr, px0)
        y = ctx_ops.residual_fold(x, px, sign, 0)
        idx = qd.reshape(-1) * N_SYM + y.reshape(-1)
        hist = ctx_ops.pair_segment_sum(
            jnp.where(vmask.reshape(-1), idx, 0), None, N_QD * N_SYM
        )
        hist = hist.at[0].add(-jnp.sum(~vmask.reshape(-1)))
        hist = jax.lax.psum(hist.reshape(N_QD, N_SYM), "tiles")
        # allow_pallas=False: this call sits under shard_map + vmap, where
        # a batched Mosaic fold would fall off the fast path (and the CPU
        # mesh tests have no Mosaic at all)
        packed = tiled._finish_encode_device(
            y, qd, bias, g_lanes=g_lanes, hist_in=hist, valid=valid,
            allow_pallas=False,
        )
        return packed

    return jax.vmap(one_image)(tiles)


def sharded_encode_batch(mesh: Mesh, t_total: int, n_imgs: int, t_real: int):
    """jit: full NBTC profile-1 encode, images over ``data``, tiles over
    ``tiles``; returns per-image packed buffers (one interleave group per
    tile shard)."""
    n_t = mesh.shape["tiles"]
    if t_total % n_t or n_imgs % mesh.shape["data"]:
        raise ValueError("batch/tile axes must divide the mesh")
    g_lanes = t_total // n_t

    fn = jax.shard_map(
        functools.partial(_encode_full_local, g_lanes=g_lanes, t_real=t_real),
        mesh=mesh,
        in_specs=(P("data", "tiles", None, None),),
        out_specs=P("data", "tiles"),
    )
    return jax.jit(fn), g_lanes


def encode_batch_mesh(imgs, mesh: Mesh, tile_h: int = 64, tile_w: int = 64):
    """Host driver: encode same-shape images over a data x tiles mesh into
    standard NBTC profile-1 containers (bit-compatible with the
    single-device decoder — the group width is recorded per container)."""
    from ..models import tiled
    from ..utils.container import NbtcHeader, check_size

    imgs = [np.ascontiguousarray(im, dtype=np.uint8) for im in imgs]
    h, w = imgs[0].shape
    check_size(h, w)
    tiles = np.stack([tiled.to_tiles(im, tile_h, tile_w) for im in imgs])
    n_imgs, t_real = tiles.shape[:2]
    n_t = mesh.shape["tiles"]
    tiles = np.stack([pad_to_multiple(t, n_t) for t in tiles])
    t_total = tiles.shape[1]
    fn, g_lanes = sharded_encode_batch(mesh, t_total, n_imgs, t_real)
    arr = jax.device_put(
        jnp.asarray(tiles), NamedSharding(mesh, P("data", "tiles", None, None))
    )
    packed = np.asarray(fn(arr))
    # each tile shard emitted [totals(1) | bias | hist | payload]; reorder
    # into the container layout [all totals | bias | hist | all payloads]
    # (bias/hist are psum-replicated — take shard 0's copy)
    seg = packed.shape[1] // n_t
    shards = packed.reshape(n_imgs, n_t, seg)
    tables_len = Q_N_CONTEXT + 12 * 256
    flat = np.concatenate(
        [
            shards[:, :, 0],
            shards[:, 0, 1 : 1 + tables_len],
            shards[:, :, 1 + tables_len :].reshape(n_imgs, -1),
        ],
        axis=1,
    )
    return tiled._unpack_containers(
        flat, n_imgs, t_real, h, w, tile_h, tile_w, 0, 1,
        g_lanes=g_lanes, t_packed=t_total,
    )


def sharded_decode_batch(mesh: Mesh, th: int, tw: int, near: int, g: int,
                         profile: int):
    """jit: full NBTC profile-1/2 decode, images over ``data``, each
    image's interleave groups over ``tiles`` (the decode twin of
    ``sharded_encode_batch``; groups are independent streams, so the body
    is collective-free — pure partitioned work, SURVEY §7.1.5)."""
    from ..models import tiled

    def local(streams, n_active, bias, hist_n, acc, lut, wcols):
        fn = functools.partial(
            tiled._group_decode_scan, th=th, tw=tw, near=near, g=g,
            profile=profile,
        )
        per_image = jax.vmap(fn, in_axes=(0, 0, None, None, None, None, 0))
        return jax.vmap(per_image)(
            streams, n_active, bias, hist_n, acc, lut, wcols
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("data", "tiles", None), P("data", "tiles"),
            P("data", None), P("data", None, None), P("data", None, None),
            P("data", None), P("data", "tiles", None, None),
        ),
        out_specs=P("data", "tiles", None, None, None),
        # the decode scan creates fresh (device-varying) carries inside the
        # body; the static varying-axes check can't see that they never mix
        # across shards, so it rejects the scan — the body is collective-free
        # and per-shard independent, making the check vacuous here
        check_vma=False,
    )
    return jax.jit(fn)


def decode_batch_mesh(streams: list[bytes], mesh: Mesh) -> list:
    """Host driver: decode same-geometry profile-1/2 NBTC containers over a
    data x tiles mesh, bit-identical to models/tiled.decode_batch.

    Images are padded (repeat-last) to the ``data`` axis and each image's
    group axis is padded with inactive groups (n_active=0) to the ``tiles``
    axis; pads are dropped on the host."""
    import numpy as np

    from ..models import tiled

    parsed = [tiled._Parsed(s) for s in streams]
    h0 = parsed[0].hdr
    if any(
        (p.hdr.height, p.hdr.width, p.hdr.tile_h, p.hdr.tile_w, p.hdr.near,
         p.hdr.profile, p.group_size)
        != (h0.height, h0.width, h0.tile_h, h0.tile_w, h0.near, h0.profile,
            parsed[0].group_size)
        for p in parsed
    ):
        raise ValueError("decode_batch_mesh requires same-geometry streams")
    if h0.profile not in (1, 2):
        raise ValueError(f"mesh decode supports profiles 1/2, got {h0.profile}")

    b = len(streams)
    n_data, n_t = mesh.shape["data"], mesh.shape["tiles"]
    gsz = parsed[0].group_size
    wmax = tiled._bucket(max(int(p.counts.max()) for p in parsed))

    stream_mat = np.stack([p.stream_matrix(wmax) for p in parsed])
    n_active = np.stack([p.n_active() for p in parsed])
    wcols = np.stack([p.weight_cols() for p in parsed])
    biases = np.stack([p.bias for p in parsed])
    hist_ns = np.stack([p.hist_n for p in parsed])
    accs = np.stack([p.acc for p in parsed])
    luts = np.stack([p.lut.reshape(-1) for p in parsed])

    # pad groups to the tiles axis, images to the data axis
    g_pad = (-stream_mat.shape[1]) % n_t
    if g_pad:
        stream_mat = np.pad(stream_mat, ((0, 0), (0, g_pad), (0, 0)))
        n_active = np.pad(n_active, ((0, 0), (0, g_pad)))
        wcols = np.pad(wcols, ((0, 0), (0, g_pad), (0, 0), (0, 0)))
    b_pad = (-b) % n_data
    if b_pad:
        rep = lambda a: np.concatenate(  # noqa: E731
            [a, np.repeat(a[-1:], b_pad, axis=0)]
        )
        stream_mat, n_active, wcols = map(rep, (stream_mat, n_active, wcols))
        biases, hist_ns, accs, luts = map(rep, (biases, hist_ns, accs, luts))

    fn = sharded_decode_batch(
        mesh, h0.tile_h, h0.tile_w, h0.near, gsz, h0.profile
    )
    sh = lambda *spec: NamedSharding(mesh, P(*spec))  # noqa: E731
    tiles = np.asarray(fn(
        jax.device_put(stream_mat, sh("data", "tiles", None)),
        jax.device_put(n_active, sh("data", "tiles")),
        jax.device_put(biases, sh("data", None)),
        jax.device_put(hist_ns, sh("data", None, None)),
        jax.device_put(accs, sh("data", None, None)),
        jax.device_put(luts, sh("data", None)),
        jax.device_put(wcols, sh("data", "tiles", None, None)),
    ))
    out = []
    for bi in range(b):
        lanes = tiles[bi].reshape(-1, h0.tile_h, h0.tile_w)[: h0.n_tiles]
        img = tiled.from_tiles(
            lanes.astype(np.uint8), h0.height, h0.width, h0.tile_h, h0.tile_w
        )
        if parsed[bi].hdr.transposed:
            img = np.ascontiguousarray(img.T)
        out.append(img)
    return out


# ---------------------------------------------------------------------------
# profile-3 (adaptive strip engine): pure data-parallel SPMD
# ---------------------------------------------------------------------------


def p3_encode_batch_mesh(imgs, mesh: Mesh, th: int | None = None,
                         near: int = 0) -> list[bytes]:
    """Profile-3 encode with images sharded over the mesh's ``data`` axis.

    Strips/images are independent lanes in the profile-3 engine, so the
    batched model+code programs partition as pure data parallelism — the
    same jitted programs as models/strips.encode_batch, with the batch
    axis sharded (GSPMD inserts no collectives on the compute path).
    Containers are bit-identical to the single-device encoder's."""
    from ..models import strips

    n_data = mesh.shape["data"]
    b = len(imgs)
    b_pad = (-b) % n_data
    imgs = list(imgs) + [imgs[-1]] * b_pad
    th = strips.TH_DEFAULT if th is None else th
    sharding = NamedSharding(mesh, P("data", None, None, None))
    work = _p3_dispatch_sharded(imgs, th, near, sharding)
    return strips._encode_finalize(work)[:b]


def _p3_dispatch_sharded(imgs, th: int, near: int, sharding):
    """strips._encode_dispatch with the image batch sharded over a mesh."""
    from ..models import strips

    imgs = [np.ascontiguousarray(im, dtype=np.uint8) for im in imgs]
    dims = [im.shape for im in imgs]
    tflags = [h < w for h, w in dims]  # portrait normalization (round 4)
    imgs = [
        np.ascontiguousarray(im.T) if t else im
        for im, t in zip(imgs, tflags)
    ]
    h, w = imgs[0].shape
    for im in imgs:
        if im.shape != (h, w):
            raise ValueError("mesh encode requires same-shape images")
    if near:
        # the mesh near path runs the vmapped feedback scan as ONE
        # program; keep it under the platform's single-program execution
        # bound (the single-host path chunks tall strips instead)
        th = min(th, strips.SEG_ROWS)
    th = min(th, -(-h // strips.N_PHASE) * strips.N_PHASE)
    tile_stack = np.stack([strips._to_strips(im, th) for im in imgs])
    s = tile_stack.shape[1]
    xs = jax.device_put(jnp.asarray(tile_stack), sharding)
    tune = (
        strips.TUNE._replace(seg_bias=0, seg_map=0, seg_stats=0,
                             sym_bias=0, w_pred=0)
        if near else strips.TUNE
    )
    with jax.enable_x64():
        if near:
            lens_d, flats_d = strips._code_near_batch_jit(
                xs, near, strips.AVP_N, tune
            )
        else:
            seg_w = (
                xs.shape[-1] // strips._eff_seg(tune.n_seg, xs.shape[-1])
                if tune.seg_stats else 0
            )
            planes = strips._model_batch_jit(
                xs, strips.AVP_N, False, seg_w, bool(tune.mix_e),
                bool(tune.w_pred),
            )
            lens_d, flats_d = strips._code_batch_jit(
                *planes, tune
            )
    return (lens_d, flats_d, dims, tflags, s, th, near, tune)


def p3_decode_batch_mesh(streams: list[bytes], mesh: Mesh) -> list:
    """Profile-3 decode with image lanes sharded over ``data``.

    The decode scan's lanes are images x strips; sharding the lane axis by
    image keeps every per-lane walk local (the per-image mapper/bias table
    reductions psum across shards, a few KB per row)."""
    from ..models import strips

    n_data = mesh.shape["data"]
    b = len(streams)
    b_pad = (-b) % n_data
    streams = list(streams) + [streams[-1]] * b_pad

    parsed = [strips._parse(x) for x in streams]
    geom0 = parsed[0][0]

    def plane_geom(g):
        h_i, w_i, s_i, th_i, t_i, nf_i, nr_i, rm_i = g
        # encoded planes are orientation-normalized by the encoder
        return (s_i, th_i, (h_i if t_i else w_i), nf_i, nr_i, rm_i)

    if any(plane_geom(p[0]) != plane_geom(geom0) or p[1].size
           for p in parsed):
        raise ValueError(
            "p3 mesh decode requires same-geometry adaptive containers"
        )
    s, th, ww, n_feat, near, tune = plane_geom(geom0)
    n_imgs = len(streams)
    wmax = max(2, max(int(p[2].max()) for p in parsed))
    wmax = -(-wmax // 64) * 64
    smat = np.concatenate(
        [rans.pad_streams(p[3], p[2], wmax) for p in parsed]
    ).astype(np.uint16).view(np.int16)
    bias = np.zeros((n_imgs, Q_N_CONTEXT), np.int32)
    with jax.enable_x64():
        px = strips._run_decode(
            jax.device_put(
                jnp.asarray(smat.reshape(n_imgs * s, strips.N_PHASE, wmax)),
                NamedSharding(mesh, P("data", None, None)),
            ),
            jax.device_put(
                jnp.asarray(bias), NamedSharding(mesh, P("data", None))
            ),
            th, ww, s, n_imgs, True, n_feat, near, tune,
        )
    if ww % 4 == 0:
        px = np.ascontiguousarray(px).view(np.uint8).reshape(
            px.shape[0], th, ww
        )
    out = []
    for bi in range(b):
        h_i, w_i, _, _, t_i, _, _, _ = parsed[bi][0]
        hh_i = w_i if t_i else h_i
        plane = px[bi * s : (bi + 1) * s].reshape(s * th, ww)[:hh_i]
        out.append(
            np.asarray(plane.T if t_i else plane, np.uint8, order="C")
        )
    return out


def pad_to_multiple(tiles: np.ndarray, n: int) -> np.ndarray:
    """Pad the tile axis so it divides the mesh size (encoders drop the pad)."""
    t = tiles.shape[0]
    rem = (-t) % n
    if rem == 0:
        return tiles
    pad = np.repeat(tiles[-1:], rem, axis=0)
    return np.concatenate([tiles, pad], axis=0)
