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


def sharded_decode_groups(mesh: Mesh, axis_name: str = "tiles"):
    """jit: profile-1 group decode with the group axis sharded over the
    mesh's ``tiles`` axis (tables replicated; each shard decodes its own
    interleaved groups)."""
    from ..models import tiled

    def local(streams, n_active, bias, hist_n, acc, lut, wcols, th, tw,
              near, g, profile):
        fn = functools.partial(
            tiled._group_decode_scan, th=th, tw=tw, near=near, g=g,
            profile=profile,
        )
        return jax.vmap(fn, in_axes=(0, 0, None, None, None, None, 0))(
            streams, n_active, bias, hist_n, acc, lut, wcols
        )

    def run(streams, n_active, bias, hist_n, acc, lut, wcols, th, tw, near,
            g, profile):
        fn = jax.shard_map(
            functools.partial(local, th=th, tw=tw, near=near, g=g,
                              profile=profile),
            mesh=mesh,
            in_specs=(
                P(axis_name, None), P(axis_name), P(None), P(None, None),
                P(None, None), P(None), P(axis_name, None, None),
            ),
            out_specs=P(axis_name, None, None, None),
        )
        return fn(streams, n_active, bias, hist_n, acc, lut, wcols)

    return run


def pad_to_multiple(tiles: np.ndarray, n: int) -> np.ndarray:
    """Pad the tile axis so it divides the mesh size (encoders drop the pad)."""
    t = tiles.shape[0]
    rem = (-t) % n
    if rem == 0:
        return tiles
    pad = np.repeat(tiles[-1:], rem, axis=0)
    return np.concatenate([tiles, pad], axis=0)
