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


def pad_to_multiple(tiles: np.ndarray, n: int) -> np.ndarray:
    """Pad the tile axis so it divides the mesh size (encoders drop the pad)."""
    t = tiles.shape[0]
    rem = (-t) % n
    if rem == 0:
        return tiles
    pad = np.repeat(tiles[-1:], rem, axis=0)
    return np.concatenate([tiles, pad], axis=0)
