"""Adaptive small-symbol re-ranking permutations ("AutoMapper") as array ops.

512 independent rank permutations over the 20 smallest residuals, keyed by
(corrected prediction, sign); a hit bubbles the symbol toward rank 0 when its
frequency passes its neighbor's (NBLIC.c:470-523).  State is a triple of
(512, 20) int32 arrays carried through the codec scan; the bubble swap is
expressed functionally with masked scatters.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

N_MAPPER = 20
N_KEYS = 512  # 256 px values x 2 signs


class MapperState(NamedTuple):
    to_rank: jnp.ndarray  # (512, 20) y -> z
    from_rank: jnp.ndarray  # (512, 20) z -> y
    freq: jnp.ndarray  # (512, 20) rank-slot frequencies


def init_mappers() -> MapperState:
    ranks = jnp.tile(jnp.arange(N_MAPPER, dtype=jnp.int32), (N_KEYS, 1))
    freq0 = jnp.tile(
        ((N_MAPPER - 1 - jnp.arange(N_MAPPER, dtype=jnp.int32)) * 2), (N_KEYS, 1)
    )
    return MapperState(ranks, ranks, freq0)


def fold(m: MapperState, key, y):
    """mapYtoZ (NBLIC.c:487-489)."""
    yc = jnp.minimum(y, N_MAPPER - 1)
    return jnp.where(y < N_MAPPER, m.to_rank[key, yc], y)


def unfold(m: MapperState, key, z):
    """mapZtoY (NBLIC.c:492-494)."""
    zc = jnp.minimum(z, N_MAPPER - 1)
    return jnp.where(z < N_MAPPER, m.from_rank[key, zc], z)


def observe(m: MapperState, key, y) -> MapperState:
    """addY (NBLIC.c:497-523): bump frequency, bubble-swap adjacent ranks."""
    do = y < N_MAPPER
    yc = jnp.minimum(y, N_MAPPER - 1)
    to_rank, from_rank, freq = m
    z = to_rank[key, yc]
    freq = freq.at[key, z].add(jnp.where(do, 1, 0))
    zu = jnp.maximum(z - 1, 0)
    yu = from_rank[key, zu]
    f = freq[key, z]
    fu = freq[key, zu]
    swap = do & (z > 0) & (fu < f)
    freq = freq.at[key, z].set(jnp.where(swap, fu, f))
    freq = freq.at[key, zu].set(jnp.where(swap, f, fu))
    from_rank = from_rank.at[key, z].set(jnp.where(swap, yu, from_rank[key, z]))
    from_rank = from_rank.at[key, zu].set(jnp.where(swap, yc, from_rank[key, zu]))
    to_rank = to_rank.at[key, yc].set(jnp.where(swap, zu, to_rank[key, yc]))
    to_rank = to_rank.at[key, yu].set(jnp.where(swap, z, to_rank[key, yu]))
    return MapperState(to_rank, from_rank, freq)
