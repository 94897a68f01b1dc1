"""Microbenchmark: cost model of small gathers inside a TPU scan.

Decides the p3 decode fetch strategy: is take_along_axis inside a
sequential scan per-OP bound (~1 us each, so batching 21 fetches into one
prefetch wins 20x) or per-ELEMENT bound (~25-40 ns/elem, so batching wins
nothing)?  Also times the one-hot buffered read alternative.

Marginal method (1-vs-2 in-program loop) on the real chip.
"""

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

LANES = 24
NP16 = 16
WMAX = 4096
STEPS = 4096


def timed(fn, *args):
    np.asarray(fn(*args, 1))
    np.asarray(fn(*args, 2))
    t0 = time.perf_counter()
    np.asarray(fn(*args, 1))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(fn(*args, 2))
    t_hi = time.perf_counter() - t0
    return max(t_hi - t_lo, 1e-9)


def main():
    rng = np.random.default_rng(0)
    words = jnp.asarray(
        rng.integers(0, 1 << 15, size=(LANES, NP16 * WMAX), dtype=np.int32)
    )

    def scan_of(body):
        @functools.partial(jax.jit, static_argnums=(1,))
        def loop(w, n):
            def outer(_, acc):
                def step(c, i):
                    return body(c, i, w), None

                c, _ = jax.lax.scan(
                    step, acc, jnp.arange(STEPS, dtype=jnp.int32)
                )
                return c

            return jax.lax.fori_loop(0, n, outer, jnp.zeros((LANES,), jnp.int32))

        return loop

    # A: K independent small gathers of (LANES,) each per step
    def body_k_gathers(k):
        def body(c, i, w):
            acc = c
            for j in range(k):
                idx = (c + i * 7 + j * 131) % (NP16 * WMAX)
                acc = acc + jnp.take_along_axis(w, idx[:, None], axis=1)[:, 0]
            return acc % 4096

        return body

    # B: one (LANES, 16) gather per step
    def body_batched(c, i, w):
        idx = (c[:, None] + i * 7
               + jnp.arange(NP16, dtype=jnp.int32)[None, :] * 131) % (
            NP16 * WMAX
        )
        vals = jnp.take_along_axis(w, idx, axis=1)
        return (c + jnp.sum(vals, axis=1, dtype=jnp.int32)) % 4096

    # C: one-hot read from a (LANES, 64) buffer, 21 reads per step
    def body_onehot(c, i, w):
        buf = jax.lax.dynamic_slice(
            w, (0, 0), (LANES, 64)
        ).astype(jnp.float32)
        acc = c
        for j in range(21):
            off = (c + i + j * 13) % 64
            oh = jax.nn.one_hot(off, 64, dtype=jnp.float32)
            acc = acc + jnp.sum(buf * oh, axis=1).astype(jnp.int32)
        return acc % 4096

    # gather-size scaling: one (LANES, K) gather per step
    def body_batched_k(k):
        def body(c, i, w):
            idx = (c[:, None] + i * 7
                   + jnp.arange(k, dtype=jnp.int32)[None, :] * 131) % (
                NP16 * WMAX
            )
            vals = jnp.take_along_axis(w, idx, axis=1)
            return (c + jnp.sum(vals, axis=1, dtype=jnp.int32)) % 4096

        return body

    legs = [
        ("gather_x1", scan_of(body_k_gathers(1)), 1),
        ("gather_x4", scan_of(body_k_gathers(4)), 4),
        ("gather_x21", scan_of(body_k_gathers(21)), 21),
        ("gather_batched16", scan_of(body_batched), 16),
        ("gather_batched64", scan_of(body_batched_k(64)), 64),
        ("gather_batched256", scan_of(body_batched_k(256)), 256),
        ("onehot64_x21", scan_of(body_onehot), 21),
    ]
    for name, loop, k in legs:
        t = timed(loop, words)
        print(json.dumps({
            "leg": name,
            "s": round(t, 4),
            "ns_per_step": round(t / STEPS * 1e9, 1),
            "ns_per_read": round(t / STEPS / max(k, 1) * 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
