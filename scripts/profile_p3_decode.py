"""Ablation profile of the profile-3 decode critical path on the chip.

Times `strips._decode_seg` marginally (1-vs-2 in-program iterations; the
only honest timing method on the tunneled TPU) with components disabled
one at a time (`_ablate`), at both the flagship tune (TUNE_V3) and the
serving tune (TUNE_V3S), 24 lanes.  The per-component time = full - ablated
identifies where the 6x decode-speed gap to the reference class lives.

Usage: python scripts/profile_p3_decode.py [rows=64] [tunes=v3,v3s]
       [mode=full|base]   (base: no ablations, plus a round-trip check)
"""

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from nblic_tpu.models import strips
from nblic_tpu.ops import rans as rans_ops
from nblic_tpu.utils import imageio

ABLATIONS = [
    (),            # full walk (baseline)
    ("avp",),      # - int64 AVP predict (+update / presolve)
    ("fetch",),    # - per-bin stream-word gather
    ("unary",),    # - unary bin walk
    ("refine",),   # - refine/escape bins
    ("mapper",),   # - mapper gathers
    ("bias",),     # - bias gather
    ("unary", "refine"),            # - whole entropy walk
    ("avp", "unary", "refine", "mapper", "bias", "fetch"),  # skeleton
]


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    which = (sys.argv[2].split(",") if len(sys.argv) > 2 else ["v3", "v3s"])
    imgs = [
        imageio.load_image(str(p))
        for p in sorted(Path("/root/reference/img_kodak").glob("*.bmp"))
    ]
    imgs = [
        np.ascontiguousarray(im.T) if im.shape[0] < im.shape[1] else im
        for im in imgs
    ]

    mode = sys.argv[3] if len(sys.argv) > 3 else "full"
    ablations = [()] if mode == "base" else ABLATIONS
    tunes = {"v3": strips.TUNE_V3, "v3s": strips.TUNE_V3S,
             "v4": strips.TUNE_V4, "v4s": strips.TUNE_V4S,
             "max": strips.TUNE_MAX}
    for tname in which:
        tune = tunes[tname]
        old = strips.TUNE
        try:
            strips.TUNE = tune
            groups = [imgs[i : i + 6] for i in range(0, len(imgs), 6)]
            streams = [s for ss in strips.encode_batches(groups) for s in ss]
        finally:
            strips.TUNE = old
        if mode == "base":
            bpp = 8.0 * sum(len(s) for s in streams) / sum(
                im.size for im in imgs
            )
            decs = strips.decode_batch(streams[:6])
            ok = all(np.array_equal(d, im)
                     for im, d in zip(imgs[:6], decs))
            print(json.dumps({"tune": tname, "bpp": round(bpp, 4),
                              "roundtrip6_ok": bool(ok)}), flush=True)
        parsed = [strips._parse(s) for s in streams]
        s_cnt = parsed[0][0][2]
        ww = parsed[0][0][0] if parsed[0][0][4] else parsed[0][0][1]
        wmax = -(-max(2, max(int(p[2].max()) for p in parsed)) // 64) * 64
        n_str = len(parsed)
        smat_np = np.concatenate(
            [rans_ops.pad_streams(p[3], p[2], wmax) for p in parsed]
        ).astype(np.uint16).view(np.int16)
        smat = jnp.asarray(
            smat_np.reshape(n_str * s_cnt, strips.N_PHASE, wmax)
        )
        bias = jnp.zeros((n_str, 1), jnp.int32)
        px_seg = n_str * s_cnt * rows * ww

        def make_loop(ablate):
            @functools.partial(jax.jit, static_argnums=(1,))
            def loop(sm, n):
                sm32 = sm.astype(jnp.int32) & 0xFFFF

                def body(_, acc):
                    s2 = sm32 ^ (acc & 1)
                    carry = strips._decode_carry_init(
                        s2, n_str, s_cnt, ww, strips.AVP_N, 0, tune
                    )
                    _, px = strips._decode_seg(
                        carry, s2, bias, jnp.int32(0), rows, ww, s_cnt,
                        n_str, True, strips.AVP_N, 0, tune, ablate,
                    )
                    return px.reshape(-1)[:1].astype(jnp.int32)

                return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.int32))

            return loop

        base_t = None
        for ablate in ablations:
            loop = make_loop(ablate)
            with jax.enable_x64():
                np.asarray(loop(smat, 1))
                np.asarray(loop(smat, 2))
                t0 = time.perf_counter()
                np.asarray(loop(smat, 1))
                t_lo = time.perf_counter() - t0
                t0 = time.perf_counter()
                np.asarray(loop(smat, 2))
                t_hi = time.perf_counter() - t0
            t = max(t_hi - t_lo, 1e-9)
            if ablate == ():
                base_t = t
            print(json.dumps({
                "tune": tname,
                "ablate": list(ablate),
                "seg_s": round(t, 3),
                "mpix_s": round(px_seg / t / 1e6, 3),
                "saved_s": round(base_t - t, 3) if ablate else 0.0,
                "saved_pct": (
                    round(100 * (base_t - t) / base_t, 1) if ablate else 0.0
                ),
            }), flush=True)


if __name__ == "__main__":
    main()
