"""Hypothesis test (offline, CPU): predictor mixing vs hard fallback.

The flagship predicts px0 = AVP solve when the system is nonsingular else
the simple predictor (hard fallback).  The reference instead lets sample
weights blend influence smoothly (error-energy weights inside AVP,
NBLIC.c:257-262).  VERDICT r4 suggests mixing the two PREDICTIONS by
local reliability.  This script measures, whole-plane on Kodak images,
the code-length proxy of:
  hard   : current contract
  mix(C) : px0 = (px_a*(E_s+C) + px_s*(E_a+C)) / (E_a+E_s+2C), with E_*
           causal spatially-decayed |err| energies via the same B/E/F
           chain machinery the AVP stats use (replayable by the decoder)

Proxy: sum log2(1 + 2|err|) (Laplacian code length up to a constant) —
good enough to rank predictors; a real encode sweep confirms winners.
"""

import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from nblic_tpu.models import strips
from nblic_tpu.ops import pavp
from nblic_tpu.ops.neighbors import sample
from nblic_tpu.ops.predict import simple_predict
from nblic_tpu.utils import imageio


def avp_raw(x, n):
    """predict_plane's body, returning (px_avp int32, ok, px_s) planes."""
    s, h, w = x.shape
    x32 = x.astype(jnp.int32)
    nb = sample(x32)
    px_s = simple_predict(nb)
    x64 = x.astype(jnp.int64)
    d64 = nb.d.astype(jnp.int64)
    up2r = jnp.roll(jnp.roll(x64, 1, axis=1), -2, axis=2)
    t_ok = (jnp.arange(h)[None, :, None] >= 1) & (
        jnp.arange(w)[None, None, :] + 2 < w
    )
    t_tap = jnp.where(t_ok, up2r, d64)
    taps = (nb.a, nb.b, nb.c, nb.d, nb.e, nb.f, t_tap, nb.h, nb.q, nb.g,
            nb.r, nb.s)
    feats = jnp.stack(
        [jnp.asarray(v, jnp.int64) - pavp.FIT_BASE for v in taps[:n]]
    )
    s_curr = jnp.abs(x64 - px_s.astype(jnp.int64)) << pavp.FB1

    def run_chains(contrib, first_beta=True):
        c = contrib.shape[0]
        b_in = contrib.transpose(2, 0, 1, 3).reshape(h, c, s * w)
        b_new = pavp.col_chain(b_in, first_beta).reshape(
            h, c, s, w
        ).transpose(1, 2, 0, 3)
        b_prev = jnp.concatenate(
            [jnp.zeros_like(b_new[:, :, :1]), b_new[:, :, :-1]], axis=2
        )
        e_in = b_new.transpose(3, 0, 1, 2).reshape(w, c, s * h)
        e = pavp.e_chain(e_in, first_beta).reshape(
            w, c, s, h
        ).transpose(1, 2, 3, 0)
        f_in = b_prev.transpose(3, 0, 1, 2).reshape(w, c, s * h)
        f = pavp.f_chain(f_in, first_beta).reshape(
            w, c, s, h
        ).transpose(1, 2, 3, 0)
        return e + f

    ef0 = run_chains(s_curr[None])[0]
    s_sum = ef0 + pavp.tdiv(s_curr * pavp.BETA, jnp.int64(pavp.BETA - 1))
    contrib = pavp.contributions(
        x64.reshape(-1), feats.reshape(n, -1), s_curr.reshape(-1),
        s_sum.reshape(-1), n,
    ).reshape(-1, s, h, w)
    stats = run_chains(contrib[1:], first_beta=False)
    stats_flat = jnp.concatenate(
        [ef0.reshape(1, -1), stats.reshape(n + n * n, -1)]
    )
    px_f, ok = pavp.predict_chunked(stats_flat, feats.reshape(n, -1), n)
    px_a = ((px_f + (1 << (pavp.FB1 - 1))) >> pavp.FB1).astype(
        jnp.int32
    ).reshape(s, h, w)
    return px_a, ok.reshape(s, h, w), px_s, run_chains


def main():
    n = strips.AVP_N
    k = sys.argv[1:] or ["03", "05", "08", "13", "20", "23"]
    tot = {}
    with jax.enable_x64():
        for name in k:
            img = imageio.load_image(f"/root/reference/img_kodak/{name}.bmp")
            if img.shape[0] < img.shape[1]:
                img = np.ascontiguousarray(img.T)
            x = jnp.asarray(img[None], jnp.int64)
            px_a, ok, px_s, run_chains = avp_raw(x, n)
            px_hard = jnp.where(ok, px_a, px_s)
            x32 = x.astype(jnp.int32)

            def cost(px0):
                e = jnp.abs(x32 - px0)
                return float(jnp.sum(jnp.log2(1.0 + 2.0 * e)))

            res = {"hard": cost(px_hard), "simple": cost(px_s)}

            # causal decayed |err| energies of each predictor (hard-ok
            # applied to the AVP one so both sides can replay it)
            pa64 = px_hard.astype(jnp.int64)
            ps64 = px_s.astype(jnp.int64)
            c_a = (jnp.abs(x - pa64) << pavp.FB1)[None][0][None]
            c_s = (jnp.abs(x - ps64) << pavp.FB1)[None][0][None]
            e_a = run_chains(c_a)[0]
            e_s = run_chains(c_s)[0]
            for cbits in (0, 2, 4, 6):
                c = jnp.int64(1) << (pavp.FB1 + cbits)
                den = e_a + e_s + 2 * c
                num = pa64 * (e_s + c) + ps64 * (e_a + c) + (den >> 1)
                px_m = jnp.where(ok, (num // den).astype(jnp.int32), px_s)
                res[f"mix_c{cbits}"] = cost(px_m)
            # squared energies: sharper weights (near-hard when one
            # predictor clearly dominates)
            sh = 12  # pre-square downshift keeps products in int64
            ea2 = (e_a >> sh) * (e_a >> sh)
            es2 = (e_s >> sh) * (e_s >> sh)
            for cbits in (0, 4, 8):
                c = jnp.int64(1) << cbits
                den = ea2 + es2 + 2 * c
                num = pa64 * (es2 + c) + ps64 * (ea2 + c) + (den >> 1)
                px_m = jnp.where(ok, (num // den).astype(jnp.int32), px_s)
                res[f"mix2_c{cbits}"] = cost(px_m)
            # capped blend: simple's weight limited to <= 1/2K
            for kcap in (2, 3):
                c = jnp.int64(1) << pavp.FB1
                den = e_a + e_s + 2 * c
                wq = jnp.minimum(
                    ((e_a + c) << 8) // den, jnp.int64(256 >> kcap)
                )
                px_m = pa64 + (((ps64 - pa64) * wq + 128) >> 8)
                px_m = jnp.where(ok, px_m.astype(jnp.int32), px_s)
                res[f"mixcap{kcap}"] = cost(px_m)
            base = res["hard"]
            print(name, {kk: round(v - base, 1) for kk, v in res.items()},
                  flush=True)
            for kk, v in res.items():
                tot[kk] = tot.get(kk, 0.0) + v - base
    print("TOTAL delta-bits vs hard:", {k2: round(v, 1) for k2, v in tot.items()})
    npx = 393216 * len(k)
    print("delta-bpp:", {k2: round(v / npx, 5) for k2, v in tot.items()})


if __name__ == "__main__":
    main()
