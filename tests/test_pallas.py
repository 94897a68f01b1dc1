"""Mosaic decode kernel vs the XLA reference decoder (interpret mode, CPU)."""

import numpy as np
import pytest

from nblic_tpu.models import tiled


def _pallas_decode(stream: bytes) -> np.ndarray:
    import jax.numpy as jnp

    from nblic_tpu.ops import pallas_decode

    p = tiled._Parsed(stream)
    hdr = p.hdr
    assert hdr.profile in (1, 2)
    wmax = tiled._bucket(int(p.counts.max()))
    tiles = pallas_decode.decode_groups_pallas(
        jnp.asarray(p.stream_matrix32((wmax + 1) // 2)),
        jnp.asarray(p.n_active()),
        jnp.asarray(p.bias)[None],
        jnp.asarray(p.hist_n)[None],
        jnp.asarray(p.acc)[None],
        jnp.asarray(p.weight_cols()),
        hdr.tile_h,
        hdr.tile_w,
        hdr.near,
        p.group_size,
        hdr.profile,
        True,  # interpret
    )
    tiles = np.asarray(tiles, dtype=np.uint8).reshape(
        -1, hdr.tile_h, hdr.tile_w
    )[: hdr.n_tiles]
    return tiled.from_tiles(tiles, hdr.height, hdr.width, hdr.tile_h, hdr.tile_w)


class TestPallasDecode:
    def test_matches_xla_decoder(self, rng):
        img = rng.integers(0, 256, size=(70, 90), dtype=np.uint8)
        stream = tiled.encode(img, tile_h=16, tile_w=16)
        np.testing.assert_array_equal(_pallas_decode(stream), img)
        np.testing.assert_array_equal(tiled.decode(stream), img)

    @pytest.mark.parametrize("near", [2])
    def test_near_lossless(self, rng, near):
        img = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
        stream = tiled.encode(img, near=near, tile_h=16, tile_w=16)
        dec = _pallas_decode(stream)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= near
        np.testing.assert_array_equal(dec, tiled.decode(stream))

    def test_profile2(self, rng):
        yy, xx = np.mgrid[0:64, 0:128]
        smooth = ((yy + xx) % 250).astype(np.uint8)
        stream = tiled.encode(smooth, effort=2)
        np.testing.assert_array_equal(_pallas_decode(stream), smooth)

    def test_multi_group(self, rng):
        # force >1 interleave group (> 128 tiles of 8x8)
        img = rng.integers(0, 256, size=(96, 104), dtype=np.uint8)
        stream = tiled.encode(img, tile_h=8, tile_w=8)
        p = tiled._Parsed(stream)
        assert len(p.counts) > 1
        np.testing.assert_array_equal(_pallas_decode(stream), img)


class TestPallasFold:
    """Mosaic rANS encode fold vs ops/rans.encode_scan (interpret mode)."""

    def test_matches_encode_scan(self, rng):
        import jax
        import jax.numpy as jnp

        from nblic_tpu.ops import pallas_fold, rans

        s, l = 200, 512
        freq = rng.integers(1, 32768, size=(s, l)).astype(np.uint32)
        freq[:5] = 32768  # identity lanes (pad-lane case)
        acc = rng.integers(0, 1 << 14, size=(s, l)).astype(np.uint32)
        acc[:5] = 0
        w1, e1, s1 = jax.jit(rans.encode_scan)(
            jnp.asarray(freq), jnp.asarray(acc)
        )
        w2, e2, s2 = pallas_fold.encode_fold(
            jnp.asarray(freq.astype(np.int32)),
            jnp.asarray(acc.astype(np.int32)),
            True,  # interpret
        )
        e1 = np.asarray(e1)
        np.testing.assert_array_equal(e1, np.asarray(e2))
        np.testing.assert_array_equal(
            np.asarray(w1)[e1], np.asarray(w2)[e1]
        )
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
