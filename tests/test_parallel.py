"""SPMD mesh encode: sharded outputs must equal the single-device engine."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cpu_mesh():
    import jax

    from nblic_tpu.parallel import mesh as pmesh

    devices = jax.devices("cpu")
    if len(devices) < 4:
        pytest.skip("needs >=4 virtual CPU devices")
    return pmesh.make_mesh(4, devices=devices)


def test_sharded_model_matches_local(cpu_mesh, rng):
    import jax.numpy as jnp

    from nblic_tpu.models import tiled
    from nblic_tpu.parallel import mesh as pmesh

    img = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    tiles_np = tiled.to_tiles(img, 16, 16)  # 16 tiles -> 4 per device
    tiles = pmesh.shard_tiles(jnp.asarray(tiles_np), cpu_mesh)

    y_s, qd_s, bias_s, hist_s = pmesh.sharded_model_lossless(cpu_mesh)(tiles)
    y_l, qd_l, bias_l, hist_l = tiled._model_lossless(jnp.asarray(tiles_np))

    np.testing.assert_array_equal(np.asarray(y_s), np.asarray(y_l))
    np.testing.assert_array_equal(np.asarray(qd_s), np.asarray(qd_l))
    np.testing.assert_array_equal(np.asarray(bias_s), np.asarray(bias_l))
    np.testing.assert_array_equal(np.asarray(hist_s), np.asarray(hist_l))


def test_sharded_fold_roundtrip(cpu_mesh, rng):
    import jax.numpy as jnp

    from nblic_tpu.models import tiled
    from nblic_tpu.ops import rans
    from nblic_tpu.parallel import mesh as pmesh

    img = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    tiles_np = tiled.to_tiles(img, 16, 16)
    tiles = pmesh.shard_tiles(jnp.asarray(tiles_np), cpu_mesh)
    y, qd, bias, hist = pmesh.sharded_model_lossless(cpu_mesh)(tiles)

    hist_n, acc = tiled._normalize_tables(np.asarray(hist))
    words, emits, state = pmesh.sharded_rans_fold(cpu_mesh)(
        y, qd, jnp.asarray(hist_n), jnp.asarray(acc)
    )
    streams = rans.finalize_streams(words, emits, state)
    assert len(streams) == tiles_np.shape[0]
    assert all(len(s) >= 2 for s in streams)
    # sharded fold must equal the single-device fold bit for bit
    w1, e1, s1 = rans.encode_scan(
        jnp.asarray(np.asarray(hist_n))[np.asarray(qd).reshape(16, -1),
                                        np.asarray(y).reshape(16, -1)],
        jnp.asarray(np.asarray(acc))[np.asarray(qd).reshape(16, -1),
                                     np.asarray(y).reshape(16, -1)],
    )
    ref_streams = rans.finalize_streams(w1, e1, s1)
    for a, b in zip(streams, ref_streams):
        np.testing.assert_array_equal(a, b)


def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(4)


# ---------------------------------------------------------------------------
# mesh decode (profiles 1/2) + profile-3 data-parallel mesh paths
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def two_crops(kodak01):
    return [
        np.ascontiguousarray(kodak01[:256, :256]),
        np.ascontiguousarray(kodak01[128:384, 200:456]),
    ]


@pytest.mark.parametrize("geom", [(2, 2), (1, 4)])
def test_mesh_decode_matches_local(two_crops, geom):
    """Sharded group decode == local decode, at two mesh geometries.

    16x16 tiles on 256x256 -> 256 tiles = 2 interleave groups per image,
    so the ``tiles`` axis genuinely shards groups (plus pad groups)."""
    from nblic_tpu.models import tiled
    from nblic_tpu.parallel import mesh as pmesh

    streams = tiled.encode_batch(two_crops, tile_h=16, tile_w=16)
    local = tiled.decode_batch(streams)
    mesh = pmesh.make_mesh2(*geom)
    sharded = pmesh.decode_batch_mesh(streams, mesh)
    for a, b, src in zip(sharded, local, two_crops):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, src)


def test_mesh_decode_profile2(two_crops):
    from nblic_tpu.models import tiled
    from nblic_tpu.parallel import mesh as pmesh

    streams = tiled.encode_batch(two_crops, tile_h=16, tile_w=16, effort=2)
    mesh = pmesh.make_mesh2(2, 2)
    sharded = pmesh.decode_batch_mesh(streams, mesh)
    for a, src in zip(sharded, two_crops):
        np.testing.assert_array_equal(a, src)


def test_encode_batch_mesh_nondividing(kodak01):
    """Non-dividing tile count (6 tiles over a 4-wide tiles axis) and a
    1xN mesh: containers must still decode exactly (pad-lane masking)."""
    from nblic_tpu.models import tiled
    from nblic_tpu.parallel import mesh as pmesh

    img = np.ascontiguousarray(kodak01[:128, :192])  # 6 x 64x64 tiles
    mesh = pmesh.make_mesh2(1, 4)
    streams = pmesh.encode_batch_mesh([img], mesh)
    out = tiled.decode_batch(streams)
    np.testing.assert_array_equal(out[0], img)


def test_p3_mesh_roundtrip(kodak01):
    """Profile-3 data-parallel mesh: encode bit-identical to the local
    engine, mesh decode pixel-exact."""
    from nblic_tpu.models import strips
    from nblic_tpu.parallel import mesh as pmesh

    imgs = [
        np.ascontiguousarray(kodak01[:96, :128]),
        np.ascontiguousarray(kodak01[96:192, 128:256]),
    ]
    mesh = pmesh.make_mesh2(2, 1)
    streams_mesh = pmesh.p3_encode_batch_mesh(imgs, mesh, th=32)
    streams_local = strips.encode_batch(imgs, th=32)
    assert streams_mesh == streams_local
    out = pmesh.p3_decode_batch_mesh(streams_mesh, mesh)
    for a, src in zip(out, imgs):
        np.testing.assert_array_equal(a, src)


def test_p3_mesh_pads_odd_batch(kodak01):
    """3 images over a 2-wide data axis: the pad image is dropped."""
    from nblic_tpu.parallel import mesh as pmesh

    imgs = [
        np.ascontiguousarray(kodak01[i * 64 : i * 64 + 64, :96])
        for i in range(3)
    ]
    mesh = pmesh.make_mesh2(2, 1)
    streams = pmesh.p3_encode_batch_mesh(imgs, mesh, th=32)
    assert len(streams) == 3
    out = pmesh.p3_decode_batch_mesh(streams, mesh)
    assert len(out) == 3
    for a, src in zip(out, imgs):
        np.testing.assert_array_equal(a, src)
