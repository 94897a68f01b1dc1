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
