"""Multi-process (multi-host surrogate) SPMD worker: 2 processes x 2 CPU
devices, one global JAX program.

Run by tests/test_distributed.py, one instance per process:

    python scripts/dist_worker.py <coordinator_port> <process_id> <n_procs>

Exercises the two multi-host layers the single-host tests cannot:

1. ``jax.distributed.initialize`` + a GLOBAL mesh whose axes span both
   processes (gloo CPU collectives stand in for DCN).
2. The profile-1 modeling pass with its bias/hist ``psum`` crossing the
   process boundary, verified against a single-process reference.
3. A profile-3 data-parallel encode where each process owns the images on
   its local mesh slice (jax.make_array_from_process_local_data), fetches
   only its addressable output shards, assembles containers, decodes them
   locally, and checks bit-identity against the single-device encoder.

Prints ``DIST_OK <pid>`` on success (the test greps for it).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    port, pid, n_procs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=n_procs,
        process_id=pid,
    )
    # the axon TPU plugin registers itself as the default backend regardless
    # of JAX_PLATFORMS (platform quirk) — address the CPU backend explicitly
    assert jax.process_count("cpu") == n_procs, jax.process_count("cpu")
    cpus = jax.devices("cpu")
    assert len(cpus) == 2 * n_procs, len(cpus)
    jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nblic_tpu.models import strips, tiled
    from nblic_tpu.parallel import mesh as pmesh

    # ---- 1+2: global 1-D mesh, modeling psum across the process boundary
    mesh = pmesh.make_mesh(devices=cpus)
    rng = np.random.default_rng(7)  # same seed everywhere: replicated input
    img = rng.integers(0, 256, size=(32, 64), dtype=np.uint8)
    tiles_np = tiled.to_tiles(img, 16, 16)  # 8 tiles over 4 global devices
    sharding = NamedSharding(mesh, P("tiles", None, None))
    tiles = jax.make_array_from_process_local_data(sharding, tiles_np)
    y, qd, bias, hist = pmesh.sharded_model_lossless(mesh)(tiles)
    # bias/hist are psum-replicated -> fully addressable on every process
    y_l, qd_l, bias_l, hist_l = tiled._model_lossless(tiles_np)
    np.testing.assert_array_equal(np.asarray(bias), np.asarray(bias_l))
    np.testing.assert_array_equal(np.asarray(hist), np.asarray(hist_l))
    y_ref = np.asarray(y_l)
    for shard in y.addressable_shards:
        lo = shard.index[0]
        np.testing.assert_array_equal(np.asarray(shard.data), y_ref[lo])

    # ---- 3: profile-3 data-parallel encode, images owned per process
    mesh2 = pmesh.make_mesh2(2 * n_procs, 1, devices=cpus)
    # PORTRAIT shapes: strips.encode normalizes to portrait (round 4),
    # so portrait inputs keep the manual plane path and the public API
    # bit-identical
    imgs = [
        rng.integers(0, 256, size=(64, 32), dtype=np.uint8)
        for _ in range(2 * n_procs)
    ]
    th = 16
    stack = np.stack([strips._to_strips(im, th) for im in imgs])
    sh = NamedSharding(mesh2, P("data", None, None, None))
    # assemble the global array from per-device locals explicitly —
    # make_array_from_process_local_data consults the DEFAULT backend's
    # process count, which the axon plugin pins to 1 (platform quirk)
    lpid = jax.process_index("cpu")
    arrs = [
        jax.device_put(stack[idx], d)
        for d, idx in sh.devices_indices_map(stack.shape).items()
        if d.process_index == lpid
    ]
    xs = jax.make_array_from_single_device_arrays(stack.shape, sh, arrs)
    with jax.enable_x64():
        planes = strips._model_batch_jit(
            xs.astype(np.int32), strips.AVP_N, False, 0
        )
        lens_d, flats_d = strips._code_batch_jit(*planes, strips.TUNE)
    # fetch only this process's shards and assemble its containers
    my_streams = []
    for li, fi in zip(lens_d.addressable_shards, flats_d.addressable_shards):
        assert li.index == fi.index
        for b in range(li.data.shape[0]):
            lens = np.asarray(li.data[b], np.uint32)
            n_words = int(lens.astype(np.int64).sum())
            w32 = np.asarray(fi.data[b][: (n_words + 1) // 2], np.uint32)
            u16 = np.empty(w32.size * 2, np.uint16)
            u16[0::2] = w32 & 0xFFFF
            u16[1::2] = w32 >> 16
            gidx = li.index[0].start + b
            my_streams.append(
                (gidx,
                 strips._container(lens, u16[:n_words], 64, 32,
                                   stack.shape[1], th, False))
            )
    assert [g for g, _ in my_streams] == [2 * pid, 2 * pid + 1], my_streams
    # bit-identity vs the single-device encoder, then local decode
    for gidx, stream in my_streams:
        ref = strips.encode(imgs[gidx], th=th)
        assert stream == ref, f"container {gidx} differs from local encode"
        out = strips.decode(stream)
        np.testing.assert_array_equal(out, imgs[gidx])

    print(f"DIST_OK {pid}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
