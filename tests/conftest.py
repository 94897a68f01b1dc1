"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices (the driver separately
dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# In the axon-tunnel environment the TPU backend registers itself as the
# default regardless of JAX_PLATFORMS; pin the default device to CPU so unit
# tests are hermetic (the bench runs on the real chip separately).
import jax

# Persistent compile cache: the profile-3 engine programs are large; cache
# them across test runs.  The tests get their OWN cache dir (NOT the
# bench/tunnel's /tmp/jax_cache — that one accumulates foreign-machine
# XLA:CPU AOT entries from the remote-compile tunnel) and the DEFAULT
# serialization thresholds: force-persisting every executable
# (min_entry_size_bytes=-1 / min_compile_time_secs=0.5) made JAX serialize
# the giant p3 near-batch x64 executables mid-suite, which reproducibly
# died in XLA's executable serialization (SIGSEGV/SIGABRT in
# put_executable_and_time) on full-suite runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")

# Belt and suspenders for the same crash: never serialize the monster
# executables at all.  Executables whose compile took longer than this cap
# are exactly the huge x64 scan programs whose XLA:CPU serialization is the
# crash site; everything else still persists normally.
_PERSIST_COMPILE_TIME_CAP_S = 30.0

from jax._src import compilation_cache as _cc

_orig_put = _cc.put_executable_and_time


def _bounded_put(cache_key, module_name, executable, backend, compile_time):
    if compile_time > _PERSIST_COMPILE_TIME_CAP_S:
        return
    return _orig_put(cache_key, module_name, executable, backend, compile_time)


# callers reach it as compilation_cache.put_executable_and_time, so
# rebinding the module attribute is sufficient
_cc.put_executable_and_time = _bounded_put

_cpu = jax.devices("cpu")
jax.config.update("jax_default_device", _cpu[0])

import numpy as np
import pytest


KODAK_DIR = "/root/reference/img_kodak"


@pytest.fixture(scope="session")
def kodak01():
    from nblic_tpu.utils import imageio

    path = os.path.join(KODAK_DIR, "01.bmp")
    if not os.path.exists(path):
        pytest.skip("kodak corpus unavailable")
    return imageio.load_image(path)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def make_test_images(rng, sizes=((1, 1), (1, 7), (5, 1), (8, 8), (23, 17), (64, 48))):
    """Small deterministic images covering border paths: random, flat, gradient."""
    imgs = []
    for h, w in sizes:
        imgs.append(rng.integers(0, 256, size=(h, w), dtype=np.uint8))
    imgs.append(np.zeros((16, 16), dtype=np.uint8))
    imgs.append(np.full((16, 16), 255, dtype=np.uint8))
    grad = (np.arange(32)[:, None] * 8 + np.arange(24)[None, :]).astype(np.uint8)
    imgs.append(grad)
    noise = rng.integers(0, 4, size=(33, 31), dtype=np.uint8) * 64
    imgs.append(noise)
    return imgs


@pytest.fixture(scope="session")
def test_images(rng):
    return make_test_images(rng)
