"""Bit-exactness of the device (JAX) interop engines vs the native oracle.

The native runtime is itself validated byte-for-byte against the compiled
reference codec (test_runtime.py), so matching it transitively proves
bitstream interop with the reference.
"""

import numpy as np
import pytest

from nblic_tpu import api, runtime
from nblic_tpu.models import nblic as nblic_jax
from nblic_tpu.models import qnblic as qnblic_jax

pytestmark = pytest.mark.skipif(
    not runtime.available(), reason="native runtime unavailable"
)


class TestQnblicJax:
    def test_encode_bit_exact(self, test_images):
        for img in test_images:
            assert qnblic_jax.encode(img) == runtime.q_encode(img, n_threads=1), (
                f"shape {img.shape}"
            )

    def test_decode_roundtrip(self, test_images):
        for img in test_images[:6]:
            stream = runtime.q_encode(img, n_threads=1)
            np.testing.assert_array_equal(qnblic_jax.decode(stream), img)

    def test_api_backend_jax(self, test_images):
        img = test_images[4]
        stream = api.compress(img, near=0, effort=0, backend="jax")
        assert stream == api.compress(img, near=0, effort=0, backend="native")
        np.testing.assert_array_equal(api.decompress(stream, backend="jax"), img)


class TestNblicJaxE1:
    @pytest.mark.parametrize("near", [0, 2, 5])
    def test_encode_bit_exact(self, test_images, near):
        for img in test_images[2:7]:
            mine = nblic_jax.encode(img, near=near)
            ref = runtime.n_encode(img, near=near, effort=1)
            assert mine == ref, f"shape {img.shape} near {near}"

    @pytest.mark.parametrize("near", [0, 3])
    def test_decode_matches_native(self, test_images, near):
        for img in test_images[3:6]:
            stream = runtime.n_encode(img, near=near, effort=1)
            ref_dec, _, _ = runtime.n_decode(stream)
            np.testing.assert_array_equal(nblic_jax.decode(stream), ref_dec)

    @pytest.mark.parametrize("effort,near", [(2, 0), (3, 0), (2, 2)])
    def test_avp_efforts_bit_exact(self, test_images, effort, near):
        # efforts 2-3 run the int64 AVP under x64 (ops/avp.py)
        for img in test_images[3:5]:
            mine = nblic_jax.encode(img, near=near, effort=effort)
            ref = runtime.n_encode(img, near=near, effort=effort)
            assert mine == ref, f"shape {img.shape} e{effort} n{near}"
            ref_dec, _, _ = runtime.n_decode(ref)
            np.testing.assert_array_equal(nblic_jax.decode(ref), ref_dec)
