"""Differential tests: native runtime vs the compiled reference codec.

The reference binary is the bit-exactness oracle (SURVEY.md section 4: keep the
reference as a differential oracle; round-trip checks mirror verify.py:129).
"""

import numpy as np
import pytest

from nblic_tpu import api, runtime
from nblic_tpu.utils import oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="reference codec unavailable"
)


def test_q_encode_bit_exact(test_images):
    for img in test_images:
        ref = oracle.ref_compress(img, near=0, effort=0)
        assert runtime.q_encode(img, n_threads=1) == ref
        np.testing.assert_array_equal(runtime.q_decode(ref), img)


def test_q_multithread_bit_identical(test_images):
    for img in test_images:
        assert runtime.q_encode(img, n_threads=4) == runtime.q_encode(img, n_threads=1)


@pytest.mark.parametrize("effort", [1, 2, 3])
def test_n_encode_bit_exact(test_images, effort):
    for img in test_images:
        ref = oracle.ref_compress(img, near=0, effort=effort)
        assert runtime.n_encode(img, near=0, effort=effort) == ref
        dec, near, eff = runtime.n_decode(ref)
        np.testing.assert_array_equal(dec, img)
        assert near == 0 and eff == effort


@pytest.mark.parametrize("near", [1, 3, 9])
def test_near_lossless_bit_exact(test_images, near):
    for img in test_images:
        ref = oracle.ref_compress(img, near=near, effort=2)
        mine = runtime.n_encode(img, near=near, effort=2)
        assert mine == ref
        dec, got_near, _ = runtime.n_decode(mine)
        assert got_near == near
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= near
        np.testing.assert_array_equal(dec, oracle.ref_decompress(mine))


def test_near_forces_effort1(test_images):
    # near>0 with effort=0 must dispatch to the effort>=1 engine
    # (NBLIC_main.c:182-188)
    img = test_images[3]
    stream = api.compress(img, near=2, effort=0)
    assert stream[:8] == b"NBLIC0.3"
    dec = api.decompress(stream)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_kodak01_all_efforts_bit_exact(kodak01):
    for near, effort in [(0, 0), (0, 1), (0, 2), (2, 2)]:
        ref = oracle.ref_compress(kodak01, near=near, effort=effort)
        mine = api.compress(kodak01, near=near, effort=effort)
        assert mine == ref, f"near={near} effort={effort}"
        np.testing.assert_array_equal(
            api.decompress(ref), oracle.ref_decompress(ref)
        )


def test_reconstruction_output(kodak01):
    stream, rec = runtime.n_encode(kodak01, near=3, effort=1, want_reconstruction=True)
    dec, _, _ = runtime.n_decode(stream)
    np.testing.assert_array_equal(rec, dec)


def test_capacity_and_validation_errors():
    with pytest.raises(ValueError):
        api.compress(np.zeros((0, 5), dtype=np.uint8))
    with pytest.raises(ValueError):
        api.compress(np.zeros((4, 4), dtype=np.uint8), near=10)
    with pytest.raises(ValueError):
        api.decompress(b"garbagegarbage")
