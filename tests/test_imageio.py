import numpy as np
import pytest

from nblic_tpu.utils import imageio


def test_bmp_roundtrip(test_images):
    for img in test_images:
        data = imageio.save_bmp_gray(img)
        back = imageio.load_bmp_gray(data)
        np.testing.assert_array_equal(back, img)


def test_pgm_roundtrip(test_images):
    for img in test_images:
        data = imageio.save_pgm(img)
        back = imageio.load_pgm(data)
        np.testing.assert_array_equal(back, img)


def test_pgm_comment_tolerated():
    data = b"P5\n# a comment\n3 2\n255\n" + bytes(range(6))
    img = imageio.load_pgm(data)
    assert img.shape == (2, 3)
    np.testing.assert_array_equal(img.ravel(), np.arange(6, dtype=np.uint8))


def test_kodak_bmp_matches_pil(kodak01):
    pil = pytest.importorskip("PIL.Image")
    ref = np.asarray(pil.open("/root/reference/img_kodak/01.bmp").convert("L"))
    np.testing.assert_array_equal(kodak01, ref)


def test_bmp_rejects_rgb():
    with pytest.raises(ValueError):
        imageio.load_bmp_gray(b"BM" + b"\x00" * 100)
