"""End-to-end CLI tests: the reference flag surface via subprocess.

Mirrors how verify.py exercises the reference binary (SURVEY.md §4): real
process invocations of `python -m nblic_tpu`, round-trips at pixel level,
plus interop byte-identity against the compiled reference for one config.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from nblic_tpu.utils import imageio

KODAK = "/root/reference/img_kodak/03.bmp"


def run_cli(args, check=True):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "nblic_tpu", *args],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    if check:
        assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc


@pytest.fixture(scope="module")
def small_bmp(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    img = imageio.load_image(KODAK)[:48, :64]
    path = str(d / "in.bmp")
    imageio.save_image(path, img)
    return path, img, d


def test_roundtrip_default(small_bmp):
    path, img, d = small_bmp
    out = str(d / "a.nblic")
    dec = str(d / "a.bmp")
    run_cli(["-c", path, out])
    run_cli(["-d", out, dec])
    assert np.array_equal(imageio.load_image(dec), img)


def test_combined_switches_near_effort(small_bmp):
    path, img, d = small_bmp
    out = str(d / "b.nblic")
    dec = str(d / "b.pgm")
    proc = run_cli(["-cn2e2V", path, out])
    assert "bpp" in proc.stdout
    run_cli(["-dV", out, dec])
    rec = imageio.load_image(dec)
    assert np.abs(rec.astype(int) - img.astype(int)).max() <= 2


def test_effort0_interop_byte_identical(small_bmp, tmp_path):
    path, img, d = small_bmp
    from nblic_tpu.utils import oracle

    out = str(tmp_path / "c.nblic")
    run_cli(["-c", "-n0", "-e0", path, out])
    assert open(out, "rb").read() == oracle.ref_compress(img, near=0, effort=0)


def test_tiled_flag_roundtrip(small_bmp):
    path, img, d = small_bmp
    out = str(d / "t.nbtc")
    dec = str(d / "t.bmp")
    run_cli(["-c", "--tiled", "--tile-h=16", "--tile-w=16", path, out])
    run_cli(["-d", out, dec])
    assert np.array_equal(imageio.load_image(dec), img)


def test_verbose_stats_output(small_bmp):
    path, img, d = small_bmp
    out = str(d / "v.nblic")
    proc = run_cli(["-cv", path, out])
    assert "compression bpp" in proc.stdout
    assert "input image shape" in proc.stdout


def test_bad_usage_and_errors(small_bmp, tmp_path):
    path, img, d = small_bmp
    # missing files -> usage, nonzero exit
    proc = run_cli(["-c"], check=False)
    assert proc.returncode != 0
    # unknown long option
    proc = run_cli(["--bogus", path, str(tmp_path / "x.nblic")], check=False)
    assert proc.returncode != 0
    # decode of a non-container file fails cleanly (no traceback)
    bad = str(tmp_path / "junk.nblic")
    with open(bad, "wb") as f:
        f.write(b"not a container at all")
    proc = run_cli(["-d", bad, str(tmp_path / "junk.bmp")], check=False)
    assert proc.returncode != 0
    assert "Error" in proc.stdout
    assert "Traceback" not in proc.stderr


def test_threads_flag(small_bmp, tmp_path):
    path, img, d = small_bmp
    out = str(tmp_path / "mt.nblic")
    run_cli(["-ct", "-e0", path, out])
    # multithread output must equal single-thread output byte for byte
    ref = str(tmp_path / "st.nblic")
    run_cli(["-c", "-e0", path, ref])
    assert open(out, "rb").read() == open(ref, "rb").read()
