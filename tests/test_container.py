import pytest

from nblic_tpu.utils import container


def test_nblic_header_roundtrip():
    h = container.NblicHeader(1, 512, 768, 0, 3, 1)
    data = h.to_bytes()
    assert len(data) == container.NblicHeader.SIZE
    assert container.NblicHeader.from_bytes(data) == h
    # verified reference header bytes for Kodak-01 e1 (SURVEY.md section 2.2)
    assert data == bytes.fromhex("4e424c4943302e33 01 0200 0300 00 03 01".replace(" ", ""))


def test_qnblic_header_roundtrip():
    h = container.QnblicHeader(512, 768)
    data = h.to_bytes()
    assert len(data) == container.QnblicHeader.SIZE
    assert container.QnblicHeader.from_bytes(data) == h
    assert data == bytes.fromhex("51302e32 0002 0003".replace(" ", ""))


def test_nbtc_header_roundtrip():
    h = container.NbtcHeader(0, 2, 4096, 8192, 64, 128, 4096, 321, 777)
    assert container.NbtcHeader.from_bytes(h.to_bytes()) == h


def test_sniff():
    assert container.sniff_format(b"Q0.2xxxx") == "qnblic"
    assert container.sniff_format(b"NBLIC0.3xxxxxxx") == "nblic"
    assert container.sniff_format(b"NBTC0001" + b"\x00" * 30) == "nbtc"
    with pytest.raises(ValueError):
        container.sniff_format(b"nonsense")


def test_check_size():
    container.check_size(1, 1)
    container.check_size(65535, 1525)  # 99,940,875 px, just under the 1e8 cap
    with pytest.raises(ValueError):
        container.check_size(0, 5)
    with pytest.raises(ValueError):
        container.check_size(65536, 5)
    with pytest.raises(ValueError):
        container.check_size(20000, 20000)  # > 1e8 pixels
