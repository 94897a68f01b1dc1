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


def test_p3_tune_block_layout():
    # golden byte layout of the profile-3 replay-contract block: 16
    # little-endian u16 in declared field order, 32 bytes total (the
    # extended v2 block, tile_w bit 3); the first 20 bytes are the legacy
    # 10-field block, which must keep parsing with defaulted tail fields
    from nblic_tpu.models.strips import TUNE_V3, Tune

    assert Tune.SIZE == 20 and Tune.SIZE2 == 32
    t = Tune(256, 2, 256, 13, 48, 32, 1, 1, 0, 0)
    data = t.to_bytes()
    assert len(data) == Tune.SIZE2
    assert data == bytes.fromhex(
        "0001 0200 0001 0d00 3000 2000 0100 0100 0000 0000"  # legacy 10
        " 2000 0020 0000 0000 0000 0000".replace(" ", "")    # v2 tail
    )
    assert Tune.from_bytes(data, extended=True) == t
    # legacy 20-byte parse: tail fields default (cnt_init 32, cnt_halve
    # 8192, feature flags 0)
    assert Tune.from_bytes(data[: Tune.SIZE], extended=False) == t
    assert t == TUNE_V3
    t.validate()


def test_p3_tune_validation():
    from nblic_tpu.models.strips import TUNE_V1, TUNE_V2, TUNE_V3S, Tune

    for good in (TUNE_V1, TUNE_V2, TUNE_V3S):
        good.validate()
    for bad in (
        TUNE_V1._replace(n_unary=0),
        TUNE_V1._replace(n_unary=0xFFFF),   # Python-loop-unroll bomb
        TUNE_V1._replace(map_halve=0),
        TUNE_V1._replace(bias_cap=0),
        TUNE_V1._replace(n_seg=0),
        TUNE_V1._replace(n_seg=0xFFFF),
        TUNE_V1._replace(seg_bias=7),
        TUNE_V1._replace(sym_cnt=2),
    ):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            bad.validate()


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
