"""Correlation2DSearch (2DTL) parity: byte-exact full streams vs the
compiled reference passes (EncoderContext.cpp:6781-7310, disabled inside the
`#if 0` block at :9300-9382; goldens from tools/ref_encode_2d_main.cpp),
LutFile2D bit-exactness, and decode semantics."""
import numpy as np
import pytest
from PIL import Image

from tests.conftest import FIXTURES
from yaik_tpu.decoder import reference as decref
from yaik_tpu.encoder import bank as bankmod
from yaik_tpu.encoder import bank2d as bank2dmod
from yaik_tpu.encoder.context import EncoderConfig, encode_image
from yaik_tpu.format import lut as lutmod


@pytest.fixture(scope="module")
def bank3d():
    return bankmod.load_bank(str(FIXTURES / "Bank3D"))


@pytest.fixture(scope="module")
def bank2d():
    return bank2dmod.load_bank2d(str(FIXTURES / "Bank2D"))


@pytest.fixture(scope="module")
def rgb():
    return np.asarray(Image.open(FIXTURES / "corr2d128.png").convert("RGB"))


def _normalize(stream: bytes) -> bytes:
    """Mask the reference's uninitialized header bytes (see
    tests/test_encoder_golden.py)."""
    out = bytearray(stream)
    for tag, off, _body in decref.iter_chunks(stream):
        if tag == b"GTIL":
            out[off + 25] = 0
        if tag == b"1DTL":
            out[off + 19] = 0
    return bytes(out)


def test_lut2d_file_bit_exact(bank2d):
    assert bank2dmod.write_lut2d_file(bank2d) == \
        (FIXTURES / "LutFile2D.lut").read_bytes()


@pytest.mark.slow
def test_corr2d_stream_byte_exact(bank3d, bank2d, rgb):
    """Full pipeline with enable_2d: GTIL + 3DTL + 2DTL(RG,GB,RB) + 1DTL,
    byte-identical to the reference driver's output (incl. the 2D claim
    interplay feeding the 1D pass)."""
    stream = encode_image(rgb, bank3d, EncoderConfig(enable_2d=True),
                          bank2d=bank2d)
    gold = (FIXTURES / "corr2d128.2d.yaik").read_bytes()
    assert _normalize(stream) == _normalize(gold)
    tags = [t for t, _, _ in decref.iter_chunks(gold)]
    assert tags.count(b"2DTL") == 3  # RG, GB, RB all exercised


def test_corr2d_decode_quality(rgb, lut_bytes):
    """Decode the golden 2DTL stream: every pixel bounded by the residual
    quantizer; 2D-claimed pair channels within the accept gate (<= 6) plus
    the posterization slack applied after the gate (CompressF 250 at flush,
    EncoderContext.cpp:7506)."""
    gold = (FIXTURES / "corr2d128.2d.yaik").read_bytes()
    lut2d = (FIXTURES / "LutFile2D.lut").read_bytes()
    out = decref.decode(gold, lut_bytes, lut2d).astype(np.int64)
    err = np.abs(out - rgb.astype(np.int64))
    assert err.max() <= 12
    # the >6 tail is the 1D residual quantizer on the noisy third channel
    # (range step up to 255/15); 2D-claimed pairs stay at gate+posterize
    assert (err > 6).mean() < 0.1


def test_corr2d_requires_lut(lut_bytes):
    gold = (FIXTURES / "corr2d128.2d.yaik").read_bytes()
    with pytest.raises(ValueError):
        decref.decode(gold, lut_bytes)


@pytest.mark.slow
def test_corr2d_roundtrip_other_images(bank3d, bank2d, lut_bytes):
    """enable_2d on ordinary content: 2D accepts little or nothing there,
    and the stream still decodes identically to the non-2D decode."""
    rgb = np.asarray(Image.open(FIXTURES / "img64.png").convert("RGB"))
    lut2d = (FIXTURES / "LutFile2D.lut").read_bytes()
    s2 = encode_image(rgb, bank3d, EncoderConfig(enable_2d=True),
                      bank2d=bank2d)
    s0 = encode_image(rgb, bank3d)
    d2 = decref.decode(s2, lut_bytes, lut2d)
    d0 = decref.decode(s0, lut_bytes)
    # 2D may claim a few tiles 1D would otherwise quantize; both stay in gate
    assert d2.shape == d0.shape
    err = np.abs(d2.astype(np.int64) - d0.astype(np.int64))
    assert err.max() <= 14


def test_expand_lut2d_layout():
    """Pattern transforms: bit0 flip x (128-v), bit1 flip y, bit2 swap."""
    tbl = {3: np.arange(16, dtype=np.uint8).reshape(1, 8, 2)}
    exp = lutmod.expand_lut2d(tbl)[3]
    assert exp.shape == (8, 8, 2)
    base = tbl[3][0].astype(np.int32)
    assert np.array_equal(exp[0], base)
    assert np.array_equal(exp[1][:, 0], 128 - base[:, 0])
    assert np.array_equal(exp[1][:, 1], base[:, 1])
    assert np.array_equal(exp[4][:, 0], base[:, 1])
    assert np.array_equal(exp[4][:, 1], base[:, 0])
    assert np.array_equal(exp[7][:, 0], 128 - base[:, 1])
    assert np.array_equal(exp[7][:, 1], 128 - base[:, 0])


@pytest.mark.slow
def test_corr2d_jax_engine_matches_host(lut_bytes):
    """Device path (planner + jax_engine) is pixel-identical on 2DTL
    streams, including the 3-bit LUT-block overrun semantics."""
    from yaik_tpu.decoder import api
    gold = (FIXTURES / "corr2d128.2d.yaik").read_bytes()
    lut2d = (FIXTURES / "LutFile2D.lut").read_bytes()
    bank = api.assign_lut(lut_bytes, lut2d)
    host = api.decode_image(gold, bank, engine="host")
    dev = api.decode_image(gold, bank, engine="jax")
    assert np.array_equal(host, dev)
