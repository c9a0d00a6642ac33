"""SingleColorOut (UCOL) parity: byte-exactness vs the compiled reference
pass (EncoderContext.cpp:1771-2283, disabled upstream at :9036; goldens from
tools/ref_encode_ucol_main.cpp), decode semantics, and pipeline interplay."""
import struct

import numpy as np
import pytest
from PIL import Image

from tests.conftest import FIXTURES
from yaik_tpu.decoder import reference as decref
from yaik_tpu.encoder import bank as bankmod
from yaik_tpu.encoder import single_color
from yaik_tpu.encoder.context import EncoderConfig, encode_image
from yaik_tpu.format.headers import (FileHeader, MAGIC, HeaderBase,
                                     UniqueColorHeader)


@pytest.fixture(scope="module")
def bank3d():
    return bankmod.load_bank(str(FIXTURES / "Bank3D"))


def _load_rgb(name):
    return np.asarray(Image.open(FIXTURES / f"{name}.png").convert("RGB"))


def _extract_ucol(stream: bytes) -> bytes:
    pos = FileHeader.size()
    while pos < len(stream):
        tag = stream[pos:pos + 4]
        if tag == b"\xef\xbe\xad\xde":
            break
        ln = HeaderBase.unpack(stream, pos).length
        if tag == b"UCOL":
            return stream[pos:pos + 8 + ln]
        pos += 8 + ln
    raise AssertionError("no UCOL chunk")


@pytest.mark.parametrize("name", ["img64", "img512"])
def test_ucol_byte_exact(name):
    rgb = _load_rgb(name)
    h, w = rgb.shape[:2]
    planes = rgb.transpose(2, 0, 1).astype(np.int32)
    chunk, _ = single_color.single_color_out(planes, None, (0, 0, w, h))

    gold = _extract_ucol((FIXTURES / f"{name}.ucol.yaik").read_bytes())
    # the reference leaves the header's 2 pad bytes uninitialized
    # (UniqueColorHeader is 26 bytes of fields aligned to 28); mask them
    gold = bytearray(gold)
    gold[8 + 26:8 + 28] = b"\0\0"
    assert chunk == bytes(gold)


@pytest.mark.parametrize("name", ["img64", "img512"])
def test_ucol_only_decode_exact(name):
    """Pixels claimed by the UCOL map decode to the exact source RGB (the
    pass is exact-match by construction)."""
    rgb = _load_rgb(name)
    h, w = rgb.shape[:2]
    planes = rgb.transpose(2, 0, 1).astype(np.int32)
    chunk, _ = single_color.single_color_out(planes, None, (0, 0, w, h))

    stream = (FileHeader(MAGIC, 1, w, h, 0).pack() + chunk
              + struct.pack("<I", 0xDEADBEEF))
    lut = (FIXTURES / "LutFile.lut").read_bytes()
    out = decref.decode(stream, lut)

    hdr = UniqueColorHeader.unpack(chunk, 8)
    _, mp = decref.decode_ucol_map(hdr, chunk[8 + UniqueColorHeader.size():])
    n = np.flatnonzero(mp)
    assert n.size > 100
    tile = n >> 6
    wu = hdr.w >> 3
    x = ((tile % wu) << 3) | (n & 7)
    y = ((tile // wu) << 3) | ((n >> 3) & 7)
    assert np.array_equal(out[y, x], rgb[y, x])


@pytest.mark.slow
def test_ucol_pipeline_consistency(bank3d, lut_bytes):
    """enable_single_color inserts UCOL between ALPM and GTIL; downstream
    chunks are unchanged (the reference's active passes never read the
    mipmapMask SingleColorOut updates) and the decode is identical."""
    rgb = _load_rgb("img64")
    s0 = encode_image(rgb, bank3d)
    s1 = encode_image(rgb, bank3d, EncoderConfig(enable_single_color=True))
    ucol = _extract_ucol(s1)
    # removing the UCOL chunk yields the baseline stream byte-for-byte
    assert s1.replace(ucol, b"") == s0
    d0 = decref.decode(s0, lut_bytes)
    d1 = decref.decode(s1, lut_bytes)
    assert np.array_equal(d0, d1)


@pytest.mark.slow
def test_ucol_alpha_mip_roundtrip(bank3d, lut_bytes):
    """UCOL under a MipPrefilter mask (alpha sprite): histogram is gated by
    the mip mask; stream decodes, and claimed pixels inside the mip bbox
    reproduce source RGB. (No byte golden: the reference pass hits
    undefined behavior on the tiny span tables this path produces - see
    encoder/single_color.py docstring.)"""
    rgba = np.asarray(Image.open(FIXTURES / "sprite256.png").convert("RGBA"))
    cfg = EncoderConfig(enable_single_color=True)
    stream = encode_image(rgba, bank3d, cfg)
    out = decref.decode(stream, lut_bytes)
    assert out.shape == rgba.shape
    # alpha plane is exact (8-bit ALPM path)
    assert np.array_equal(out[:, :, 3], rgba[:, :, 3])


@pytest.mark.slow
def test_ucol_jax_engine_matches_host(bank3d, lut_bytes):
    """Device path applies UCOL palette pixels identically to the host."""
    from yaik_tpu.decoder import api
    rgb = _load_rgb("img64")
    stream = encode_image(rgb, bank3d,
                          EncoderConfig(enable_single_color=True))
    bank = api.assign_lut(lut_bytes)
    host = api.decode_image(stream, bank, engine="host")
    dev = api.decode_image(stream, bank, engine="jax")
    assert np.array_equal(host, dev)
