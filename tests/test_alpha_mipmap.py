"""Alpha + mipmap path tests (BASELINE configs 2-3).

Roundtrips RGBA sprite content through our encoder and both decoders; when
the compiled reference decoder is available, it acts as the cross-
implementation oracle (with a corrected RGBA output callback - the stock
one overwrites the alpha byte, YAIK_DefaultCallback.cpp:53).
"""
import os
import pathlib
import subprocess

import numpy as np
import pytest
from PIL import Image

from tests.conftest import FIXTURES
from yaik_tpu.decoder import api
from yaik_tpu.encoder import bank as bankmod
from yaik_tpu.encoder.context import EncoderConfig, encode_image

REF_DECODER = pathlib.Path(__file__).parent.parent / "tools" / "refbuild" / "ref_decoder"


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def bank():
    return bankmod.load_bank(str(FIXTURES / "Bank3D"))


@pytest.fixture(scope="module")
def lut():
    return api.assign_lut((FIXTURES / "LutFile.lut").read_bytes())


def ref_decode(tmp_path, stream):
    if not REF_DECODER.exists():
        return None
    f = tmp_path / "t.yaik"
    f.write_bytes(stream)
    out = tmp_path / "t.raw"
    res = subprocess.run([str(REF_DECODER), str(f),
                          str(FIXTURES / "LutFile.lut"), str(out)],
                         capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    w, h, ch = map(int, res.stdout.strip().splitlines()[-1].split())
    return np.fromfile(out, np.uint8).reshape(h, w, ch)


def sprite():
    return np.asarray(Image.open(FIXTURES / "sprite256.png"))


def test_rgba_8bit_roundtrip(bank, lut, tmp_path):
    img = sprite()
    stream = encode_image(img, bank)
    mine = api.decode_image(stream, lut)
    assert mine.shape == img.shape
    # 8-bit alpha mode is lossless on the alpha channel
    assert np.array_equal(mine[:, :, 3], img[:, :, 3])
    ref = ref_decode(tmp_path, stream)
    if ref is not None:
        assert np.array_equal(mine, ref), "mismatch vs C++ reference decoder"


def test_rgba_jax_engine(bank, lut):
    img = sprite()
    stream = encode_image(img, bank)
    host = api.decode_image(stream, lut, engine="host")
    dev = api.decode_image(stream, lut, engine="jax")
    assert np.array_equal(host, dev)


def test_alpha_6bit_inverse(bank, lut, tmp_path):
    img = sprite()
    cfg = EncoderConfig(alpha_force_8bit=False, enable_mipmap=False)
    stream = encode_image(img, bank, cfg)
    mine = api.decode_image(stream, lut)
    # 6-bit is lossy: v6 = a>>2 then (v6<<2)|(v6>>4)
    v6 = (img[:, :, 3].astype(np.int32) >> 2)
    want = ((v6 << 2) | (v6 >> 4)).astype(np.uint8)
    assert np.array_equal(mine[:, :, 3], want)
    # NOTE: no oracle compare - CheckInBound2D (YAIK_Alpha.cpp:12-23) is
    # missing its `return true`, which is UB; the gcc-built reference
    # decoder rejects valid 6-bit/1-bit alpha streams because of it


def test_binary_alpha_1bit(bank, lut):
    img = sprite().copy()
    img[:, :, 3] = np.where(img[:, :, 3] >= 128, 255, 0)
    stream = encode_image(img, bank)
    mine = api.decode_image(stream, lut)
    assert np.array_equal(mine[:, :, 3], img[:, :, 3])
    # NOTE: no oracle compare - the reference's 1-bit expand drops the last
    # 8-px block per row and drifts (YAIK_Alpha.cpp:86 `while (--cnt)`)


def test_constant_alpha_no_chunk(bank, lut):
    img = sprite().copy()
    img[:, :, 3] = 255
    stream = encode_image(img, bank)
    mine = api.decode_image(stream, lut)
    assert np.array_equal(mine[:, :, 3], img[:, :, 3])


def test_mipmap_chunk(bank, lut, tmp_path):
    """Transparent border -> MIPM chunk; RGB under alpha-0 tiles is still
    coded (matching the reference pipeline), mask drives sparse alpha."""
    img = sprite().copy()
    img[:64], img[-64:] = 0, 0
    img[:, :64], img[:, -64:] = 0, 0
    stream = encode_image(img, bank)
    from yaik_tpu.decoder.reference import iter_chunks
    tags = [t for t, _, _ in iter_chunks(stream)]
    assert b"MIPM" in tags
    mine = api.decode_image(stream, lut)
    assert np.array_equal(mine[:, :, 3], img[:, :, 3])
    ref = ref_decode(tmp_path, stream)
    if ref is not None:
        assert np.array_equal(mine, ref)
