"""Visual debug-dump hooks (the reference's YAIK_DEVEL Debug_RGBandTILE /
debug1BitAsPng workflow, /root/reference/decoder/YAIK_API.cpp:546-556,
EncoderContext.cpp:299): YAIK_DEBUG_DUMP=<dir> snapshots decoder plane
state + claims per chunk and encoder claim maps per stage."""
import os

import numpy as np
import pytest
from PIL import Image

from tests.conftest import FIXTURES
from yaik_tpu.decoder import reference as refdec
from yaik_tpu.format import lut as lutmod
from yaik_tpu.utils import debug_dump


def test_decode_dumps_per_chunk(tmp_path, monkeypatch):
    monkeypatch.setenv("YAIK_DEBUG_DUMP", str(tmp_path))
    debug_dump.reset()
    expanded = lutmod.expand_lut(
        lutmod.parse_lut_file((FIXTURES / "LutFile.lut").read_bytes()))
    stream = (FIXTURES / "img128.yaik").read_bytes()
    out = refdec.decode(stream, expanded)
    rgbs = sorted(p for p in os.listdir(tmp_path) if p.endswith("_rgb.png"))
    claims = sorted(p for p in os.listdir(tmp_path)
                    if p.endswith("_claims.png"))
    assert len(rgbs) >= 3 and len(rgbs) == len(claims)
    # the LAST snapshot equals the final decode state
    last = np.asarray(Image.open(tmp_path / rgbs[-1]))
    assert np.array_equal(last, out)


def test_disabled_is_noop(monkeypatch):
    monkeypatch.delenv("YAIK_DEBUG_DUMP", raising=False)
    assert not debug_dump.enabled()
    debug_dump.snapshot_accepts("x", np.zeros((4, 4), bool))  # no crash


@pytest.mark.slow
def test_encode_dumps_claims(tmp_path, monkeypatch):
    from yaik_tpu.encoder import bank as bankmod
    from yaik_tpu.encoder.context import encode_image
    monkeypatch.setenv("YAIK_DEBUG_DUMP", str(tmp_path))
    debug_dump.reset()
    img = np.asarray(Image.open(FIXTURES / "img128.png").convert("RGB"))
    bank = bankmod.load_bank(str(FIXTURES / "Bank3D"))
    encode_image(img, bank)
    names = os.listdir(tmp_path)
    assert any(n.startswith("enc_gradient_claims4") for n in names)
    assert any(n.startswith("enc_tile3d_claims4") for n in names)
