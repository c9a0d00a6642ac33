"""Plane-subset gradient passes (GTIL with plane != 7): the disabled
2-plane (`if (0)`, EncoderContext.cpp:9260-9290) and 1-plane (`#if 0`,
:9392-9420) 4x4 calls, byte-exact vs the compiled reference
(tools/ref_encode_gradpair_main.cpp goldens).

Decode notes (documented reference defects, not reproduced):
- the reference DECODER's live plane-variant path garbles these streams
  entirely (its own corner-cursor handling is broken; measured mean error
  ~60/255 on every variant band) - our decoder reconstructs them;
- the palette codec is triple-based (entryCol = size/3, :3264), so 1- and
  2-plane corner streams lose their final size%3 bytes: the LAST 1-2
  corner values of such chunks are unrecoverable BY DESIGN (the decoder
  reads uninitialized memory there; ours substitutes zeros)."""
import numpy as np
import pytest
from PIL import Image

from tests.conftest import FIXTURES
from tests.test_encoder_golden import normalize
from yaik_tpu.decoder import reference as decref
from yaik_tpu.encoder import bank as bankmod
from yaik_tpu.encoder.context import EncoderConfig, encode_image
from yaik_tpu.format.headers import HeaderGradientTile


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def bank3d():
    return bankmod.load_bank(str(FIXTURES / "Bank3D"))


@pytest.fixture(scope="module")
def src():
    return np.asarray(Image.open(FIXTURES / "gradpair192.png"))


def test_plane_gradient_byte_exact(bank3d, src):
    mine = encode_image(src, bank3d,
                        EncoderConfig(enable_plane_gradients=True))
    gold = (FIXTURES / "gradpair192.gp.yaik").read_bytes()
    assert normalize(mine) == normalize(gold)
    planes = [HeaderGradientTile.unpack(b).plane
              for t, _, b in decref.iter_chunks(gold) if t == b"GTIL"]
    # all six variants present, in Convert's order after the plane-7 passes
    assert planes[-6:] == [5, 3, 6, 1, 2, 4]


def test_plane_gradient_decode(bank3d, src, lut_bytes):
    """Our decoder reconstructs the variant stream; errors stay within the
    active-path profile except the palette-codec tail loss (<= 2 corner
    values per variant chunk)."""
    gold = (FIXTURES / "gradpair192.gp.yaik").read_bytes()
    out = decref.decode(gold, lut_bytes)
    err = np.abs(out.astype(int) - src.astype(int))
    assert err.mean() < 4
    # tail-lost corners bound: a handful of pixels, not whole bands
    assert (err > 16).sum() < 64


def test_plane_gradient_claims_feed_1d(bank3d, src, lut_bytes):
    """Per-plane claims from variant chunks keep the 1DTL cursors in sync:
    the stream decodes without desync artifacts (stripe-free noise bands)."""
    mine = encode_image(src, bank3d,
                        EncoderConfig(enable_plane_gradients=True))
    base = encode_image(src, bank3d)
    d_mine = decref.decode(mine, lut_bytes).astype(int)
    d_base = decref.decode(base, lut_bytes).astype(int)
    # both are valid decodes of the same content; the variant one must not
    # be globally worse (it replaces 1D quantization with exact gradients)
    e_mine = np.abs(d_mine - src.astype(int)).mean()
    e_base = np.abs(d_base - src.astype(int)).mean()
    assert e_mine <= e_base + 0.1


def test_plane_gradient_jax_engine(bank3d, src, lut_bytes):
    """Device path decodes plane-variant streams pixel-identically to the
    host (masked blend passes in the stream's pair/single positions)."""
    from yaik_tpu.decoder import api
    gold = (FIXTURES / "gradpair192.gp.yaik").read_bytes()
    bank = api.assign_lut(lut_bytes)
    host = api.decode_image(gold, bank, engine="host")
    dev = api.decode_image(gold, bank, engine="jax")
    assert np.array_equal(host, dev)


def test_plane_gradient_with_2d(bank3d, src, lut_bytes):
    """Pairs -> 2DTL -> singles ordering (Convert's layout) decodes the
    same on both engines."""
    from yaik_tpu.decoder import api
    from yaik_tpu.encoder import bank2d as bank2dmod
    b2 = bank2dmod.load_bank2d(str(FIXTURES / "Bank2D"))
    lut2d = (FIXTURES / "LutFile2D.lut").read_bytes()
    s = encode_image(src, bank3d,
                     EncoderConfig(enable_plane_gradients=True,
                                   enable_2d=True), bank2d=b2)
    bank = api.assign_lut(lut_bytes, lut2d)
    host = api.decode_image(s, bank, engine="host")
    dev = api.decode_image(s, bank, engine="jax")
    assert np.array_equal(host, dev)
