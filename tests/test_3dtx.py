"""3DTX coverage: the u32-widened 3D chunk for >= 1 MPix images (the
reference's HeaderTile3D map-size fields are u16 and overflow there -
yaik_tpu's extension, format/headers.py HeaderTile3DX). A 1024x1024 ramp
keeps the encode fast (gradient claims everything) while the 4x4 map's
bits-as-bytes allocation (65536 B) forces the 3DTX header."""
import numpy as np
import pytest

from tests.conftest import FIXTURES
from yaik_tpu.decoder import api, reference as refdec
from yaik_tpu.encoder import bank as bankmod
from yaik_tpu.encoder.context import encode_image


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def bank3d():
    return bankmod.load_bank(str(FIXTURES / "Bank3D"))


def _mpix_image():
    rgb = np.zeros((1024, 1024, 3), np.uint8)
    g = np.linspace(0, 18, 1024).astype(np.uint8)
    rgb[:, :, 0] = 37 + g[None, :]
    rgb[:, :, 1] = 120
    rgb[:, :, 2] = 200 - g[:, None] // 2
    return rgb


def test_3dtx_roundtrip(bank3d, lut_bytes):
    rgb = _mpix_image()
    s = encode_image(rgb, bank3d)
    tags = [t for t, _, _ in refdec.iter_chunks(s)]
    assert b"3DTX" in tags and b"3DTL" not in tags
    out = refdec.decode(s, lut_bytes)
    err = np.abs(out.astype(int) - rgb.astype(int))
    assert err.max() <= 5    # gradient gate 3 + corner posterization


def test_3dtx_spatial_bands(bank3d, lut_bytes):
    """decode_spatial splits the 1 MPix plan into 4 bands and runs the jax
    engine per band; equality with the host decode doubles as the
    host-vs-device check at 3DTX scale (a full-image device compile at
    1 MPix costs ~30 min on the CPU backend, so the banded form is the
    suite's deliberate choice)."""
    from yaik_tpu.parallel import batch
    rgb = _mpix_image()
    s = encode_image(rgb, bank3d)
    host = refdec.decode(s, lut_bytes)
    out = batch.decode_spatial(s, lut_bytes, n_bands=4)
    assert np.array_equal(out, host)
