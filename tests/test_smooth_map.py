"""SmoothMap (SMAP) parity. The reference pass (EncoderContext.cpp:
2564-2764) is dead code AND cannot execute: its 1/16-res seed loop indexes
the half-res map with full-res coordinates, corrupting the heap (raw writes
at :2686, OOB reads at :2728) - tools/refbuild/ref_encoder_smap aborts on
every fixture. So no byte goldens exist; these tests pin the defined
semantics documented in encoder/smooth_map.py and the decode roundtrip."""
import struct

import numpy as np
import pytest
from PIL import Image

from tests.conftest import FIXTURES
from yaik_tpu.decoder import reference as decref
from yaik_tpu.encoder import smooth_map
from yaik_tpu.format.headers import (FileHeader, MAGIC, HeaderBase,
                                     HeaderSmoothMap)


def _planes(name):
    rgb = np.asarray(Image.open(FIXTURES / f"{name}.png").convert("RGB"))
    return rgb, rgb.transpose(2, 0, 1).astype(np.int32)


def test_smap_structure():
    rgb, planes = _planes("img512")
    chunk, mip, seeds = smooth_map.smooth_map(planes, None)
    assert chunk[:4] == b"SMAP"
    hdr = HeaderSmoothMap.unpack(chunk, 8)
    assert hdr.version == 1 and hdr.grid == 0
    assert (hdr.x & 7) == 0 and (hdr.w & 7) == 0   # 8-aligned bbox
    assert hdr.expected_rgb_stream_size == 3 * len(seeds)
    # seed positions are on the 4-px grid and were removed from the mask
    assert len(seeds) > 0
    assert (seeds[:, 0] % 4 == 0).all() and (seeds[:, 1] % 4 == 0).all()
    assert not mip[seeds[:, 1], seeds[:, 0]].any()


def test_smap_decode_roundtrip(lut_bytes):
    """Seed enumeration replay in the decoder reconstructs the exact seed
    list; painted pixels equal the YCoCg round trip of the source (+-1 from
    the /2 chroma)."""
    rgb, planes = _planes("img512")
    chunk, _, seeds = smooth_map.smooth_map(planes, None)
    h, w = rgb.shape[:2]
    hdr = HeaderSmoothMap.unpack(chunk, 8)
    dec_seeds = decref.decode_smap_seeds(
        hdr, chunk[8 + HeaderSmoothMap.size():], w, h)
    assert np.array_equal(dec_seeds, seeds)

    stream = (FileHeader(MAGIC, 1, w, h, 0).pack() + chunk
              + struct.pack("<I", 0xDEADBEEF))
    out = decref.decode(stream, lut_bytes)
    err = np.abs(out[seeds[:, 1], seeds[:, 0]].astype(int)
                 - rgb[seeds[:, 1], seeds[:, 0]].astype(int))
    assert err.max() <= 2


def test_smap_flat_region_all_smooth():
    """A constant image is smooth everywhere EXCEPT row/column 0: ApplyDiff
    row markers keep the raw plane value (framework.h LeftRightOrder), so
    |ddx| at x=0 is the pixel value itself and fails the < 4 gate - the
    reference behaves identically."""
    planes = np.full((3, 64, 64), 77, np.int32)
    chunk, mip, seeds = smooth_map.smooth_map(planes, None)
    hdr = HeaderSmoothMap.unpack(chunk, 8)
    assert (hdr.x, hdr.y) == (0, 0)
    assert (hdr.w, hdr.h) == (32, 32)
    assert len(seeds) == 15 * 15          # 4..60 step 4, both axes
    assert not mip[4::4, 4::4][:8, :8].any()
    # (row 0 of the mask is ALSO partially cleared: the final RemoveMask
    # reads the half-res buffer against full-res indices - the defined
    # prefix of the reference's UB at :2728 lands on the first rows)


@pytest.mark.slow
def test_smap_in_pipeline(lut_bytes):
    from yaik_tpu.encoder import bank as bankmod
    from yaik_tpu.encoder.context import EncoderConfig, encode_image
    rgb, _ = _planes("img64")
    bank = bankmod.load_bank(str(FIXTURES / "Bank3D"))
    s = encode_image(rgb, bank, EncoderConfig(enable_smooth_map=True))
    tags = [t for t, _, _ in decref.iter_chunks(s)]
    assert b"SMAP" in tags
    out = decref.decode(s, lut_bytes)
    # later passes overwrite seeds; decode must stay within the 1D gate
    base = decref.decode(encode_image(rgb, bank), lut_bytes)
    assert np.array_equal(out, base)
