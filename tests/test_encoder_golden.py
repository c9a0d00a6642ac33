"""Golden encode tests: our encoder vs reference-encoded .yaik streams.

With the vendored zstd 1.3.4 build present, streams are byte-identical except
two uninitialized stack bytes the reference leaks into each GTIL (version
field) and 1DTL (struct padding) header - both ignored by the decoder and
masked here. Without it (system zstd), entropy-layer bytes differ, so we
instead assert that our stream decodes bit-identically to the reference
stream's decode.
"""
import numpy as np
import pytest
from PIL import Image

from tests.conftest import FIXTURES, fixture_params
from yaik_tpu.decoder import api, reference as refdec
from yaik_tpu.encoder import bank as bankmod
from yaik_tpu.encoder.context import encode_image
from yaik_tpu.entropy import zstd_backend as zstd


@pytest.fixture(scope="module")
def bank():
    return bankmod.load_bank(str(FIXTURES / "Bank3D"))


def normalize(stream: bytes) -> bytes:
    # canonical impl lives in the library (bench + golden tools share it)
    from yaik_tpu.format.headers import normalize_stream
    return normalize_stream(stream)


def test_lutfile_bit_exact(bank):
    assert bankmod.write_lut_file(bank) == (FIXTURES / "LutFile.lut").read_bytes()


@pytest.mark.parametrize("name", fixture_params())
def test_encode_golden(name, bank, lut_bytes, golden):
    img = np.asarray(Image.open(FIXTURES / f"{name}.png"))
    if img.ndim != 3 or img.shape[2] != 3:
        pytest.skip("alpha encode path pending")
    mine = encode_image(img, bank)
    ref_stream, ref_pixels = golden(name)
    if zstd.IS_REFERENCE_ZSTD:
        assert normalize(mine) == normalize(ref_stream)
    else:
        lut = api.assign_lut(lut_bytes)
        got = api.decode_image(mine, lut)
        assert np.array_equal(got, ref_pixels)
