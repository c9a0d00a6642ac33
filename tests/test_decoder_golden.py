"""Golden decode tests: our decoder vs reference-decoder output, bit-exact."""
import numpy as np
import pytest

from tests.conftest import fixture_names
from yaik_tpu.decoder import api


@pytest.mark.parametrize("name", fixture_names())
def test_host_decode_bit_exact(name, lut_bytes, golden):
    stream, want = golden(name)
    lut = api.assign_lut(lut_bytes)
    got = api.decode_image(stream, lut, engine="host")
    assert got.shape == want.shape
    diff = np.flatnonzero(got != want)
    assert diff.size == 0, (
        f"{diff.size} bytes differ; first at {np.unravel_index(diff[0], got.shape)}"
        f" got={got.reshape(-1)[diff[0]]} want={want.reshape(-1)[diff[0]]}")
