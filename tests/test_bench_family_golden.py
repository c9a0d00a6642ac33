"""Goldens for the bench-lane chunk-family streams (VERDICT r3 #5).

These streams come from OUR encoder (tools/gen_bench_family_fixtures.py);
their goldens certify two different things, recorded per-file in the npz
``provenance`` field:

- bench_rgba512.dec.npz: **reference-decoder output** (tools/refbuild/
  ref_decoder) - a true cross-implementation parity golden for the
  MIPM+ALPM alpha path (/root/reference/decoder/YAIK_Alpha.cpp:25-377,
  YAIK_Mipmap.cpp:23-148).
- bench_2d512 / bench_ucol512: **host-decoder stability goldens**. The
  reference DecodeImage driver has no handler for the 2DTL / UCOL chunk
  tags (err=20 at the chunk mux - these passes are encoder-side-only
  upstream; decode semantics come from the restored passes whose parity
  is certified by tests/test_corr2d.py / test_single_color.py on
  reference-encoded streams). The golden here pins the full-stream
  composition against regressions.
"""
import numpy as np
import pytest

from tests.conftest import FIXTURES
from yaik_tpu.decoder import api

FAMILIES = ["bench_rgba512", "bench_2d512", "bench_ucol512"]


@pytest.fixture(scope="module")
def lut_with_2d():
    return api.assign_lut((FIXTURES / "LutFile.lut").read_bytes(),
                          (FIXTURES / "LutFile2D.lut").read_bytes())


@pytest.mark.parametrize("name", FAMILIES)
def test_family_host_decode_golden(name, lut_with_2d):
    stream = (FIXTURES / f"{name}.yaik").read_bytes()
    npz = np.load(FIXTURES / f"{name}.dec.npz")
    want = npz["rgb"]
    got = api.decode_image(stream, lut_with_2d, engine="host")
    assert got.shape == want.shape
    diff = np.flatnonzero(got != want)
    assert diff.size == 0, (
        f"{name} ({npz['provenance']}): {diff.size} bytes differ; first at "
        f"{np.unravel_index(diff[0], got.shape)}")


@pytest.mark.parametrize("name", FAMILIES)
def test_family_device_decode_golden(name, lut_with_2d):
    """Device (jax) engine, CPU-backend XLA here, vs the same goldens -
    the device alpha / 2DTL / UCOL+SMAP overlay paths."""
    stream = (FIXTURES / f"{name}.yaik").read_bytes()
    want = np.load(FIXTURES / f"{name}.dec.npz")["rgb"]
    got = api.decode_image(stream, lut_with_2d, engine="jax")
    assert got.shape == want.shape
    assert np.array_equal(got, want)
