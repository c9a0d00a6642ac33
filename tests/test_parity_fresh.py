"""Generalization parity: FRESH images (seeds disjoint from the fixture
corpus) encoded by us vs the compiled C++ reference encoder - streams must
be byte-identical (modulo the reference's two uninitialized header bytes)
and both decoders must agree pixel-for-pixel. Skipped when the reference
toolchain isn't built (judge machines without /root/reference)."""
import pathlib
import subprocess

import numpy as np
import pytest
from PIL import Image

from tests.conftest import FIXTURES
from tests.test_encoder_golden import normalize
from yaik_tpu.decoder import api
from yaik_tpu.encoder import bank as bankmod
from yaik_tpu.encoder.context import encode_image
from yaik_tpu.entropy import zstd_backend as zstd

REFBUILD = pathlib.Path(__file__).parent.parent / "tools" / "refbuild"

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not (REFBUILD / "ref_encoder").exists() or not zstd.IS_REFERENCE_ZSTD,
    reason="reference toolchain not built")]


def fresh_images():
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
    import gen_images
    rng = np.random.default_rng(777)   # disjoint from fixture seed
    return {
        "fresh_main": gen_images.make_main(rng, 128),
        "fresh_quilt": np.clip(np.round(gen_images.gradient_quilt(
            rng, 64, 64, 16)), 0, 255).astype(np.uint8),
    }


@pytest.fixture(scope="module")
def bank():
    return bankmod.load_bank(str(FIXTURES / "Bank3D"))


def test_fresh_image_parity(bank, tmp_path):
    for name, img in fresh_images().items():
        png = tmp_path / f"{name}.png"
        Image.fromarray(img).save(png)
        # reference encoder needs Bank3D/ in its cwd
        bankdir = tmp_path / "Bank3D"
        if not bankdir.exists():
            import shutil
            shutil.copytree(FIXTURES / "Bank3D", bankdir)
        res = subprocess.run(
            [str(REFBUILD / "ref_encoder"), png.name, f"{name}.yaik"],
            cwd=tmp_path, capture_output=True, text=True)
        assert res.returncode == 0, res.stderr[-500:]
        ref_stream = (tmp_path / f"{name}.yaik").read_bytes()
        mine = encode_image(img, bank)
        assert normalize(mine) == normalize(ref_stream), \
            f"{name}: stream mismatch on fresh content"
        # decode agreement through both engines
        lut = api.assign_lut((FIXTURES / "LutFile.lut").read_bytes())
        a = api.decode_image(ref_stream, lut, engine="host")
        b = api.decode_image(mine, lut, engine="jax")
        assert np.array_equal(a, b)


def _parse_ref_log(text: str):
    """Parse the reference's <out>.yaik.log.txt (EncoderContext.cpp:
    9480-9537): 'key:value' integer lines plus the histogram3D CSV row."""
    vals, hist3d = {}, None
    lines = text.splitlines()
    for i, ln in enumerate(lines):
        if ln.startswith("-----Histogram 3D"):
            hist3d = [int(v) for v in lines[i + 1].split(",")]
        elif ":" in ln and not ln.startswith("-"):
            k, v = ln.split(":", 1)
            vals[k] = int(v)
    return vals, hist3d


def test_stats_parity_vs_reference_log(bank, tmp_path):
    """Per-technique stats parity: the reference's quality dashboard
    (pixels claimed per technique per tile size, LUT histogram, per-tag
    chunk byte blocks) must match utils.stats.analyze() on our stream -
    asserting the *accounting*, not just the stream bytes."""
    import shutil
    from yaik_tpu.decoder.reference import iter_chunks
    from yaik_tpu.utils import stats as statsmod

    img = fresh_images()["fresh_main"]
    png = tmp_path / "statpar.png"
    Image.fromarray(img).save(png)
    shutil.copytree(FIXTURES / "Bank3D", tmp_path / "Bank3D")
    res = subprocess.run(
        [str(REFBUILD / "ref_encoder"), png.name, "statpar.yaik"],
        cwd=tmp_path, capture_output=True, text=True)
    assert res.returncode == 0, res.stderr[-500:]
    ref, hist3d = _parse_ref_log(
        (tmp_path / "statpar.yaik.log.txt").read_text())

    mine = encode_image(img, bank)
    st = statsmod.analyze(mine)
    assert ref["totalPixelCount"] == st.total_pixels
    for a, b in ((16, 16), (16, 8), (8, 16), (8, 8), (4, 8), (8, 4), (4, 4)):
        assert ref[f"pixelCountGradient{a}_{b}"] == \
            st.gradient_pixels.get(f"{a}x{b}", 0), f"gradient {a}x{b}"
    assert ref["pixelCount3DGradientTotal"] == sum(
        st.gradient_pixels.values())
    # the reference's 3D pixel counters and histogram3D are DEAD in the
    # normal pipeline: they sit behind `testedLUT == foundE` (:6560) and
    # normal runs set testedLUT = correlationPatternCount3D (:9118), one
    # past any valid foundE - they only accumulate in LUT-eval mode.
    # Assert the quirk holds, then validate our live counters internally.
    for a, b in ((16, 8), (8, 16), (8, 8), (8, 4), (4, 8), (4, 4)):
        assert ref[f"pixelCount3D_Lut_{a}_{b}"] == 0
    assert ref["pixelCount3DLUTTotal"] == 0
    assert not any(hist3d)
    assert sum(st.tile3d_bit_pixels.values()) == sum(
        st.tile3d_pixels.values())
    assert sum(st.lut_histogram.values()) == st.tile3d_count
    # chunk byte blocks ARE live: the 4-byte-rounded length field per tag
    # (GTIL plane=7 -> sizeBlock3DGradient :4327, 3DTL -> sizeBlock3DLUT
    # :7618, their sum -> compressedFileTotal with the 1DTL term zeroed
    # at :9441); default pipeline has no 2D/1-plane gradient chunks
    sums = {}
    for tag, _off, body in iter_chunks(mine):
        sums[tag.decode()] = sums.get(tag.decode(), 0) + len(body)
    assert ref["sizeBlock3DGradient"] == sums.get("GTIL", 0)
    assert ref["sizeBlock3DLUT"] == sums.get("3DTL", 0)
    assert ref["sizeBlock2DGradient"] == 0
    assert ref["sizeBlock1DGradient"] == 0
    assert ref["compressedFileTotal"] == (sums.get("GTIL", 0)
                                          + sums.get("3DTL", 0))


@pytest.mark.skipif(not (REFBUILD / "ref_encoder_plnt").exists(),
                    reason="disabled-pass drivers not built")
def test_fresh_disabled_pass_parity(bank, tmp_path):
    """FRESH content through the disabled passes: UCOL, 2DTL (full
    pipeline), and PLNT streams must match the compiled reference passes
    byte-for-byte on images the fixtures never saw."""
    import shutil
    import struct
    import sys
    from yaik_tpu.encoder import bank2d as bank2dmod
    from yaik_tpu.encoder import plnt as plntmod
    from yaik_tpu.encoder import single_color
    from yaik_tpu.encoder.context import EncoderConfig
    from yaik_tpu.format.headers import FileHeader, MAGIC

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
    import gen_images
    rng = np.random.default_rng(424242)
    img = gen_images.make_corr2d(rng, 64)
    png = tmp_path / "fresh2d.png"
    Image.fromarray(img).save(png)
    shutil.copytree(FIXTURES / "Bank3D", tmp_path / "Bank3D")
    shutil.copytree(FIXTURES / "Bank2D", tmp_path / "Bank2D")
    h, w = img.shape[:2]
    planes = img.transpose(2, 0, 1).astype(np.int32)

    # UCOL
    res = subprocess.run(
        [str(REFBUILD / "ref_encoder_ucol"), png.name, "f.ucol.yaik"],
        cwd=tmp_path, capture_output=True, text=True)
    assert res.returncode == 0
    gold = (tmp_path / "f.ucol.yaik").read_bytes()
    chunk, _ = single_color.single_color_out(planes, None, (0, 0, w, h))
    gm = bytearray(gold)
    gm[12 + 8 + 26:12 + 8 + 28] = b"\0\0"   # uninitialized header pad
    assert (FileHeader(MAGIC, 1, w, h, 0).pack() + chunk
            + struct.pack("<I", 0xDEADBEEF)) == bytes(gm)

    # full pipeline with 2DTL
    res = subprocess.run(
        [str(REFBUILD / "ref_encoder_2d"), png.name, "f.2d.yaik"],
        cwd=tmp_path, capture_output=True, text=True)
    assert res.returncode == 0
    gold = (tmp_path / "f.2d.yaik").read_bytes()
    b2 = bank2dmod.load_bank2d(str(FIXTURES / "Bank2D"))
    mine = encode_image(img, bank, EncoderConfig(enable_2d=True), bank2d=b2)
    assert normalize(mine) == normalize(gold)

    # PLNT
    res = subprocess.run(
        [str(REFBUILD / "ref_encoder_plnt"), png.name, "f.plnt.yaik"],
        cwd=tmp_path, capture_output=True, text=True)
    assert res.returncode == 0
    gold = (tmp_path / "f.plnt.yaik").read_bytes()
    mine = (FileHeader(MAGIC, 1, w, h, 0).pack()
            + plntmod.encode_plnt(planes, None, (0, 0, w, h))
            + struct.pack("<I", 0xDEADBEEF))
    assert mine == gold

    # plane-subset gradients on fresh content
    img2 = gen_images.make_gradpair(rng, 128)
    png2 = tmp_path / "freshgp.png"
    Image.fromarray(img2).save(png2)
    res = subprocess.run(
        [str(REFBUILD / "ref_encoder_gradpair"), png2.name, "f.gp.yaik"],
        cwd=tmp_path, capture_output=True, text=True)
    assert res.returncode == 0
    gold = (tmp_path / "f.gp.yaik").read_bytes()
    mine = encode_image(img2, bank,
                        EncoderConfig(enable_plane_gradients=True))
    assert normalize(mine) == normalize(gold)
