"""Device-side alpha + mipmap decode (VERDICT r1 #5).

Every ALPM mode (1-bit, 6-bit, 6-bit inverse, 6-bit mipmap-sparse, 8-bit,
constant-255 no-chunk) must produce [H, W, 4] bit-exactly on the jax
engine with alpha computed ON DEVICE (decode_core returns 4 channels; no
host reattach). Small 64x64 content keeps this in the fast tier.

Reference hot loops matched: decoder/YAIK_Alpha.cpp:25-377 (expand paths),
decoder/YAIK_Mipmap.cpp:23-148 (tile-bit expansion).
"""
import numpy as np
import pytest

from tests.conftest import FIXTURES
from yaik_tpu.decoder import api, jax_engine
from yaik_tpu.decoder import planner as plannermod
from yaik_tpu.encoder import bank as bankmod
from yaik_tpu.encoder.context import EncoderConfig, encode_image


@pytest.fixture(scope="module")
def bank():
    return bankmod.load_bank(str(FIXTURES / "Bank3D"))


@pytest.fixture(scope="module")
def lut():
    return api.assign_lut((FIXTURES / "LutFile.lut").read_bytes())


def _rgba(seed, alpha_fn):
    rng = np.random.default_rng(seed)
    img = np.zeros((64, 64, 4), np.uint8)
    yy, xx = np.mgrid[0:64, 0:64]
    img[:, :, 0] = (yy * 3) & 0xFF
    img[:, :, 1] = (xx * 3) & 0xFF
    img[:, :, 2] = ((yy + xx) * 2) & 0xFF
    img[:, :, 3] = alpha_fn(yy, xx, rng)
    return img


MODES = {
    "8bit": (dict(),
             lambda yy, xx, r: r.integers(0, 256, (64, 64), np.uint8)),
    "6bit": (dict(alpha_force_8bit=False, enable_mipmap=False),
             lambda yy, xx, r: ((yy * 4 + xx) % 256).astype(np.uint8)),
    "1bit": (dict(),
             lambda yy, xx, r: np.where((yy // 8 + xx // 8) % 2 == 0,
                                        255, 0).astype(np.uint8)),
    "sparse": (dict(alpha_force_8bit=False),
               lambda yy, xx, r: np.where((yy >= 16) & (xx >= 16),
                                          (yy * 4) % 256, 0
                                          ).astype(np.uint8)),
    "const255": (dict(),
                 lambda yy, xx, r: np.full((64, 64), 255, np.uint8)),
}


@pytest.mark.parametrize("name", sorted(MODES))
def test_device_alpha_mode(name, bank, lut):
    cfg_kw, alpha_fn = MODES[name]
    img = _rgba(hash(name) & 0xFFFF, alpha_fn)
    stream = encode_image(img, bank, EncoderConfig(**cfg_kw))
    plan = plannermod.build_plan(stream, lut.expanded)
    host = api.decode_image(stream, lut, engine="host")
    dev = api.decode_image(stream, lut, engine="jax")
    assert dev.shape[2] == 4
    assert np.array_equal(host, dev), f"{name}: host != jax (device alpha)"
    # the device path must actually run the alpha kernel, not a reattach
    spec = jax_engine.alpha_spec_of(plan)
    assert spec is not None
    if name == "sparse":
        assert plan.alpha_plan is not None and plan.alpha_plan.mip is not None
        assert spec[0] in (2, 3)


def test_device_alpha_batch(bank, lut):
    """decode_batch: alpha on device when specs match; host fallback when
    mixed; both bit-exact vs per-image host decode."""
    from yaik_tpu.parallel.batch import decode_batch
    imgs = [_rgba(s, MODES["8bit"][1]) for s in (1, 2, 3)]
    streams = [encode_image(im, bank) for im in imgs]
    outs = decode_batch(streams, lut)
    for st, out in zip(streams, outs):
        assert np.array_equal(out, api.decode_image(st, lut, engine="host"))

    # mixed specs (8-bit + 6-bit): falls back to host alpha, still exact
    st6 = encode_image(_rgba(9, MODES["6bit"][1]), bank,
                       EncoderConfig(alpha_force_8bit=False,
                                     enable_mipmap=False))
    mixed = [streams[0], st6]
    outs = decode_batch(mixed, lut)
    for st, out in zip(mixed, outs):
        assert np.array_equal(out, api.decode_image(st, lut, engine="host"))
