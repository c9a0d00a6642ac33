"""Adversarial-input hardening: the reference decoder's security model
(size-checked zstd streams, chunk bounds, popcount cross-checks, over-
allocated LUT space - SURVEY section 4). Our decoders must never crash,
hang, or leak internal exceptions on corrupted streams: every outcome is
either a clean decode (pixel garbage is fine) or ValueError /
NotImplementedError.
"""
import numpy as np
import pytest

from tests.conftest import FIXTURES
from yaik_tpu.decoder import api

ACCEPTABLE = (ValueError, NotImplementedError)


@pytest.fixture(scope="module")
def lut():
    return api.assign_lut((FIXTURES / "LutFile.lut").read_bytes())


def _try(stream, lut):
    try:
        api.decode_image(bytes(stream), lut, engine="host")
    except ACCEPTABLE:
        pass


def test_byte_flips(lut):
    base = bytearray((FIXTURES / "img128.yaik").read_bytes())
    rng = np.random.default_rng(42)
    for _ in range(300):
        s = bytearray(base)
        for _ in range(rng.integers(1, 4)):
            pos = int(rng.integers(0, len(s)))
            s[pos] ^= int(rng.integers(1, 256))
        _try(s, lut)


def test_truncations(lut):
    base = (FIXTURES / "img128.yaik").read_bytes()
    rng = np.random.default_rng(7)
    for _ in range(100):
        n = int(rng.integers(0, len(base)))
        _try(base[:n], lut)


def test_garbage_streams(lut):
    rng = np.random.default_rng(3)
    for size in (0, 1, 11, 12, 64, 4096):
        _try(bytes(rng.integers(0, 256, size, dtype=np.uint8)), lut)
    # valid magic + garbage body
    base = (FIXTURES / "img128.yaik").read_bytes()
    _try(base[:12] + bytes(rng.integers(0, 256, 256, dtype=np.uint8)), lut)


def test_lut_corruptions():
    base = bytearray((FIXTURES / "LutFile.lut").read_bytes())
    rng = np.random.default_rng(9)
    for _ in range(50):
        s = bytearray(base)
        pos = int(rng.integers(0, len(s)))
        s[pos] ^= int(rng.integers(1, 256))
        try:
            api.assign_lut(bytes(s))
        except ACCEPTABLE:
            pass
    for n in (0, 4, 8, 100):
        try:
            api.assign_lut(bytes(base[:n]))
        except ACCEPTABLE:
            pass
