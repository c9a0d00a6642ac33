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


@pytest.fixture(scope="module")
def lut2(lut):
    return api.assign_lut((FIXTURES / "LutFile.lut").read_bytes(),
                          (FIXTURES / "LutFile2D.lut").read_bytes())


def _streams_with_new_chunks():
    """Streams carrying the disabled-pass chunks (UCOL / 2DTL / PLNT)."""
    out = [
        (FIXTURES / "img64.ucol.yaik").read_bytes(),
        (FIXTURES / "corr2d128.2d.yaik").read_bytes(),
        (FIXTURES / "img64.plnt.yaik").read_bytes(),
        (FIXTURES / "gradpair192.gp.yaik").read_bytes(),
    ]
    return out


def test_new_chunk_byte_flips(lut2):
    """UCOL/2DTL/PLNT chunks under random corruption: clean decode or
    ValueError, never an internal exception (the reference's own security
    model extended to the chunks its decoder deprecated)."""
    rng = np.random.default_rng(1234)
    for base in _streams_with_new_chunks():
        base = bytearray(base)
        for _ in range(150):
            s = bytearray(base)
            for _ in range(rng.integers(1, 4)):
                pos = int(rng.integers(0, len(s)))
                s[pos] ^= int(rng.integers(1, 256))
            try:
                api.decode_image(bytes(s), lut2, engine="host")
            except ACCEPTABLE:
                pass


def test_new_chunk_truncations(lut2):
    for base in _streams_with_new_chunks():
        for cut in range(8, len(base), max(1, len(base) // 60)):
            try:
                api.decode_image(bytes(base[:cut]), lut2, engine="host")
            except ACCEPTABLE:
                pass


def test_lut2d_corruptions():
    lut3 = (FIXTURES / "LutFile.lut").read_bytes()
    base = bytearray((FIXTURES / "LutFile2D.lut").read_bytes())
    rng = np.random.default_rng(7)
    for cut in (0, 5, 9, len(base) - 3):
        try:
            api.assign_lut(lut3, bytes(base[:cut]))
        except ACCEPTABLE:
            pass
    for _ in range(50):
        s = bytearray(base)
        pos = int(rng.integers(0, len(s)))
        s[pos] ^= int(rng.integers(1, 256))
        try:
            bank = api.assign_lut(lut3, bytes(s))
            api.decode_image((FIXTURES / "corr2d128.2d.yaik").read_bytes(),
                             bank, engine="host")
        except ACCEPTABLE:
            pass


@pytest.mark.slow
def test_header_byte_sweep(lut2):
    """Deterministic sweep: flip every byte of every chunk HEADER (the
    random fuzz above demonstrably missed the UCOL bbox-header crash -
    ADVICE r1). Three XOR patterns per position cover sign/high-bit/low-bit
    corruption; both the host decoder and the planner must map each case to
    a clean decode or ValueError."""
    from yaik_tpu.decoder.reference import iter_chunks
    from yaik_tpu.decoder import planner as plannermod
    bases = [(FIXTURES / "img128.yaik").read_bytes()] + \
        _streams_with_new_chunks()
    for base in bases:
        spans = []
        try:
            for tag, off, body in iter_chunks(base):
                spans.append((off, min(len(body), 40)))
        except ValueError:
            pass
        for off, hlen in spans:
            for rel in range(hlen):
                for xor in (0x01, 0x80, 0xFF):
                    s = bytearray(base)
                    s[off + rel] ^= xor
                    try:
                        api.decode_image(bytes(s), lut2, engine="host")
                    except ACCEPTABLE:
                        pass
                    try:
                        plannermod.build_plan(bytes(s), lut2.expanded,
                                              lut2.expanded2d)
                    except ACCEPTABLE:
                        pass


def test_planner_fuzz(lut2):
    """The device-path planner parses chunks independently of the host
    decoder; corrupted streams must yield ValueError (or plan fine), never
    IndexError/struct.error."""
    from yaik_tpu.decoder import planner as plannermod
    rng = np.random.default_rng(99)
    bases = [(FIXTURES / "img128.yaik").read_bytes()] + \
        _streams_with_new_chunks()
    for base in bases:
        for _ in range(60):
            s = bytearray(base)
            for _ in range(rng.integers(1, 4)):
                pos = int(rng.integers(0, len(s)))
                s[pos] ^= int(rng.integers(1, 256))
            try:
                plannermod.build_plan(bytes(s), lut2.expanded,
                                      lut2.expanded2d)
            except ACCEPTABLE:
                pass
