"""ctypes binding for the native host runtime (libyaik_host.so).

Falls back to None when the library isn't built; callers keep the pure
Python implementations as reference and fallback. Build with
tools/build_native.sh.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libyaik_host.so")

lib = None
if os.path.exists(_LIB_PATH):
    lib = ctypes.CDLL(_LIB_PATH)
    lib.palette_decompress.restype = ctypes.c_int
    lib.palette_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int]
    lib.palette_compress.restype = ctypes.c_int
    lib.palette_compress.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.dyn1d_plane.restype = ctypes.c_int
    lib.dyn1d_plane.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p]


def available() -> bool:
    return lib is not None


def palette_decompress(data: bytes, output_size: int,
                       color_compression: int) -> np.ndarray:
    out = np.zeros(output_size, np.uint8)
    r = lib.palette_decompress(data, len(data),
                               out.ctypes.data_as(ctypes.c_void_p),
                               output_size, color_compression)
    if r < 0:
        raise ValueError("palette stream invalid")
    return out


class NativePaletteState:
    """Persistent CodeRGB state (matches encoder.palette_codec.PaletteState)."""

    def __init__(self):
        self.entries = np.zeros(4096 * 3, np.int32)
        self.length = np.zeros(1, np.int32)


def palette_compress(data: bytes, state: NativePaletteState) -> bytes | None:
    out = np.zeros(max(len(data) * 3, 1024), np.uint8)
    r = lib.palette_compress(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p), len(out),
        state.entries.ctypes.data_as(ctypes.c_void_p),
        state.length.ctypes.data_as(ctypes.c_void_p))
    if r < 0 or r >= len(data) * 3:
        return None
    return out[:r].tobytes()


def dyn1d_plane(plane: np.ndarray, claim: np.ndarray,
                color_compression: int, range_compression: int):
    h, w = plane.shape
    p8 = np.ascontiguousarray(plane, np.uint8)
    c8 = np.ascontiguousarray(claim, np.uint8)
    pix = np.zeros(w * h, np.uint8)
    typ = np.zeros((w // 8) * (h // 8) * 3, np.uint8)
    tlen = np.zeros(1, np.int32)
    plen = lib.dyn1d_plane(p8.ctypes.data_as(ctypes.c_void_p),
                           c8.ctypes.data_as(ctypes.c_void_p), w, h,
                           color_compression, range_compression,
                           pix.ctypes.data_as(ctypes.c_void_p),
                           typ.ctypes.data_as(ctypes.c_void_p),
                           tlen.ctypes.data_as(ctypes.c_void_p))
    return pix[:plen].tobytes(), typ[:int(tlen[0])].tobytes()
