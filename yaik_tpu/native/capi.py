"""ctypes binding for libyaik_tpu (the C-ABI host decoder library).

The C surface mirrors the reference decoder's public API
(reference include/YAIK.h:52-143): YAIK_Init / YAIK_AssignLUT /
YAIK_DecodeImagePre / YAIK_DecodeImage / YAIK_Release / YAIK_GetErrorCode.
This module is a thin convenience layer for Python callers and tests; C/C++
callers include yaik_tpu/native/include/yaik_tpu.h directly.

Build: tools/build_native.sh -> yaik_tpu/native/libyaik_tpu.so
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libyaik_tpu.so")


class SMemAlloc(ctypes.Structure):
    _fields_ = [("customAlloc", ctypes.c_void_p),
                ("customFree", ctypes.c_void_p),
                ("customContext", ctypes.c_void_p)]


class SCustomDataSource(ctypes.Structure):
    _fields_ = [("planeR", ctypes.POINTER(ctypes.c_uint8)),
                ("planeG", ctypes.POINTER(ctypes.c_uint8)),
                ("planeB", ctypes.POINTER(ctypes.c_uint8)),
                ("planeA", ctypes.POINTER(ctypes.c_uint8)),
                ("strideR", ctypes.c_int32),
                ("strideG", ctypes.c_int32),
                ("strideB", ctypes.c_int32),
                ("strideA", ctypes.c_int32)]


class SDecodedImage(ctypes.Structure):
    pass


IMAGE_BUILDER_FUNC = ctypes.CFUNCTYPE(
    None, ctypes.POINTER(SDecodedImage), ctypes.POINTER(SCustomDataSource))

SDecodedImage._fields_ = [
    ("width", ctypes.c_uint16),
    ("height", ctypes.c_uint16),
    ("hasAlpha", ctypes.c_bool),
    ("customImageOutput", IMAGE_BUILDER_FUNC),
    ("userContextCustomImage", ctypes.c_void_p),
    ("userMemoryAllocator", SMemAlloc),
    ("outputImage", ctypes.POINTER(ctypes.c_uint8)),
    ("outputImageStride", ctypes.c_int32),
    ("hasAlpha1Bit", ctypes.c_bool),
    ("internalTag", ctypes.c_void_p),
]


def available() -> bool:
    return os.path.exists(_LIB_PATH)


_cache: dict = {}


def load(path: str | None = None):
    """Load (and memoize) the shared library with typed signatures."""
    path = path or _LIB_PATH
    if path in _cache:
        return _cache[path]
    lib = ctypes.CDLL(path)
    lib.YAIK_Init.restype = ctypes.c_void_p
    lib.YAIK_Init.argtypes = [ctypes.c_uint8, ctypes.POINTER(SMemAlloc)]
    lib.YAIK_AssignLUT.restype = None
    lib.YAIK_AssignLUT.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_uint32]
    lib.YAIK_Release.restype = None
    lib.YAIK_Release.argtypes = [ctypes.c_void_p]
    lib.YAIK_DecodeImagePre.restype = ctypes.c_bool
    lib.YAIK_DecodeImagePre.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_uint32,
                                        ctypes.POINTER(SDecodedImage)]
    lib.YAIK_DecodeImage.restype = ctypes.c_bool
    lib.YAIK_DecodeImage.argtypes = [ctypes.c_char_p, ctypes.c_uint32,
                                     ctypes.POINTER(SDecodedImage)]
    lib.YAIK_GetErrorCode.restype = ctypes.c_int
    lib.YAIK_GetErrorCode.argtypes = []
    _cache[path] = lib
    return lib


class CLibrary:
    """RAII wrapper over a YAIK_LIB handle."""

    def __init__(self, max_instances: int = 8, path: str | None = None):
        self.lib = load(path)
        self.handle = self.lib.YAIK_Init(max_instances, None)
        if not self.handle:
            raise RuntimeError(f"YAIK_Init failed: {self.error()}")

    def error(self) -> int:
        return int(self.lib.YAIK_GetErrorCode())

    def assign_lut(self, lut_data: bytes):
        self.lib.YAIK_AssignLUT(self.handle, lut_data, len(lut_data))
        e = self.error()
        if e:
            raise ValueError(f"YAIK_AssignLUT failed: error {e}")

    def decode(self, stream: bytes, callback=None) -> np.ndarray:
        """Decode a .yaik stream -> [h, w, 3|4] u8 (raises on failure)."""
        info = SDecodedImage()
        ok = self.lib.YAIK_DecodeImagePre(self.handle, stream, len(stream),
                                          ctypes.byref(info))
        if not ok:
            raise ValueError(f"YAIK_DecodeImagePre failed: error {self.error()}")
        if callback is not None:
            info.customImageOutput = IMAGE_BUILDER_FUNC(callback)
            ok = self.lib.YAIK_DecodeImage(stream, len(stream),
                                           ctypes.byref(info))
            if not ok:
                raise ValueError(f"YAIK_DecodeImage failed: error {self.error()}")
            return None
        comps = 4 if info.hasAlpha else 3
        out = np.empty((info.height, info.width, comps), np.uint8)
        info.outputImage = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        info.outputImageStride = info.width * comps
        ok = self.lib.YAIK_DecodeImage(stream, len(stream), ctypes.byref(info))
        if not ok:
            raise ValueError(f"YAIK_DecodeImage failed: error {self.error()}")
        return out

    def close(self):
        if self.handle:
            self.lib.YAIK_Release(self.handle)
            self.handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
