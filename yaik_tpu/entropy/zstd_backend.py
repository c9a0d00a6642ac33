"""zstd binding via ctypes.

The reference vendors zstd 1.3.4 and its *compressed bytes* are part of what
"bit-identical stream" means for the encoder. tools/build_reference.sh builds
that exact version as libzstd134.so from the read-only reference mount; when
present we load it for compression (and decompression). Otherwise we fall
back to the system libzstd: decode compatibility is unaffected (zstd format
is stable), but freshly encoded streams will differ at the entropy layer
while still decoding to identical pixels.

Reference usage: ZSTD_compress level 18 for most streams
(EncoderContext.cpp:3697 etc.), 5..21 sweep for alpha (:1590).
"""
from __future__ import annotations

import ctypes
import ctypes.util
import os

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CANDIDATES = [
    os.environ.get("YAIK_ZSTD_LIB", ""),
    os.path.join(_HERE, "tools", "refbuild", "libzstd134.so"),
]


def _try_autobuild() -> None:
    """Best-effort build of the vendored zstd 1.3.4 shared lib on first
    import (it lives in the untracked tools/refbuild/, so fresh checkouts
    lack it and fresh encodes silently lose entropy-layer bit-identity with
    the reference). Delegates to `tools/build_reference.sh zstd` — the one
    canonical recipe, which writes atomically via temp+rename, so a killed
    build never leaves a half-written .so behind. Needs the read-only
    reference mount; failures emit one warning line and the system zstd
    fallback applies. YAIK_NO_AUTOBUILD=1 disables."""
    if os.environ.get("YAIK_NO_AUTOBUILD"):
        return
    ref = os.environ.get("YAIK_REFERENCE", "/root/reference")
    if not os.path.isdir(os.path.join(ref, "external", "zstd")):
        return
    target = os.path.join(_HERE, "tools", "refbuild", "libzstd134.so")
    script = os.path.join(_HERE, "tools", "build_reference.sh")
    if os.path.exists(target) or not os.path.exists(script):
        return
    try:
        import subprocess
        import sys
        r = subprocess.run(
            ["bash", script, "zstd"], timeout=300, check=False,
            env={**os.environ, "REF": ref},
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        if r.returncode != 0 or not os.path.exists(target):
            print("yaik_tpu: libzstd134 autobuild failed "
                  "(rc=%s); falling back to system zstd — fresh encodes "
                  "lose entropy-layer bit-identity" % r.returncode,
                  file=sys.stderr)
    except Exception as e:
        import sys
        print(f"yaik_tpu: libzstd134 autobuild errored ({e!r}); "
              "falling back to system zstd", file=sys.stderr)


def _load():
    _try_autobuild()
    for p in _CANDIDATES:
        if p and os.path.exists(p):
            try:
                return ctypes.CDLL(p), True
            except OSError:
                # partial/incompatible .so (e.g. interrupted legacy build):
                # fall through to the next candidate / system zstd
                import sys
                print(f"yaik_tpu: could not load {p}; trying next zstd",
                      file=sys.stderr)
    name = ctypes.util.find_library("zstd") or "libzstd.so.1"
    return ctypes.CDLL(name), False


_lib, IS_REFERENCE_ZSTD = _load()

_lib.ZSTD_compressBound.restype = ctypes.c_size_t
_lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
_lib.ZSTD_compress.restype = ctypes.c_size_t
_lib.ZSTD_compress.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                               ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int]
_lib.ZSTD_decompress.restype = ctypes.c_size_t
_lib.ZSTD_decompress.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                 ctypes.c_void_p, ctypes.c_size_t]
_lib.ZSTD_isError.restype = ctypes.c_uint
_lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
_lib.ZSTD_versionNumber.restype = ctypes.c_uint
try:
    _lib.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
    _lib.ZSTD_getFrameContentSize.argtypes = [ctypes.c_void_p,
                                              ctypes.c_size_t]
    _HAS_FCS = True
except AttributeError:   # very old zstd
    _HAS_FCS = False

VERSION = int(_lib.ZSTD_versionNumber())

import threading as _threading

import numpy as _np

_lib.ZSTD_createDCtx.restype = ctypes.c_void_p
_lib.ZSTD_decompressDCtx.restype = ctypes.c_size_t
_lib.ZSTD_decompressDCtx.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_size_t, ctypes.c_void_p,
                                     ctypes.c_size_t]
_TLS = _threading.local()


def _dctx():
    # one reused decompression context per thread: ZSTD_decompress
    # allocates+frees a DCtx internally on every call (~20us each, and the
    # planner makes ~28 calls per image)
    d = getattr(_TLS, "dctx", None)
    if d is None:
        d = _TLS.dctx = ctypes.c_void_p(_lib.ZSTD_createDCtx())
    return d


_lib.ZSTD_createCCtx.restype = ctypes.c_void_p
_lib.ZSTD_compressCCtx.restype = ctypes.c_size_t
_lib.ZSTD_compressCCtx.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_size_t, ctypes.c_void_p,
                                   ctypes.c_size_t, ctypes.c_int]


def _cctx():
    # one reused compression context per thread: one-shot ZSTD_compress
    # allocates+frees the multi-MB level-18 workspace on EVERY call, and
    # the encoder makes ~28 calls per image. ZSTD_compressCCtx fully
    # re-initializes per call, so the output bytes are identical to
    # ZSTD_compress (golden byte-exactness tests cover this).
    c = getattr(_TLS, "cctx", None)
    if c is None:
        c = _TLS.cctx = ctypes.c_void_p(_lib.ZSTD_createCCtx())
    return c


def compress(data: bytes, level: int = 18, dst_capacity: int | None = None) -> bytes:
    """ZSTD_compress semantics. dst_capacity mirrors the reference's
    explicit output buffer sizes (it never uses compressBound); results
    don't depend on it unless too small, in which case zstd errors like
    the reference would."""
    if dst_capacity is None:
        dst_capacity = int(_lib.ZSTD_compressBound(len(data)))
    out = _np.empty(dst_capacity, _np.uint8)    # no zero-fill (hot path)
    n = _lib.ZSTD_compressCCtx(_cctx(), out.ctypes.data, dst_capacity,
                               data, len(data), level)
    if _lib.ZSTD_isError(n):
        raise RuntimeError(f"ZSTD_compress failed (capacity {dst_capacity})")
    return out[:n].tobytes()


def decompress(data: bytes, expected_size: int) -> bytes:
    """ZSTD_decompress with exact expected-size check (DecompressData,
    YAIK_API.cpp:505-521)."""
    return decompress_arr(data, expected_size).tobytes()


def decompress_arr(data: bytes, expected_size: int):
    """decompress returning a u8 numpy array (no bytes-copy; the planner's
    hot path feeds np.frombuffer anyway)."""
    out = _np.empty(expected_size if expected_size else 1, _np.uint8)
    n = _lib.ZSTD_decompressDCtx(_dctx(), out.ctypes.data, expected_size,
                                 data, len(data))
    if _lib.ZSTD_isError(n) or n != expected_size:
        raise ValueError(f"zstd decompress: got {n}, expected {expected_size}")
    return out[:expected_size]


def frame_content_size(data: bytes) -> int | None:
    """Decoded size recorded in the zstd frame header, or None if unknown.
    (Single-shot ZSTD_compress always records it, so streams written by the
    reference or by us carry it.)"""
    if not _HAS_FCS or not data:
        return None
    n = int(_lib.ZSTD_getFrameContentSize(data, len(data)))
    if n >= 2 ** 63:   # ZSTD_CONTENTSIZE_UNKNOWN / _ERROR wrap
        return None
    return n
