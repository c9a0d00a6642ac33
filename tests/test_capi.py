"""C-ABI host decoder library (libyaik_tpu) vs the Python host decoder.

Pixel parity on every chunk type, the custom-callback swizzled-plane
contract, instance-pool behavior, and the failure model (false + sticky
error code, never a crash). API shape: reference include/YAIK.h:52-143.
Skipped when the library isn't built (tools/build_native.sh).
"""
import ctypes

import numpy as np
import pytest
from PIL import Image

from tests.conftest import FIXTURES
from yaik_tpu.decoder import api
from yaik_tpu.encoder import bank as bankmod
from yaik_tpu.native import capi

pytestmark = pytest.mark.skipif(not capi.available(),
                                reason="libyaik_tpu.so not built")


@pytest.fixture(scope="module")
def clib():
    lib = capi.CLibrary(max_instances=4)
    lib.assign_lut((FIXTURES / "LutFile.lut").read_bytes())
    lib.assign_lut((FIXTURES / "LutFile2D.lut").read_bytes())
    yield lib
    lib.close()


@pytest.fixture(scope="module")
def pylut():
    return api.assign_lut((FIXTURES / "LutFile.lut").read_bytes())


@pytest.fixture(scope="module")
def pylut2d():
    return api.assign_lut((FIXTURES / "LutFile.lut").read_bytes(),
                          (FIXTURES / "LutFile2D.lut").read_bytes())


@pytest.mark.parametrize("name", ["img64", "img128", "img512", "img512b",
                                  "quilt128"])
def test_fixture_parity(clib, pylut, name):
    stream = (FIXTURES / f"{name}.yaik").read_bytes()
    mine = clib.decode(stream)
    ref = api.decode_image(stream, pylut, engine="host")
    assert np.array_equal(mine, ref)


@pytest.mark.parametrize("name", ["img64.ucol", "img512.ucol",
                                  "gradpair192.gp"])
def test_disabled_pass_parity(clib, pylut, name):
    stream = (FIXTURES / f"{name}.yaik").read_bytes()
    mine = clib.decode(stream)
    ref = api.decode_image(stream, pylut, engine="host")
    assert np.array_equal(mine, ref)


def test_2dtl_parity(clib, pylut2d):
    stream = (FIXTURES / "corr2d128.2d.yaik").read_bytes()
    mine = clib.decode(stream)
    ref = api.decode_image(stream, pylut2d, engine="host")
    assert np.array_equal(mine, ref)


def test_plnt_validate_skip(clib, pylut):
    # PLNT is structure-validated and skipped on both sides
    stream = (FIXTURES / "img64.plnt.yaik").read_bytes()
    mine = clib.decode(stream)
    ref = api.decode_image(stream, pylut, engine="host")
    assert np.array_equal(mine, ref)


@pytest.mark.slow
def test_alpha_modes_parity(clib, pylut):
    """RGBA streams through every ALPM mode (8-bit, 6-bit, 1-bit, sparse
    6-bit with MIPM) - C output must match the Python host decoder."""
    from yaik_tpu.encoder.context import EncoderConfig, encode_image
    bank = bankmod.load_bank(str(FIXTURES / "Bank3D"))
    img = np.asarray(Image.open(FIXTURES / "sprite256.png"))
    variants = {
        "8bit": encode_image(img, bank),
        "6bit": encode_image(img, bank,
                             EncoderConfig(alpha_force_8bit=False,
                                           enable_mipmap=False)),
    }
    binimg = img.copy()
    binimg[:, :, 3] = np.where(img[:, :, 3] >= 128, 255, 0)
    variants["1bit"] = encode_image(binimg, bank)
    mipimg = img.copy()
    mipimg[:64, :, 3] = 0      # transparent band -> MIPM + sparse alpha
    variants["mipm"] = encode_image(
        mipimg, bank, EncoderConfig(alpha_force_8bit=False))
    for name, stream in variants.items():
        mine = clib.decode(stream)
        ref = api.decode_image(stream, pylut, engine="host")
        assert np.array_equal(mine, ref), f"alpha variant {name}"


def test_custom_callback_swizzled_contract(clib, pylut):
    """customImageOutput receives 8x8-tile-swizzled planes (YAIK.h:205-224);
    de-swizzling them must reproduce the default-path pixels."""
    stream = (FIXTURES / "img64.yaik").read_bytes()
    ref = api.decode_image(stream, pylut, engine="host")
    h, w = ref.shape[:2]
    got = {}

    def builder(info_p, src_p):
        src = src_p.contents
        tiles_x = (w + 7) // 8
        tiles_y = (h + 7) // 8
        out = np.zeros((3, tiles_y * 8, tiles_x * 8), np.uint8)
        for pi, plane in enumerate((src.planeR, src.planeG, src.planeB)):
            flat = np.ctypeslib.as_array(plane, (tiles_y * tiles_x * 64,))
            t = flat.reshape(tiles_y, tiles_x, 8, 8)
            out[pi] = t.transpose(0, 2, 1, 3).reshape(tiles_y * 8, tiles_x * 8)
        got["img"] = out[:, :h, :w].transpose(1, 2, 0).copy()

    clib.decode(stream, callback=builder)
    assert np.array_equal(got["img"], ref)


def test_error_model(clib):
    # bad magic
    with pytest.raises(ValueError):
        clib.decode(b"NOPE" + bytes(100))
    assert True  # no crash; error code was consumed by the raise
    # truncated stream (cut mid-chunk)
    stream = (FIXTURES / "img64.yaik").read_bytes()
    with pytest.raises(ValueError):
        clib.decode(stream[:len(stream) // 2])
    # corrupt a chunk-length field -> clean failure
    bad = bytearray(stream)
    bad[16] ^= 0xFF
    with pytest.raises(ValueError):
        clib.decode(bytes(bad))
    # a valid decode still works afterwards (no sticky poisoning of state)
    assert clib.decode(stream) is not None


def test_header_byte_flips(clib):
    """Every single-byte flip in the first 256 bytes either decodes or
    fails cleanly - never crashes the process."""
    stream = bytearray((FIXTURES / "img64.yaik").read_bytes())
    for off in range(min(256, len(stream))):
        bad = bytearray(stream)
        bad[off] ^= 0xA5
        try:
            clib.decode(bytes(bad))
        except ValueError:
            pass


class CountingAllocator:
    """User allocator that tracks every outstanding allocation — the
    rebuild's twin of the reference's YAIK_DEVEL 200-slot leak tracker
    (reference decoder/YAIK_API.cpp:584-626): after every decode, success
    or failure, allocations must balance and no pointer may be freed
    twice or unknown."""

    def __init__(self):
        self.libc = ctypes.CDLL(None)
        self.libc.malloc.restype = ctypes.c_void_p
        self.libc.malloc.argtypes = [ctypes.c_size_t]
        self.libc.free.argtypes = [ctypes.c_void_p]
        self.live = {}
        self.n_alloc = 0
        self.errors = []
        ALLOC = ctypes.CFUNCTYPE(ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_size_t)
        FREE = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_void_p)
        self._alloc_cb = ALLOC(self._alloc)
        self._free_cb = FREE(self._free)

    def _alloc(self, ctx, size):
        p = self.libc.malloc(size)
        if p:
            self.n_alloc += 1
            self.live[int(p)] = int(size)
        return p

    def _free(self, ctx, addr):
        if addr is None:
            self.errors.append("free(NULL)")
            return
        if int(addr) not in self.live:
            self.errors.append(f"free of unknown/double ptr {addr:#x}")
            return
        del self.live[int(addr)]
        self.libc.free(addr)

    def install(self, info: capi.SDecodedImage):
        info.userMemoryAllocator.customAlloc = ctypes.cast(
            self._alloc_cb, ctypes.c_void_p)
        info.userMemoryAllocator.customFree = ctypes.cast(
            self._free_cb, ctypes.c_void_p)
        info.userMemoryAllocator.customContext = None

    def check(self, what):
        assert not self.errors, f"{what}: {self.errors[:4]}"
        assert not self.live, (
            f"{what}: {len(self.live)} leaked allocations "
            f"({sum(self.live.values())} bytes)")


def _decode_counted(clib, alloc, stream):
    """One Pre+Decode cycle with the counting allocator installed on the
    decode path (the reference API contract: Pre installs defaults, the
    caller overrides userMemoryAllocator before DecodeImage). The output
    buffer is sized from the Pre-reported dims — a header flip can change
    them, and the decoder is entitled to fill the whole claimed image."""
    info = capi.SDecodedImage()
    if not clib.lib.YAIK_DecodeImagePre(clib.handle, stream, len(stream),
                                        ctypes.byref(info)):
        return False
    alloc.install(info)
    comps = 4 if info.hasAlpha else 3
    out = np.empty((max(info.height, 1), max(info.width, 1), comps),
                   np.uint8)
    info.outputImage = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    info.outputImageStride = out.shape[1] * comps
    return clib.lib.YAIK_DecodeImage(stream, len(stream), ctypes.byref(info))


def test_counting_allocator_success_paths(clib):
    """Allocations balance after successful decodes of every fixture
    family (reference YAIK_API.cpp:584-626 tracker semantics)."""
    alloc = CountingAllocator()
    for name in ["img64", "img128", "img512", "img64.ucol",
                 "gradpair192.gp", "img64.plnt"]:
        stream = (FIXTURES / f"{name}.yaik").read_bytes()
        assert _decode_counted(clib, alloc, stream)
        alloc.check(name)
    assert alloc.n_alloc > 0      # the allocator was actually exercised


def test_counting_allocator_error_paths(clib):
    """Every goto-error cleanup path frees exactly what it allocated: the
    byte-flip sweep over the first 256 offsets plus truncations, each
    followed by a balance check — the exact bug class the reference's
    YAIK_DEVEL tracking table exists to catch."""
    alloc = CountingAllocator()
    stream = bytearray((FIXTURES / "img64.yaik").read_bytes())
    for off in range(min(256, len(stream))):
        bad = bytes(stream[:off] + bytes([stream[off] ^ 0xA5])
                    + stream[off + 1:])
        _decode_counted(clib, alloc, bad)
        clib.error()              # drain the sticky code
        alloc.check(f"byte flip @{off}")
    for cut in (20, len(stream) // 2, len(stream) - 3):
        _decode_counted(clib, alloc, bytes(stream[:cut]))
        clib.error()
        alloc.check(f"truncate @{cut}")
    # allocation failure injection: the Nth allocation fails; every prefix
    # must clean up what preceded it (the reference's "TEST FAILURE POINT")
    good = bytes(stream)
    for fail_at in range(1, 12):
        state = {"left": fail_at}
        orig = alloc._alloc

        def failing(ctx, size):
            state["left"] -= 1
            if state["left"] < 0:
                return None
            return orig(ctx, size)

        ALLOC = ctypes.CFUNCTYPE(ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_size_t)
        alloc._alloc_cb = ALLOC(failing)
        _decode_counted(clib, alloc, good)
        clib.error()
        alloc.check(f"alloc fail @{fail_at}")
        alloc._alloc_cb = ALLOC(orig)


def test_instance_pool():
    lib = capi.CLibrary(max_instances=2)
    try:
        lib.assign_lut((FIXTURES / "LutFile.lut").read_bytes())
        stream = (FIXTURES / "img64.yaik").read_bytes()
        raw = lib.lib
        infos = [capi.SDecodedImage() for _ in range(3)]
        assert raw.YAIK_DecodeImagePre(lib.handle, stream, len(stream),
                                       ctypes.byref(infos[0]))
        assert raw.YAIK_DecodeImagePre(lib.handle, stream, len(stream),
                                       ctypes.byref(infos[1]))
        # pool exhausted
        assert not raw.YAIK_DecodeImagePre(lib.handle, stream, len(stream),
                                           ctypes.byref(infos[2]))
        assert lib.error() == 8       # YAIK_NO_EMPTYDECODE_SLOT
        # DecodeImage releases the slot even on failure (DIFFSTREAM here)
        other = bytes(stream[:-1] + b"\0")
        assert not raw.YAIK_DecodeImage(other, len(other),
                                        ctypes.byref(infos[0]))
        assert lib.error() == 10      # YAIK_DECIMG_DIFFSTREAM
        assert raw.YAIK_DecodeImagePre(lib.handle, stream, len(stream),
                                       ctypes.byref(infos[2]))
        # sequential decode reuse beyond the pool size
        for info in (infos[1], infos[2]):
            buf = np.empty(64 * 64 * 3, np.uint8)
            info.outputImage = buf.ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8))
            info.outputImageStride = 64 * 3
            assert raw.YAIK_DecodeImage(stream, len(stream),
                                        ctypes.byref(info))
        for _ in range(5):
            assert lib.decode(stream) is not None
    finally:
        lib.close()
