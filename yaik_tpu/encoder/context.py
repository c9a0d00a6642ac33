"""Encoder pipeline: the reference's EncoderContext::Convert
(EncoderContext.cpp:8986-9787), active path only (gradient passes -> 3D-LUT
passes -> 1D residual), producing byte-exact .yaik streams when the
vendored-zstd-1.3.4 build is available.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from yaik_tpu.encoder import alpha as alphamod
from yaik_tpu.encoder import bank as bankmod
from yaik_tpu.encoder import corr3d, dyn1d, gradient
from yaik_tpu.encoder.palette_codec import PaletteState, palette_compress
from yaik_tpu.entropy import zstd_backend as zstd
from yaik_tpu.format import swizzle
from yaik_tpu.utils import debug_dump
from yaik_tpu.utils import profiler
from yaik_tpu.format.headers import (FileHeader, Header1D, HeaderBase,
                                     HeaderGradientTile, HeaderTile3D,
                                     HeaderTile3DX, MAGIC)


@dataclass
class EncoderConfig:
    """Knobs mirroring the reference CLI defaults (ImageEncoder.cpp:175-190,
    EncoderContext.h:221-233)."""
    reject_factor: int = 3
    color_compression_quad: int = 250
    color_compression_lut3d: int = 250
    color_compression_1d: int = 255
    range_compression_1d: int = 15
    # alpha/mipmap passes (decoder-supported; disabled in the reference's
    # Convert at EncoderContext.cpp:9027-9028 but fully implemented there)
    enable_mipmap: bool = True
    enable_alpha: bool = True
    alpha_force_8bit: bool = True     # Convert's ProcessAlpha(true)
    alpha_use_inverse: bool = True
    # SingleColorOut (UCOL): disabled in the reference's Convert at
    # EncoderContext.cpp:9036; fully implemented in encoder/single_color.py
    enable_single_color: bool = False
    favor_accuracy: bool = False      # EncoderContext.h:262, CLI sets false
    # Correlation2DSearch (2DTL chunks, RG/GB/RB): inside `#if 0` in the
    # reference's Convert (:9300-9382); needs a Bank2D (encoder/bank2d.py)
    enable_2d: bool = False
    # SmoothMap (SMAP): dead code upstream (no call site; the pass as
    # written aborts on heap corruption - see encoder/smooth_map.py)
    enable_smooth_map: bool = False
    # DynamicTileEncode (PLNT, YCoCg range-coded tiles): disabled in the
    # reference's Convert (`#if 0` :9539-9545); see encoder/plnt.py
    enable_plnt: bool = False
    # plane-subset gradient passes (GTIL with plane != 7): the disabled
    # 2-plane 4x4 calls (`if (0)` :9260-9290, RB/RG/GB order) and 1-plane
    # 4x4 calls (`#if 0` :9392-9420, R/G/B) - singles run AFTER the 2D
    # block in Convert's layout
    enable_plane_gradients: bool = False


def _compress_stream(data: bytes) -> bytes:
    """CompressStream (:3692): zstd level 18, capacity max(2x, 1000)."""
    return zstd.compress(data, 18, max(len(data) * 2, 1000))


def _chunk(tag: bytes, body: bytes) -> bytes:
    length = (len(body) + 3) & ~3
    return HeaderBase(tag, length).pack() + body + b"\0" * (length - len(body))


import os as _os


class _ZstdBatch:
    """Deferred zstd-18 compression for one image's chunk streams.

    Emission queues raw streams and the whole set compresses back-to-back
    at flush time: the level-18 match-finder workspace then stays hot in
    cache across the ~28 calls (measured 23 -> ~10 ms per 512^2 art image
    vs compressing inline between emission steps on this host). With
    YAIK_ZSTD_WORKERS > 1 the batch fans out over a thread pool - the
    ctypes call releases the GIL and every stream uses its own per-thread
    CCtx, so multi-core hosts scale the entropy stage while the BYTES stay
    identical (each stream is an independent one-shot compression).
    """
    __slots__ = ("jobs", "results")

    _POOL = None
    _POOL_N = 0

    def __init__(self):
        self.jobs: list = []
        self.results: list | None = None

    def add(self, data, level: int = 18, cap: int | None = None) -> int:
        if cap is None:
            cap = max(len(data) * 2, 1000)
        self.jobs.append((bytes(data), level, cap))
        return len(self.jobs) - 1

    def run(self) -> None:
        n = int(_os.environ.get("YAIK_ZSTD_WORKERS", "0") or 0)
        if n > 1 and len(self.jobs) > 1:
            cls = _ZstdBatch
            if cls._POOL is None or cls._POOL_N != n:
                from concurrent.futures import ThreadPoolExecutor
                cls._POOL = ThreadPoolExecutor(n)
                cls._POOL_N = n
            self.results = list(cls._POOL.map(
                lambda j: zstd.compress(j[0], j[1], j[2]), self.jobs))
        else:
            self.results = [zstd.compress(d, lv, c)
                            for (d, lv, c) in self.jobs]

    def get(self, h: int) -> bytes:
        return self.results[h]


def encode_image(rgb: np.ndarray, bank: bankmod.Bank,
                 config: EncoderConfig | None = None,
                 engine: str = "host", precomputed=None,
                 bank2d=None, _defer: "_ZstdBatch | None" = None):
    """Encode an RGB(A) image ([h, w, 3|4] u8, dims multiple of 8) to .yaik.

    engine="host": numpy scoring; engine="device": all tile scoring on the
    accelerator (encoder.jax_scoring); engine="precomputed": scoring results
    supplied by encoder.batch. All byte-identical.

    _defer: a shared _ZstdBatch - the image's streams queue on it and a
    zero-arg assembler is returned instead of bytes; the caller runs the
    batch once for MANY images so the level-18 workspace stays cache-warm
    across the whole set (encoder.batch._emit_from_unpacked)."""
    cfg = config or EncoderConfig()
    deferred = _defer is not None
    h, w = rgb.shape[:2]
    if (w & 7) or (h & 7):
        raise ValueError("image dimensions must be multiples of 8")
    if rgb.ndim != 3 or rgb.shape[2] not in (3, 4):
        raise ValueError("expected [h, w, 3] or [h, w, 4] u8 image")
    has_alpha = rgb.shape[2] == 4

    planes = rgb[:, :, :3].transpose(2, 0, 1).astype(np.int32)  # [3,H,W]
    claims = np.zeros((3, h, w), bool)                      # mapSmoothTile
    mapped_rgb = np.zeros((3, h + 1, w + 1), bool)          # mappedRGB

    # chunk order = parts order; bytes are final, callables resolve after
    # the deferred zstd batch runs (see _ZstdBatch)
    parts: list = [FileHeader(MAGIC, 1, w, h, 1 if has_alpha else 0).pack()]
    zb = _defer if deferred else _ZstdBatch()
    # the reference's global CodeRGB persists across chunks; native runtime
    # when built, Python fallback otherwise (identical streams, tested)
    from yaik_tpu import native
    use_native = native.available()
    pal_state = (native.NativePaletteState() if use_native
                 else PaletteState())
    compress_palette = (native.palette_compress if use_native
                        else palette_compress)

    mip_mask, mip_bound = None, (0, 0, w, h)
    if has_alpha:
        alpha_plane = rgb[:, :, 3]
        if cfg.enable_mipmap:
            mip_mask, mip_chunk, mip_bound = alphamod.mip_prefilter(alpha_plane)
            if mip_chunk:
                parts.append(mip_chunk)
        if cfg.enable_alpha:
            alpm = alphamod.process_alpha(
                alpha_plane, mip_mask, mip_bound,
                force_8bit=cfg.alpha_force_8bit,
                use_inverse=cfg.alpha_use_inverse)
            if alpm:
                parts.append(alpm)

    if cfg.enable_single_color:
        from yaik_tpu.encoder import single_color
        ucol, mip_after = single_color.single_color_out(
            planes, mip_mask, mip_bound, favor_accuracy=cfg.favor_accuracy)
        parts.append(ucol)
        if mip_mask is not None:
            mip_mask = mip_after

    if cfg.enable_smooth_map:
        from yaik_tpu.encoder import smooth_map
        smap, mip_after, _seeds = smooth_map.smooth_map(planes, mip_mask)
        parts.append(smap)
        if mip_mask is not None:
            mip_mask = mip_after

    # ---- scoring (host or device) ----
    dev_grad_accepts = planes_dev = claims_dev = None
    if engine == "device":
        import jax
        from yaik_tpu.encoder import device_pipeline as devp
        planes_dev = jax.device_put(planes)
        claims_dev = jax.device_put(claims)
        dev_grad_accepts, claims_dev = devp.run_gradient_scoring(
            planes_dev, claims_dev, cfg.reject_factor)
    elif engine == "precomputed":
        dev_grad_accepts = precomputed.grad_accepts

    # ---- gradient passes ----
    _grad_stage = profiler.stage("encode:gradient")
    _grad_stage.__enter__()
    # device/precomputed emission: one shared 4x4 corner grid serves all 7
    # passes and per-pixel claims defer to ONE 4x4-block accumulator
    # expanded after the 3D stage (the 13 full-image repeats were ~2-3
    # ms/image of pure host emission). The host engine keeps per-pass
    # updates: score_pass READS claims between passes.
    claims4 = (np.zeros((h // 4, w // 4), bool)
               if engine in ("device", "precomputed") else None)
    corners4 = (gradient._corner_grids(planes, 4, 4).astype(np.int64)
                if engine in ("device", "precomputed") else None)
    # native one-call per-pass emission; the 4x4-grid mapped set replaces
    # mapped_rgb, which only the (host-scored) plane-gradient passes read
    use_fast_emit = (claims4 is not None and use_native
                     and not cfg.enable_plane_gradients)
    if use_fast_emit:
        # claims4 stays bool (numpy bool is byte-backed; the native pass
        # writes 1-bytes which read back as True)
        corner_bytes = np.ascontiguousarray(gradient.compress_f(
            gradient.round6(corners4),
            cfg.color_compression_quad).astype(np.uint8))
        mapped4 = np.zeros((3, h // 4 + 1, w // 4 + 1), np.uint8)
    for k, (sx, sy) in enumerate(swizzle.GRADIENT_PASS_ORDER):
        bbox = None
        if use_fast_emit:
            bitmap, rgb_stream, count, bbox = gradient.emit_pass_fast(
                dev_grad_accepts[k], sx, sy, w, h, corner_bytes, mapped4,
                claims4)
        elif engine in ("device", "precomputed"):
            bitmap, rgb_stream, count = gradient.emit_pass(
                planes, claims, mapped_rgb, dev_grad_accepts[k], sx, sy,
                cfg.color_compression_quad, corners4=corners4,
                claims4=claims4)
        else:
            bitmap, rgb_stream, count = gradient.run_pass(
                planes, claims, mapped_rgb, sx, sy, cfg.reject_factor,
                cfg.color_compression_quad)
        if count == 0 or not rgb_stream:
            continue
        cust = compress_palette(rgb_stream, pal_state)
        if cust is None:
            raise RuntimeError("palette compression failed")
        parts.append(_gtil_deferred(zb, bitmap, cust, len(rgb_stream),
                                    cfg.color_compression_quad, sx, sy, 7,
                                    w, h, bbox=bbox))
    _grad_stage.__exit__(None, None, None)
    if debug_dump.enabled():
        # debug1BitAsPng analog (claim state after the gradient stage);
        # the host engine updates per-pixel claims directly
        debug_dump.snapshot_accepts(
            "gradient_claims4", claims4 if claims4 is not None
            else claims.any(0)[::4, ::4])

    # ---- 3D-LUT passes ----
    streams = {
        "color": bytearray(), "type": [],
        3: bytearray(), 4: bytearray(), 5: bytearray(), 6: bytearray(),
        "maps": {key: np.zeros(swizzle.bitmap_size_bytes(*key, w, h) * 8,
                               np.uint8)
                 for key in swizzle.TILE3D_PASS_ORDER},
    }
    if engine == "device":
        from yaik_tpu.encoder import device_pipeline as devp
        tables = devp.bank_device_tables(bank)
        with profiler.stage("encode:3d-scoring"):
            dev_t3, _ = devp.run_tile3d_scoring(planes_dev, claims_dev, tables)
        with profiler.stage("encode:3d-emit"):
            devp.emit_tile3d_streams(dev_t3, w, h, streams)
        for res in dev_t3:
            sx, sy = res["shift"]
            tw, th = 1 << sx, 1 << sy
            nty, ntx = h // th, w // tw
            acc = res["accept"].reshape(nty, ntx)
            if acc.any():
                claims4[: nty * (th // 4), : ntx * (tw // 4)] |= np.repeat(
                    np.repeat(acc, th // 4, 0), tw // 4, 1)
    elif engine == "precomputed":
        from yaik_tpu.encoder import device_pipeline as devp
        compact = getattr(precomputed, "t3_compact", None)
        with profiler.stage("encode:3d-emit"):
            if compact is not None:
                devp.emit_tile3d_streams_compact(compact, w, h, streams)
            else:
                devp.emit_tile3d_streams(precomputed.t3_results, w, h,
                                         streams)
        for res in (compact if compact is not None
                    else precomputed.t3_results):
            sx, sy = res["shift"]
            tw, th = 1 << sx, 1 << sy
            nty, ntx = h // th, w // tw
            if compact is not None:
                _, gids = devp._scan_perm(sx, sy, w, h)
                accept = np.zeros(nty * ntx, bool)
                accept[gids] = res["bits_scan"]
            else:
                accept = res["accept"]
            acc = accept.reshape(nty, ntx)
            if acc.any():
                claims4[: nty * (th // 4), : ntx * (tw // 4)] |= np.repeat(
                    np.repeat(acc, th // 4, 0), tw // 4, 1)
    else:
        with profiler.stage("encode:3d-scoring"):
            for (sx, sy) in swizzle.TILE3D_PASS_ORDER:
                corr3d.run_pass(planes, claims, bank, sx, sy, streams)
    with profiler.stage("encode:3d-chunk"):
        parts.append(_tile3d_chunk_deferred(streams, cfg, w, h, zb))

    if claims4 is not None and claims4.any():
        # ONE expansion of all deferred gradient + 3D claims (every tile
        # size is a multiple of 4x4; later stages - plane gradients, 2D,
        # 1D leftovers - read the union exactly as the sequential updates
        # left it)
        claims |= np.repeat(np.repeat(claims4, 4, 0), 4, 1)[None]
    if debug_dump.enabled():
        debug_dump.snapshot_accepts(
            "tile3d_claims4", claims4 if claims4 is not None
            else claims.any(0)[::4, ::4])

    def _plane_gradient(mask):
        bitmap, rgb_stream, count = gradient.run_pass(
            planes, claims, mapped_rgb, 2, 2, cfg.reject_factor,
            cfg.color_compression_quad, plane_mask=mask)
        if count == 0 or not rgb_stream:
            return
        cust = compress_palette(rgb_stream, pal_state)
        if cust is None:
            raise RuntimeError("palette compression failed")
        parts.append(_gtil_deferred(zb, bitmap, cust, len(rgb_stream),
                                    cfg.color_compression_quad, 2, 2, mask,
                                    w, h))

    if cfg.enable_plane_gradients:
        for mask in (5, 3, 6):           # RB, RG, GB (Convert :9260-9290)
            _plane_gradient(mask)

    # ---- 2D plane-pair passes (disabled upstream, Convert :9300-9382) ----
    if cfg.enable_2d:
        if bank2d is None:
            raise ValueError("enable_2d requires a bank2d (encoder/bank2d.py)")
        from yaik_tpu.encoder import corr2d
        for plane_mode in (0, 1, 2):                 # RG, GB, RB
            streams2 = {
                "color": bytearray(), "type": [],
                3: bytearray(), 4: bytearray(), 5: bytearray(),
                6: bytearray(),
                "maps": {key: np.zeros(
                    swizzle.bitmap_size_bytes(*key, w, h) * 8, np.uint8)
                    for key in ((3, 3), (2, 2))},
            }
            with profiler.stage("encode:2d-scoring"):
                corr2d.run_pass(planes, claims, bank2d, plane_mode, 3, 3,
                                streams2)
                corr2d.run_pass(planes, claims, bank2d, plane_mode, 2, 2,
                                streams2)
            parts.append(_tile2d_chunk_deferred(
                streams2, cfg, w, h, corr2d.COMPONENT[plane_mode], zb))

    if cfg.enable_plane_gradients:
        for mask in (1, 2, 4):           # R, G, B (Convert :9392-9420)
            _plane_gradient(mask)

    # ---- 1D residual ----
    _d1_stage = profiler.stage("encode:1d")
    _d1_stage.__enter__()
    pix_stream = bytearray()
    type_stream = bytearray()
    for p in range(3):
        if use_native:
            pix, typ = native.dyn1d_plane(
                planes[p].astype(np.uint8), claims[p],
                cfg.color_compression_1d, cfg.range_compression_1d)
            pix_stream += pix
            type_stream += typ
        else:
            dyn1d.run_plane(planes[p], claims[p], pix_stream, type_stream,
                            cfg.color_compression_1d, cfg.range_compression_1d)
    if pix_stream:
        h_pix = zb.add(bytes(pix_stream), 18, len(pix_stream) * 2)
        h_typ = zb.add(bytes(type_stream), 18, len(pix_stream))

        def _mk_1d(h_pix=h_pix, h_typ=h_typ, n_pix=len(pix_stream),
                   n_typ=len(type_stream)):
            z_pix, z_type = zb.get(h_pix), zb.get(h_typ)
            hdr = Header1D(
                stream_pixel_bit=len(z_pix), stream_pixel_uncmp=n_pix,
                stream_type_cnt=len(z_type), stream_type_uncmp=n_typ,
                compression_color=cfg.color_compression_1d,
                compression_range=cfg.range_compression_1d, version=0)
            return _chunk(b"1DTL", hdr.pack() + z_type + z_pix)
        parts.append(_mk_1d)
    _d1_stage.__exit__(None, None, None)

    if cfg.enable_plnt:
        # the reference's #if 0 block sits at the very end of Convert
        # (:9539-9545), after the 1D pass
        from yaik_tpu.encoder import plnt as plntmod
        parts.append(plntmod.encode_plnt(planes, mip_mask, mip_bound))

    parts.append(struct.pack("<I", 0xDEADBEEF))

    def assemble():
        return b"".join(p if isinstance(p, bytes) else p() for p in parts)
    if deferred:
        return assemble
    with profiler.stage("encode:zstd-flush"):
        zb.run()
        return assemble()


def _gtil_deferred(zb, bitmap, cust, raw_len, color_compression, sx, sy,
                   plane, w, h, bbox=None):
    """Queue one GTIL chunk's two zstd streams on the batch; returns the
    assembly closure (exact bytes of the old inline path). bbox: already
    computed by the native emission pass, else derived from the bitmap."""
    hb = zb.add(bitmap)
    hr = zb.add(cust)
    if bbox is None:
        bbox = _gradient_bbox(bitmap, sx, sy, w, h)
    cust_len = len(cust)

    def mk():
        z_bitmap, z_rgb = zb.get(hb), zb.get(hr)
        hdr = HeaderGradientTile(
            x=bbox[0], y=bbox[1], w=bbox[2], h=bbox[3],
            stream_bitmap_size=len(z_bitmap),
            stream_rgb_size_zstd=len(z_rgb),
            stream_rgb_size_custom=cust_len,
            stream_rgb_size_uncompressed=raw_len,
            color_compression=color_compression,
            version=0, format=sx | (sy << 3), plane=plane)
        return _chunk(b"GTIL", hdr.pack() + z_bitmap + z_rgb)
    return mk


def _gradient_bbox(bitmap: bytes, sx: int, sy: int, w: int, h: int):
    """The reference's GTIL bbox, including its h = maxY - minX bug
    (EncoderContext.cpp:4252: header.bbox.h = maxY - minX)."""
    tw, th = 1 << sx, 1 << sy
    grid, _ = swizzle.accept_grid(bitmap, sx, sy, w, h)
    ty, tx = np.nonzero(grid)
    min_x, max_x = int(tx.min()) * tw, (int(tx.max()) + 1) * tw
    min_y, max_y = int(ty.min()) * th, (int(ty.max()) + 1) * th
    return min_x, min_y, max_x - min_x, max_y - min_x


def _tile2d_chunk_deferred(streams, cfg, w, h, component, zb):
    """EndCorrelationSearch(false, component): the 2D variant writes only
    the 8x8 and 4x4 tile maps (all other header map fields zero), indices
    premultiplied x2 (interleaved x,y LUT entries), tag '2DTL'
    (EncoderContext.cpp:7382-7612). Raw streams queue on the zstd batch;
    the returned closure assembles the chunk after the batch runs."""
    def qmap(key):
        raw = streams["maps"][key].astype(np.uint8).tobytes()
        return len(raw), zb.add(raw, 18, len(raw) * 2)

    n_t8_8, h_t8_8 = qmap((3, 3))
    n_t4_4, h_t4_4 = qmap((2, 2))

    types = np.asarray(streams["type"], "<u2").tobytes()
    n_types = len(streams["type"])
    h_types = zb.add(types, 18, len(types) * 2 + 100) if n_types else None

    colors = np.frombuffer(bytes(streams["color"]), np.uint8).astype(np.int64)
    colors = (((colors * cfg.color_compression_lut3d) + 127) // 255
              ).astype(np.uint8).tobytes()
    h_colors = (zb.add(colors, 18, len(colors) * 2 + 100)
                if colors else None)

    n_idx, h_idx = {}, {}
    for bit in (3, 4, 5, 6):
        raw = bytes((np.frombuffer(bytes(streams[bit]), np.uint8)
                     .astype(np.int64) * 2).astype(np.uint8))
        n_idx[bit] = len(streams[bit])
        h_idx[bit] = zb.add(raw, 18, len(raw) * 2 + 100) if raw else None

    n_colors = len(colors)

    def mk():
        g = lambda hh: zb.get(hh) if hh is not None else b""
        z_t8_8, z_t4_4 = g(h_t8_8), g(h_t4_4)
        z_types, z_colors = g(h_types), g(h_colors)
        z_idx = {bit: g(h_idx[bit]) for bit in (3, 4, 5, 6)}
        hdr = HeaderTile3D(
            stream_color_cnt=n_colors, stream_type_cnt=n_types,
            stream_3bit_cnt=n_idx[3], stream_4bit_cnt=n_idx[4],
            stream_5bit_cnt=n_idx[5], stream_6bit_cnt=n_idx[6],
            compr_type_size=len(z_types), compr_color_size=len(z_colors),
            compr_3bit_size=len(z_idx[3]), compr_4bit_size=len(z_idx[4]),
            compr_5bit_size=len(z_idx[5]), compr_6bit_size=len(z_idx[6]),
            size_t16_8_map=0, size_t8_16_map=0,
            size_t8_8_map=n_t8_8, size_t4_8_map=0,
            size_t8_4_map=0, size_t4_4_map=n_t4_4,
            size_t16_8_map_cmp=0, size_t8_16_map_cmp=0,
            size_t8_8_map_cmp=len(z_t8_8), size_t4_8_map_cmp=0,
            size_t8_4_map_cmp=0, size_t4_4_map_cmp=len(z_t4_4),
            component=component,
            # the reference only sets compressionRateColor when tiles exist
            # (EncoderContext.cpp:7506-7512); uninitialized-but-zero otherwise
            compression_rate_color=(cfg.color_compression_lut3d
                                    if n_colors else 0))
        body = (hdr.pack() + z_idx[3] + z_idx[4] + z_idx[5] + z_idx[6]
                + z_types + z_colors + z_t8_8 + z_t4_4)
        return _chunk(b"2DTL", body)
    return mk


def _tile2d_chunk(streams, cfg, w, h, component) -> bytes:
    zb = _ZstdBatch()
    mk = _tile2d_chunk_deferred(streams, cfg, w, h, component, zb)
    zb.run()
    return mk()


def _tile3d_chunk_deferred(streams, cfg, w, h, zb):
    """EndCorrelationSearch (:7366-7660): posterize colors, premultiply
    indices by 3, zstd everything, emit the 3DTL chunk. Raw streams queue
    on the zstd batch; the closure assembles after the batch runs."""
    # each map buffer is bits-as-bytes sized (the reference's 8x
    # over-allocation, BitmapSwizzleMapSize :7310); only the leading
    # true-bitmap bytes carry data, the rest compress to nothing.
    def qmap(key):
        raw = streams["maps"][key].astype(np.uint8).tobytes()
        return len(raw), zb.add(raw, 18, len(raw) * 2)

    n_t16_8, h_t16_8 = qmap((4, 3))
    n_t8_16, h_t8_16 = qmap((3, 4))
    n_t8_8, h_t8_8 = qmap((3, 3))
    n_t8_4, h_t8_4 = qmap((3, 2))
    n_t4_8, h_t4_8 = qmap((2, 3))
    n_t4_4, h_t4_4 = qmap((2, 2))

    types = np.asarray(streams["type"], "<u2").tobytes()
    n_types = len(streams["type"])
    h_types = zb.add(types, 18, len(types) * 2 + 100) if n_types else None

    colors = np.frombuffer(bytes(streams["color"]), np.uint8).astype(np.int64)
    colors = (((colors * cfg.color_compression_lut3d) + 127) // 255
              ).astype(np.uint8).tobytes()
    h_colors = (zb.add(colors, 18, len(colors) * 2 + 100)
                if colors else None)

    n_idx, h_idx = {}, {}
    for bit in (3, 4, 5, 6):
        raw = bytes((np.frombuffer(bytes(streams[bit]), np.uint8)
                     .astype(np.int64) * 3).astype(np.uint8))
        n_idx[bit] = len(streams[bit])
        h_idx[bit] = zb.add(raw, 18, len(raw) * 2 + 100) if raw else None

    n_colors = len(colors)

    def mk():
        g = lambda hh: zb.get(hh) if hh is not None else b""
        z_t16_8, z_t8_16, z_t8_8 = g(h_t16_8), g(h_t8_16), g(h_t8_8)
        z_t8_4, z_t4_8, z_t4_4 = g(h_t8_4), g(h_t4_8), g(h_t4_4)
        z_types, z_colors = g(h_types), g(h_colors)
        z_idx = {bit: g(h_idx[bit]) for bit in (3, 4, 5, 6)}
        sizes16 = (n_t16_8, n_t8_16, n_t8_8, n_t4_8, n_t8_4, n_t4_4,
                   len(z_t16_8), len(z_t8_16), len(z_t8_8),
                   len(z_t4_8), len(z_t8_4), len(z_t4_4))
        # the reference's u16 map-size fields overflow >= 1 MPix; use the
        # u32-widened 3DTX extension there (see HeaderTile3DX)
        hdr_cls = HeaderTile3D if max(sizes16) <= 0xFFFF else HeaderTile3DX
        hdr = hdr_cls(
            stream_color_cnt=n_colors, stream_type_cnt=n_types,
            stream_3bit_cnt=n_idx[3], stream_4bit_cnt=n_idx[4],
            stream_5bit_cnt=n_idx[5], stream_6bit_cnt=n_idx[6],
            compr_type_size=len(z_types), compr_color_size=len(z_colors),
            compr_3bit_size=len(z_idx[3]), compr_4bit_size=len(z_idx[4]),
            compr_5bit_size=len(z_idx[5]), compr_6bit_size=len(z_idx[6]),
            size_t16_8_map=n_t16_8, size_t8_16_map=n_t8_16,
            size_t8_8_map=n_t8_8, size_t4_8_map=n_t4_8,
            size_t8_4_map=n_t8_4, size_t4_4_map=n_t4_4,
            size_t16_8_map_cmp=len(z_t16_8), size_t8_16_map_cmp=len(z_t8_16),
            size_t8_8_map_cmp=len(z_t8_8), size_t4_8_map_cmp=len(z_t4_8),
            size_t8_4_map_cmp=len(z_t8_4), size_t4_4_map_cmp=len(z_t4_4),
            component=7,
            compression_rate_color=(cfg.color_compression_lut3d
                                    if n_colors else 0))
        body = (hdr.pack() + z_idx[3] + z_idx[4] + z_idx[5] + z_idx[6]
                + z_types + z_colors + z_t16_8 + z_t8_16 + z_t8_8
                + z_t8_4 + z_t4_8 + z_t4_4)
        return _chunk(b"3DTL" if hdr_cls is HeaderTile3D else b"3DTX", body)
    return mk


def _tile3d_chunk(streams, cfg, w, h) -> bytes:
    zb = _ZstdBatch()
    mk = _tile3d_chunk_deferred(streams, cfg, w, h, zb)
    zb.run()
    return mk()
