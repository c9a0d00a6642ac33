"""Decode planner: host-side conversion of a .yaik stream into dense,
device-ready tensors.

The sequential parts of YAIK decoding - zstd, the palette codec, corner
dedup, quad-claim replay, and the shared index-stream cursors - are all
O(tiles), not O(pixels). This module runs them once on the host (numpy) and
emits a DecodePlan shaped for the TPU: everything the device touches is
DENSE over the full tile grid of each pass, so the pixel kernels
(yaik_tpu.decoder.jax_engine) use only reshapes, broadcasts, and one-hot
matmuls - no per-pixel gather/scatter, which do not vectorize on TPU.

  - per gradient pass: corner-color grid snapshot + accept grid
  - per 3D size pass: accept grid, per-tile 64-entry LUT slices, min/max
    colors, dense per-tile index bytes (stream bytes host-reordered into
    tile-pixel slots), and per-pixel write masks
  - 1D pass: per-8x8-tile params + dense index bytes + write masks, x3 planes

Validated bit-exactly against the host reference decoder in tests.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from yaik_tpu.entropy import palette, zstd_backend as zstd
from yaik_tpu.format import swizzle
from yaik_tpu.format.headers import (FileHeader, Header1D, HeaderGradientTile,
                                     HeaderTile3D, HeaderTile3DX, MAGIC)
from yaik_tpu.decoder.reference import _PAIR_ORDER, iter_chunks


@dataclass
class GradientPassPlan:
    shift: tuple          # (sx, sy)
    accept: np.ndarray    # [nty, ntx] bool
    corners: np.ndarray   # [nqy+1, nqx+1, 3] u8 corner grid snapshot


@dataclass
class Tile3DPassPlan:
    shift: tuple
    accept: np.ndarray    # [nty, ntx] bool
    luts: np.ndarray      # [nty*ntx, 64, 3] u8 per-tile LUT slice (0-padded)
    colors: np.ndarray    # [nty*ntx, 6] i32 (min RGB, max RGB)
    indices: np.ndarray   # [nty*ntx, th*tw] u8 LUT entry per pixel slot
    wmask: np.ndarray     # [nty*ntx, th*tw] bool pixel written by this tile
    types: np.ndarray = None  # [nty*ntx] i32 raw tile type words (stats)


@dataclass
class Plan1D:
    params: np.ndarray    # [3, nT, 3] i32 (color0, base, delta2)
    indices: np.ndarray   # [3, nT, 64] u8
    wmask: np.ndarray     # [3, nT, 64] bool


@dataclass
class DecodePlan:
    width: int
    height: int
    gradient: list        # list[GradientPassPlan]
    tile3d: list          # list[Tile3DPassPlan]
    d1: Plan1D
    has_alpha: bool = False
    alpha: np.ndarray | None = None   # [H, W] u8, host-decoded (byte-level)


def lut_flat_layout(luts_expanded: dict):
    """Flatten per-bit LUT arrays to one i32 vector (host lookup helper)."""
    parts, bases, strides = [], {}, {}
    off = 0
    for bit in (3, 4, 5, 6):
        arr = luts_expanded[bit].reshape(luts_expanded[bit].shape[0], -1)
        bases[bit] = off
        strides[bit] = arr.shape[1]
        parts.append(arr.reshape(-1))
        off += arr.size
    return np.concatenate(parts).astype(np.int32), bases, strides


_PAIR_SLOT_CACHE: dict = {}


def _pair_slots(b0: bool, b1: bool, gx0: int, gy0: int, tw: int, single: bool):
    """Tile-pixel slot indices (row-major th*tw) + relative stream offsets
    for one quad pair / single quad at quad coords (gx0, gy0). Memoized -
    the argument space is tiny and this is the planner's hottest call."""
    key = (b0, b1, gx0, gy0, tw, single)
    if key not in _PAIR_SLOT_CACHE:
        _PAIR_SLOT_CACHE[key] = _pair_slots_impl(b0, b1, gx0, gy0, tw, single)
    return _PAIR_SLOT_CACHE[key]


def _pair_slots_impl(b0, b1, gx0, gy0, tw, single):
    if single:
        if b0:
            return None
        ys, xs = np.mgrid[0:4, 0:4]
        slots = (ys + gy0 * 4) * tw + xs + gx0 * 4
        return slots.reshape(-1), np.arange(16)
    if not b0 and not b1:
        ys, xs = np.mgrid[0:4, 0:8]
        slots = (ys + gy0 * 4) * tw + xs + gx0 * 4
        return slots.reshape(-1), np.arange(32)
    if not b0:
        ys, xs = np.mgrid[0:4, 0:4]
        slots = (ys + gy0 * 4) * tw + xs + gx0 * 4
        return slots.reshape(-1), np.arange(16)
    if not b1:
        ys, xs = np.mgrid[0:4, 0:4]
        slots = (ys + gy0 * 4) * tw + xs + (gx0 + 1) * 4
        return slots.reshape(-1), np.arange(16)
    return None


def build_plan(stream: bytes, luts_expanded: dict) -> DecodePlan:
    fh = FileHeader.unpack(stream)
    if fh.tag != MAGIC:
        raise ValueError("not a YAIK stream")
    w, h = fh.width, fh.height
    stride_q = w // 4 + 1
    nq = stride_q * (h // 4 + 1)

    map_rgb = np.zeros((nq, 3), np.uint8)
    has_rgb = np.zeros(nq, bool)               # plane-7 path only
    claims = np.zeros(swizzle.claim_shape(w, h), bool)

    grads: list[GradientPassPlan] = []
    t3passes: list[Tile3DPassPlan] = []
    d1 = Plan1D(params=np.zeros((3, 1, 3), np.int32),
                indices=np.zeros((3, 1, 64), np.uint8),
                wmask=np.zeros((3, 1, 64), bool))
    alpha_channel = None
    mip_mask = mip_bbox = None

    for tag, off, body in iter_chunks(stream):
        if tag == b"GTIL":
            hdr = HeaderGradientTile.unpack(body)
            if hdr.plane != 7:
                raise NotImplementedError(
                    "plane-variant GTIL chunks not in the active encoder path")
            payload = body[HeaderGradientTile.size():]
            sx, sy = hdr.shift_x, hdr.shift_y
            tw, th = 1 << sx, 1 << sy
            bitmap = zstd.decompress(payload[:hdr.stream_bitmap_size],
                                     swizzle.bitmap_size_bytes(sx, sy, w, h))
            cust = zstd.decompress(
                payload[hdr.stream_bitmap_size:
                        hdr.stream_bitmap_size + hdr.stream_rgb_size_zstd],
                hdr.stream_rgb_size_custom)
            rgb = palette.palette_decompress(
                cust, hdr.stream_rgb_size_uncompressed, hdr.color_compression)
            # security offset like the reference (YAIK_API.cpp:896-910):
            # corrupted bitmaps may claim more corners than the stream holds;
            # over-allocate so reads get zeros instead of faulting
            import numpy as _np
            rgb = _np.concatenate(
                [rgb, _np.zeros(3 * ((w // 4 + 1) * (h // 4 + 1)), _np.uint8)])

            grid, _ = swizzle.accept_grid(bitmap, sx, sy, w, h)
            tx_all, ty_all, valid = swizzle.tile_scan_coords(sx, sy, w, h)
            bits = swizzle.unpack_bitmap(bitmap, sx, sy, w, h)
            cursor = 0
            for i in np.flatnonzero(bits & valid):
                tx, ty = int(tx_all[i]), int(ty_all[i])
                qx, qy = tx * (tw // 4), ty * (th // 4)
                base = qy * stride_q + qx
                ids = (base, base + tw // 4,
                       base + (th // 4) * stride_q,
                       base + (th // 4) * stride_q + tw // 4)
                for cid in ids:
                    if not has_rgb[cid]:
                        has_rgb[cid] = True
                        map_rgb[cid] = rgb[cursor:cursor + 3]
                        cursor += 3
                claims[qy:qy + th // 4, qx:qx + tw // 4] = True
            grads.append(GradientPassPlan(
                shift=(sx, sy), accept=grid,
                corners=map_rgb.reshape(h // 4 + 1, stride_q, 3).copy()))

        elif tag in (b"3DTL", b"3DTX"):
            cls = HeaderTile3D if tag == b"3DTL" else HeaderTile3DX
            hdr = cls.unpack(body)
            t3passes = _plan_3d(body[cls.size():], hdr, w, h,
                                claims, luts_expanded)

        elif tag == b"1DTL":
            hdr = Header1D.unpack(body)
            d1 = _plan_1d(body[Header1D.size():], hdr, w, h, claims)
        elif tag == b"MIPM":
            from yaik_tpu.decoder import alpha as alphamod
            mip_mask, mip_bbox = alphamod.decode_mipm(body, w, h)
        elif tag == b"ALPM":
            from yaik_tpu.decoder import alpha as alphamod
            alpha_channel = alphamod.decode_alpm(body, w, h, mip_mask,
                                                 mip_bbox)
        else:
            raise NotImplementedError(f"chunk {tag!r} not planned yet")

    if fh.has_alpha and alpha_channel is None:
        alpha_channel = np.full((h, w), 255, np.uint8)
    return DecodePlan(width=w, height=h, gradient=grads, tile3d=t3passes,
                      d1=d1, has_alpha=fh.has_alpha, alpha=alpha_channel)


def _plan_3d(body, hdr, w, h, claims, luts_expanded):
    off = 0

    def take(csize, usize):
        nonlocal off
        d = zstd.decompress(body[off:off + csize], usize) if csize else b""
        off += csize
        return d

    s = {3: take(hdr.compr_3bit_size, hdr.stream_3bit_cnt),
         4: take(hdr.compr_4bit_size, hdr.stream_4bit_cnt),
         5: take(hdr.compr_5bit_size, hdr.stream_5bit_cnt),
         6: take(hdr.compr_6bit_size, hdr.stream_6bit_cnt)}
    types_b = take(hdr.compr_type_size, hdr.stream_type_cnt * 2)
    colors_b = take(hdr.compr_color_size, hdr.stream_color_cnt)
    maps = {}
    for key, csz, usz in (
            ((4, 3), hdr.size_t16_8_map_cmp, hdr.size_t16_8_map),
            ((3, 4), hdr.size_t8_16_map_cmp, hdr.size_t8_16_map),
            ((3, 3), hdr.size_t8_8_map_cmp, hdr.size_t8_8_map),
            ((3, 2), hdr.size_t8_4_map_cmp, hdr.size_t8_4_map),
            ((2, 3), hdr.size_t4_8_map_cmp, hdr.size_t4_8_map),
            ((2, 2), hdr.size_t4_4_map_cmp, hdr.size_t4_4_map)):
        maps[key] = take(csz, usz)

    colors = palette.full_range_remap(
        np.frombuffer(colors_b, np.uint8), hdr.compression_rate_color
    ).astype(np.int32).reshape(-1, 6)
    types = np.frombuffer(types_b, "<u2")
    streams = {bit: np.frombuffer(s[bit], np.uint8) for bit in (3, 4, 5, 6)}

    passes = []
    cursors = {"type": 0, 3: 0, 4: 0, 5: 0, 6: 0}
    for (sx, sy) in swizzle.TILE3D_PASS_ORDER:
        tw, th = 1 << sx, 1 << sy
        ntx, nty = w // tw, h // th
        g = nty * ntx
        accept = np.zeros((nty, ntx), bool)
        luts = np.zeros((g, 64, 3), np.uint8)
        cols = np.zeros((g, 6), np.int32)
        indices = np.zeros((g, th * tw), np.uint8)
        wmask = np.zeros((g, th * tw), bool)
        type_arr = np.zeros(g, np.int32)
        if maps[(sx, sy)]:
            bits = swizzle.unpack_bitmap(
                maps[(sx, sy)][:swizzle.bitmap_size_bytes(sx, sy, w, h)],
                sx, sy, w, h)
            tx_all, ty_all, valid = swizzle.tile_scan_coords(sx, sy, w, h)
            pairs = _PAIR_ORDER[(sx, sy)]
            for i in np.flatnonzero(bits & valid):
                tx, ty = int(tx_all[i]), int(ty_all[i])
                gid = ty * ntx + tx
                tid = cursors["type"]
                tile_type = int(types[tid])
                cursors["type"] += 1
                combined = tile_type & 0x3FFF
                fmt = (tile_type >> 14) & 3
                bit = fmt + 3
                accept[ty, tx] = True
                type_arr[gid] = tile_type
                cols[gid] = colors[tid]
                tbl = luts_expanded[bit][combined]       # [2**bit, 3]
                luts[gid, : tbl.shape[0]] = tbl
                cur = cursors[bit]
                qx0, qy0 = tx * tw // 4, ty * th // 4
                for group in pairs:
                    if len(group) == 2:
                        (gx0, gy0), (gx1, _) = group
                        b0 = bool(claims[qy0 + gy0, qx0 + gx0])
                        b1 = bool(claims[qy0 + gy0, qx0 + gx1])
                        lay = _pair_slots(b0, b1, gx0, gy0, tw, False)
                    else:
                        (gx0, gy0), = group
                        b0 = bool(claims[qy0 + gy0, qx0 + gx0])
                        lay = _pair_slots(b0, True, gx0, gy0, tw, True)
                    if lay is None:
                        continue
                    slots, rel = lay
                    # stream values are premultiplied by 3; store entry index
                    indices[gid, slots] = streams[bit][cur + rel] // 3
                    wmask[gid, slots] = True
                    cur += rel.size
                cursors[bit] = cur
                claims[qy0:qy0 + th // 4, qx0:qx0 + tw // 4] = True
        passes.append(Tile3DPassPlan(shift=(sx, sy), accept=accept,
                                     luts=luts, colors=cols,
                                     indices=indices, wmask=wmask,
                                     types=type_arr))
    return passes


def _plan_1d(body, hdr, w, h, claims):
    types = np.frombuffer(
        zstd.decompress(body[:hdr.stream_type_cnt], hdr.stream_type_uncmp),
        np.uint8)
    pix = np.frombuffer(
        zstd.decompress(body[hdr.stream_type_cnt:
                             hdr.stream_type_cnt + hdr.stream_pixel_bit],
                        hdr.stream_pixel_uncmp), np.uint8)
    inv_range = (1 << 24) // hdr.compression_range

    ntx, nty = w // 8, h // 8
    g = nty * ntx
    params = np.zeros((3, g, 3), np.int32)
    indices = np.zeros((3, g, 64), np.uint8)
    wmask = np.zeros((3, g, 64), bool)
    # vectorized quad-claim lookup: [nty, ntx, 2, 2]
    qgrid = claims[:nty * 2, :ntx * 2].reshape(nty, 2, ntx, 2).transpose(
        0, 2, 1, 3)
    active = ~qgrid.all(axis=(2, 3))
    active_tiles = [(ty, tx) for ty, tx in zip(*np.nonzero(active))]
    tcur = pcur = 0
    for p in range(3):
        for ty, tx in active_tiles:
                quad = qgrid[ty, tx]
                gid = ty * ntx + tx
                color0 = int(types[tcur]); base = int(types[tcur + 1])
                delta = int(types[tcur + 2]); tcur += 3
                delta2 = ((delta * inv_range) >> 8) + 1
                params[p, gid] = (color0, base, delta2)
                for gy in range(2):
                    b0, b1 = bool(quad[gy, 0]), bool(quad[gy, 1])
                    lay = _pair_slots(b0, b1, 0, gy, 8, False)
                    if lay is None:
                        continue
                    slots, rel = lay
                    indices[p, gid, slots] = pix[pcur + rel]
                    wmask[p, gid, slots] = True
                    pcur += rel.size
    return Plan1D(params=params, indices=indices, wmask=wmask)
