"""Alpha + mipmap chunk decoding (host side).

Ports of decoder/YAIK_Alpha.cpp and YAIK_Mipmap.cpp. Output is a full
[H, W] u8 alpha channel (zeros outside the bbox, like the reference's
A/B/C-section memset fills) and a [H, W] bool mipmap mask.

Known upstream defect NOT reproduced: Decompress1BitMaskAlign8NoMask's
`while (--cnt)` loop (YAIK_Alpha.cpp:86) expands one 8-pixel block too few
per row and then drifts every following row; we expand all blocks correctly.
"""
from __future__ import annotations

import numpy as np

from yaik_tpu.entropy import zstd_backend as zstd
from yaik_tpu.format.headers import AlphaHeader, MipmapHeader


def decode_mipm(body: bytes, w: int, h: int):
    """MIPM chunk -> ([H, W] bool mask where True = RGB meaningful, bbox)."""
    hdr = MipmapHeader.unpack(body)
    ts = 1 << hdr.mipmap_level
    if ts != 16:
        raise NotImplementedError("only 16px mipmap tiles (like the decoder)")
    bits_data = body[MipmapHeader.size():]
    ntiles = hdr.w * hdr.h
    bits = np.unpackbits(np.frombuffer(bits_data, np.uint8,
                                       (ntiles + 7) // 8),
                         bitorder="little")[:ntiles].astype(bool)
    keep_sub = bits.reshape(hdr.h, hdr.w)
    mask = np.zeros((h, w), bool)
    sub = np.repeat(np.repeat(keep_sub, ts, axis=0), ts, axis=1)
    y0, x0 = hdr.y * ts, hdr.x * ts
    # clip: the encoder's tile grid is ceil(w/ts) wide, so the expansion can
    # overhang a non-multiple-of-16 image edge
    sh = min(sub.shape[0], h - y0)
    sw = min(sub.shape[1], w - x0)
    if sh <= 0 or sw <= 0:
        raise ValueError("MIPM bbox outside image")
    mask[y0:y0 + sh, x0:x0 + sw] = sub[:sh, :sw]
    bbox = (x0, y0, hdr.w * ts, hdr.h * ts)
    return mask, bbox


def _unpack6(raw: np.ndarray, count: int, inverse: bool) -> np.ndarray:
    """Unpack `count` 6-bit values (4 per 3 bytes) -> 8-bit (v<<2 | v>>4)."""
    need = (count * 6 + 7) // 8
    buf = np.zeros(((need + 2) // 3) * 3, np.uint8)
    buf[:len(raw[:need])] = raw[:need]
    b = buf.reshape(-1, 3).astype(np.uint32)
    v0 = b[:, 0] & 0x3F
    v1 = (b[:, 0] >> 6) | ((b[:, 1] & 0xF) << 2)
    v2 = (b[:, 1] >> 4) | ((b[:, 2] & 0x3) << 4)
    v3 = b[:, 2] >> 2
    v = np.stack([v0, v1, v2, v3], axis=1).reshape(-1)[:count]
    if inverse:
        v = 63 - v
    return ((v << 2) | (v >> 4)).astype(np.uint8)


def decode_alpm(body: bytes, w: int, h: int, mip_mask, mip_bbox):
    """ALPM chunk -> [H, W] u8 alpha channel."""
    hdr = AlphaHeader.unpack(body)
    raw = np.frombuffer(
        zstd.decompress(body[AlphaHeader.size():
                             AlphaHeader.size() + hdr.stream_size],
                        hdr.expected_decompression_size), np.uint8)
    mode = hdr.parameters & 7
    bx, by, bw, bh = hdr.x, hdr.y, hdr.w, hdr.h
    alpha = np.zeros((h, w), np.uint8)

    if mode == AlphaHeader.IS_1_BIT_FULL:
        bits = np.unpackbits(raw, bitorder="little")[: bw * bh]
        alpha[by:by + bh, bx:bx + bw] = (bits.reshape(bh, bw) * 255)
    elif mode in (AlphaHeader.IS_6_BIT_FULL, AlphaHeader.IS_6_BIT_FULL_INVERSE):
        inv = mode == AlphaHeader.IS_6_BIT_FULL_INVERSE
        vals = _unpack6(raw, bw * bh, inv)
        alpha[by:by + bh, bx:bx + bw] = vals.reshape(bh, bw)
    elif mode in (AlphaHeader.IS_6_BIT_USEMIPMAPMASK,
                  AlphaHeader.IS_6_BIT_USEMIPMAPMASK_INVERSE):
        if mip_mask is None:
            raise ValueError("sparse alpha requires a MIPM chunk first")
        inv = mode == AlphaHeader.IS_6_BIT_USEMIPMAPMASK_INVERSE
        sel = mip_mask[by:by + bh, bx:bx + bw]
        vals = _unpack6(raw, int(sel.sum()), inv)
        region = np.zeros((bh, bw), np.uint8)
        region[sel] = vals
        alpha[by:by + bh, bx:bx + bw] = region
    elif mode == AlphaHeader.IS_8_BIT_FULL:
        alpha[by:by + bh, bx:bx + bw] = raw[: bw * bh].reshape(bh, bw)
    else:
        raise ValueError(f"unsupported alpha mode {mode}")
    return alpha


def mip_plan_mask(mip, w: int, h: int) -> np.ndarray:
    """MipPlan -> [H, W] bool mask (host twin of the device expansion)."""
    mw, mh = mip.grid
    ts = 1 << mip.level
    bits = np.unpackbits(mip.bits, bitorder="little")[: mw * mh].astype(bool)
    sub = np.repeat(np.repeat(bits.reshape(mh, mw), ts, 0), ts, 1)
    x0, y0 = mip.origin
    mask = np.zeros((h, w), bool)
    sh = min(sub.shape[0], h - y0)
    sw = min(sub.shape[1], w - x0)
    if sh <= 0 or sw <= 0:
        raise ValueError("MIPM bbox outside image")
    mask[y0:y0 + sh, x0:x0 + sw] = sub[:sh, :sw]
    return mask


def alpha_plan_to_channel(ap, w: int, h: int) -> np.ndarray:
    """AlphaPlan -> [H, W] u8, identical bytes to decode_alpm on the same
    chunk (used by host-side reattach paths; the jax engine computes the
    same thing on device)."""
    from yaik_tpu.format.headers import AlphaHeader
    if ap is None:
        return np.full((h, w), 255, np.uint8)
    bx, by, bw, bh = ap.bbox
    alpha = np.zeros((h, w), np.uint8)
    mode, raw = ap.mode, ap.raw
    if mode == AlphaHeader.IS_1_BIT_FULL:
        bits = np.unpackbits(raw, bitorder="little")[: bw * bh]
        alpha[by:by + bh, bx:bx + bw] = bits.reshape(bh, bw) * 255
    elif mode in (AlphaHeader.IS_6_BIT_FULL,
                  AlphaHeader.IS_6_BIT_FULL_INVERSE):
        inv = mode == AlphaHeader.IS_6_BIT_FULL_INVERSE
        vals = _unpack6(raw, bw * bh, inv)
        alpha[by:by + bh, bx:bx + bw] = vals.reshape(bh, bw)
    elif mode in (AlphaHeader.IS_6_BIT_USEMIPMAPMASK,
                  AlphaHeader.IS_6_BIT_USEMIPMAPMASK_INVERSE):
        inv = mode == AlphaHeader.IS_6_BIT_USEMIPMAPMASK_INVERSE
        sel = mip_plan_mask(ap.mip, w, h)[by:by + bh, bx:bx + bw]
        vals = _unpack6(raw, int(sel.sum()), inv)
        region = np.zeros((bh, bw), np.uint8)
        region[sel] = vals
        alpha[by:by + bh, bx:bx + bw] = region
    elif mode == AlphaHeader.IS_8_BIT_FULL:
        alpha[by:by + bh, bx:bx + bw] = raw[: bw * bh].reshape(bh, bw)
    else:
        raise ValueError(f"unsupported alpha mode {mode}")
    return alpha
