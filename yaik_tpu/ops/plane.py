"""Pixel-plane toolkit: vectorized equivalents of the reference's encoder
framework (encoder/Plane.cpp, Image.cpp, framework.h).

Planes are plain numpy int arrays [h, w]; images are [h, w, c]. Functions
keep the reference's exact integer semantics (C truncating '/' noted where
it differs from floor division).

Reference map:
  operator_mask           Plane::ComputeOperatorMask (Plane.cpp:62, :233)
  erosion                 Plane::Erosion (:123) incl. flood-fill cull <= 50 px
  reduce_quarter_logic_max Plane::ReduceQuarterLogicMax (:211)
  sample_down / sample_up Plane::SampleDown (:278) / SampleUp (:404)
  apply_diff              Plane::ApplyDiff (:466) + ParsingOrder iterators
  bbox_nonzero            Plane::GetBoundingBoxNonZeros (:16)
  rgb_to_ycocg etc        EncoderContext.cpp:53-117
  histogram_rgb           Image::Compute4DHistogram (Image.cpp:35)
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# masks / fills
# ---------------------------------------------------------------------------

_OPS = {
    "eq": np.equal, "neq": np.not_equal, "lt": np.less, "gt": np.greater,
    "le": np.less_equal, "ge": np.greater_equal,
}


def operator_mask(plane: np.ndarray, op: str, value) -> np.ndarray:
    """255/0 mask comparing against a scalar or another plane."""
    return np.where(_OPS[op](plane, value), 255, 0).astype(plane.dtype)


def mask_and(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.where((a != 0) & (b != 0), 255, 0).astype(a.dtype)


def fill(plane, bbox, v):
    x, y, w, h = bbox
    plane[y:y + h, x:x + w] = v
    return plane


def fill_outside(plane, bbox, v):
    x, y, w, h = bbox
    keep = plane[y:y + h, x:x + w].copy()
    plane[:] = v
    plane[y:y + h, x:x + w] = keep
    return plane


def remove_mask(plane, mask):
    plane[mask != 0] = 0
    return plane


def bbox_nonzero(plane):
    """(x, y, w, h) of the nonzero extent; (0,0,0,0) when empty."""
    ys, xs = np.nonzero(plane)
    if ys.size == 0:
        return (0, 0, 0, 0)
    return (int(xs.min()), int(ys.min()),
            int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1))


# ---------------------------------------------------------------------------
# erosion (exact scan-order semantics of Plane::Erosion)
# ---------------------------------------------------------------------------

def _flood_count(plane, sy, sx):
    """Iterative flood fill of 255-valued region, marking 128; returns size."""
    h, w = plane.shape
    stack = [(sy, sx)]
    count = 0
    while stack:
        y, x = stack.pop()
        if y < 0 or y >= h or x < 0 or x >= w or plane[y, x] != 255:
            continue
        plane[y, x] = 128
        count += 1
        stack.extend(((y, x + 1), (y, x - 1), (y + 1, x), (y - 1, x)))
    return count


def _flood_zero(plane, sy, sx):
    h, w = plane.shape
    stack = [(sy, sx)]
    while stack:
        y, x = stack.pop()
        if y < 0 or y >= h or x < 0 or x >= w:
            continue
        v = plane[y, x]
        if v == 0 or v > 128:
            continue
        plane[y, x] = 0
        stack.extend(((y, x + 1), (y, x - 1), (y + 1, x), (y - 1, x)))


def erosion(plane: np.ndarray, min_region: int = 50) -> np.ndarray:
    """In-place: remove isolated 1-2 pixel specks (scan order), then cull
    connected regions of <= min_region pixels."""
    h, w = plane.shape
    p = plane

    def at(y, x):
        if 0 <= y < h and 0 <= x < w:
            return p[y, x]
        return p[min(max(y, 0), h - 1), min(max(x, 0), w - 1)]

    for y in range(h):
        for x in range(w):
            if p[y, x] and not (at(y - 1, x) or at(y + 1, x)
                                or at(y, x - 1) or at(y, x + 1)):
                p[y, x] = 0
    for y in range(h):
        for x in range(w):
            if (p[y, x] and at(y, x + 1)
                    and not (at(y - 1, x) or at(y + 1, x) or at(y, x - 1)
                             or at(y, x + 2) or at(y - 1, x + 1)
                             or at(y + 1, x + 1))):
                p[y, x] = 0
                if x + 1 < w:
                    p[y, x + 1] = 0
    for y in range(h):
        for x in range(w):
            if (p[y, x] and at(y + 1, x)
                    and not (at(y - 1, x) or at(y + 2, x) or at(y, x - 1)
                             or at(y, x + 1) or at(y + 1, x - 1)
                             or at(y + 1, x + 1))):
                p[y, x] = 0
                if y + 1 < h:
                    p[y + 1, x] = 0

    for y in range(h):
        for x in range(w):
            count = _flood_count(p, y, x)
            if 1 <= count <= min_region:
                _flood_zero(p, y, x)
    p[p != 0] = 255
    return p


def reduce_quarter_logic_max(plane):
    h, w = plane.shape
    q = plane[: h // 2 * 2, : w // 2 * 2].reshape(h // 2, 2, w // 2, 2)
    return np.where((q != 0).all(axis=(1, 3)), 255, 0).astype(plane.dtype)


# ---------------------------------------------------------------------------
# resampling
# ---------------------------------------------------------------------------

def sample_down(plane, half_x, half_y, mode="average"):
    """Modes: average, nearest_tl, nearest_br, max, min (EDownSample).
    C '/' on non-negative values == //."""
    if not (half_x or half_y):
        return plane.copy()
    h, w = plane.shape
    p = plane.astype(np.int64)
    A = p[::2 if half_y else 1, ::2 if half_x else 1]
    B = p[::2 if half_y else 1, 1::2] if half_x else A
    C = p[1::2, ::2 if half_x else 1] if half_y else A
    D = p[1::2, 1::2] if (half_x and half_y) else (C if half_x else B)
    if mode == "average":
        # C '/' truncates toward zero - matters for signed (Co/Cg) planes
        def cdiv(s, d):
            return np.sign(s) * (np.abs(s) // d)
        if half_x and half_y:
            v = cdiv(A + B + C + D, 4)
        elif half_x:
            v = cdiv(A + B, 2)
        else:
            v = cdiv(A + C, 2)
    elif mode == "nearest_tl":
        v = A
    elif mode == "nearest_br":
        v = D if (half_x and half_y) else (C if half_x else B)
    elif mode == "max":
        v = np.maximum(np.maximum(A, B), np.maximum(C, D))
        if half_x and not half_y:
            v = np.maximum(A, C)   # reference quirk (x-only uses A/C)
        elif half_y and not half_x:
            v = np.maximum(A, B)
    elif mode == "min":
        v = np.minimum(np.minimum(A, B), np.minimum(C, D))
        if half_x and not half_y:
            v = np.minimum(A, C)
        elif half_y and not half_x:
            v = np.minimum(A, B)
    else:
        raise ValueError(mode)
    return v.astype(plane.dtype)


def sample_up(plane, up_x, up_y, interpolate=False):
    h, w = plane.shape
    p = plane.astype(np.int64)
    oh, ow = h * (2 if up_y else 1), w * (2 if up_x else 1)
    out = np.zeros((oh, ow), np.int64)
    B = np.roll(p, -1, axis=1)   # reference reads x+1 (wraps garbage at edge;
    C = np.roll(p, -1, axis=0)   # we clamp-free like C reads past, but rolled)
    D = np.roll(C, -1, axis=1)
    if not interpolate:
        out[::2 if up_y else 1, ::2 if up_x else 1] = p
        if up_x:
            out[::2 if up_y else 1, 1::2] = p
        if up_y:
            out[1::2, ::2 if up_x else 1] = p
        if up_x and up_y:
            out[1::2, 1::2] = p
    else:
        out[::2 if up_y else 1, ::2 if up_x else 1] = p
        if up_x and up_y:
            out[::2, 1::2] = (p + B) // 2
            out[1::2, ::2] = (p + C) // 2
            out[1::2, 1::2] = (p + B + C + D) // 4
        elif up_x:
            out[:, 1::2] = (p + B) // 2
        elif up_y:
            out[1::2, :] = (p + C) // 2
    return out.astype(plane.dtype)


# ---------------------------------------------------------------------------
# parsing orders + diff (framework.h:23-49, 228-286; Plane::ApplyDiff)
# ---------------------------------------------------------------------------

def parsing_order(w, h, block, order="left_right"):
    """Yield (x, y, is_row_start) block origins in traversal order."""
    if order == "left_right":
        for y in range(0, h, block):
            for x in range(0, w, block):
                yield x, y, x == 0
    elif order == "top_down":
        for x in range(0, w, block):
            for y in range(0, h, block):
                yield x, y, y == 0
    else:
        raise ValueError(order)


def apply_diff(plane, block=1, order="left_right"):
    """Delta-encode block origins in parsing order (row starts keep value)."""
    h, w = plane.shape
    out = np.zeros_like(plane)
    prev = 0
    for x, y, is_marker in parsing_order(w, h, block, order):
        out[y, x] = plane[y, x] if is_marker else plane[y, x] - prev
        prev = plane[y, x]
    return out


# ---------------------------------------------------------------------------
# color transforms (EncoderContext.cpp:53-117, framework.h:290)
#  C '/' truncates toward zero: emulate for possibly-negative values
# ---------------------------------------------------------------------------

def _cdiv2(v):
    return np.sign(v) * (np.abs(v) // 2)


def rgb_to_ycocg(r, g, b):
    """Lossy /2 chroma (RGBtoYCoCg :53)."""
    co = r - b
    tmp = b + _cdiv2(co)
    cg = g - tmp
    y = tmp + _cdiv2(cg)
    return y, _cdiv2(co), _cdiv2(cg)


def ycocg_to_rgb(y, co, cg):
    """YCoCgtoRGB (:103)."""
    co = co * 2
    cg = cg * 2
    tmp = y - _cdiv2(cg)
    g = cg + tmp
    b = tmp - _cdiv2(co)
    r = b + co
    return r, g, b


def rgb_to_ycocg_pos(r, g, b):
    """Biased variant (RGBtoYCoCgPos :69)."""
    co = r - b
    tmp = b + _cdiv2(co)
    cg = g - tmp
    y = tmp + _cdiv2(cg)
    return y, _cdiv2(co) + 127, _cdiv2(cg) + 127


def ycocg_pos_to_rgb(y, co, cg):
    """YCoCgPostoRGB (:85)."""
    y = y - 127
    co = (co - 127) * 2
    cg = (cg - 127) * 2
    tmp = y - _cdiv2(cg)
    g = cg + tmp
    b = tmp - _cdiv2(co)
    r = b + co
    return r * 2, g * 2, b * 2


def round6(v):
    r = np.asarray(v) >> 2
    return (r << 2) | (r >> 4)


def compress_f(v, rate):
    return ((np.asarray(v) * rate) + 127) // 255


def uncompress_f(v, rate):
    inv = ((255 << 16) // rate) if rate else (255 << 16)
    return (np.asarray(v) * inv) >> 16


# ---------------------------------------------------------------------------
# histograms (Image::Compute4DHistogram - sparse equivalent)
# ---------------------------------------------------------------------------

def histogram_rgb(img, bbox=None, mask=None):
    """Counts of exact RGB triples; returns (colors [n,3] u8, counts [n])
    sorted by count descending (ties by first occurrence in raster order)."""
    h, w = img.shape[:2]
    if bbox is not None:
        x, y, bw, bh = bbox
        img = img[y:y + bh, x:x + bw]
        if mask is not None:
            mask = mask[y:y + bh, x:x + bw]
    flat = img[:, :, :3].reshape(-1, 3)
    if mask is not None:
        flat = flat[mask.reshape(-1) != 0]
    key = (flat[:, 0].astype(np.int64) << 16) | \
          (flat[:, 1].astype(np.int64) << 8) | flat[:, 2]
    uniq, first, counts = np.unique(key, return_index=True, return_counts=True)
    order = np.lexsort((first, -counts))
    uniq, counts = uniq[order], counts[order]
    colors = np.stack([(uniq >> 16) & 255, (uniq >> 8) & 255, uniq & 255],
                      axis=1).astype(np.uint8)
    return colors, counts
