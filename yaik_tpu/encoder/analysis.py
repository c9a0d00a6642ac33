"""DynamicTileAnalyze: the reference's variable-bit-depth LUT-mask research
instrumentation (EncoderContext.cpp:8578-8897 + findMask :8245 +
GetBitIndex :8318). It writes no stream - upstream it only printf'd zstd
size probes, and its global tables are stomped by the PLNT table-builder
overflow anyway (see encoder/plnt.py). Re-expressed as a pure analyzer
returning the numbers the reference printed.

Semantics kept exactly:
- 6-bit reduction idx = (v+1)>>2 clamped to 63 (:8620-8622);
- format classes by unique-count thresholds 4/8/16/32 (:8668-8683);
- "needCompress" when (max6-min6)+1 exceeds the class range: values
  normalized to a 64-bit occupancy mask via (v-min)*63/deltaV, deduped
  against a shared mask table with SUPERSET matching (findMask returns the
  first table entry containing the mask);
- per-pixel codes are 1-BASED popcount ranks within the mask
  (GetBitIndex counts bits 0..value inclusive, :8318-8323).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from yaik_tpu.entropy import zstd_backend as zstd


@dataclass
class AnalyzeReport:
    total_pixels: int = 0
    tiles_by_format: dict = field(default_factory=dict)  # type id -> tiles
    stream_sizes: dict = field(default_factory=dict)     # name -> (raw, zstd)
    mask_table_sizes: dict = field(default_factory=dict)  # bits -> entries

    def summary(self) -> str:
        lines = [f"pixels analyzed: {self.total_pixels}"]
        for t, n in sorted(self.tiles_by_format.items()):
            kind = "natural" if t < 5 else "masked"
            lines.append(f"  format {t} ({2 + (t % 5)} bit, {kind}): "
                         f"{n} tiles")
        for name, (raw, z) in sorted(self.stream_sizes.items()):
            lines.append(f"  stream {name}: {raw} -> {z} B")
        for bits, n in sorted(self.mask_table_sizes.items()):
            lines.append(f"  mask table {bits}-bit: {n} entries")
        return "\n".join(lines)


def _find_mask(tables: dict, bits: int, mask: int) -> int:
    tbl = tables.setdefault(bits, [])
    for n, m in enumerate(tbl):
        if (m & mask) == mask:      # superset match (:8270-8274)
            return n
    tbl.append(mask)
    return len(tbl) - 1


def _bit_index(mask: int, value: int) -> int:
    clip = (1 << (value + 1)) - 1
    return bin(mask & clip).count("1")   # 1-based rank (:8318-8323)


def dynamic_tile_analyze(plane: np.ndarray,
                         claims: np.ndarray | None = None) -> AnalyzeReport:
    """Analyze one plane ([H, W] i32/u8) like DynamicTileAnalyze: claims is
    the 4x4-granular claim map ([H, W] bool, True = already coded)."""
    h, w = plane.shape
    if claims is None:
        claims = np.zeros((h, w), bool)
    rep = AnalyzeReport()
    streams = {b: bytearray() for b in (2, 3, 4, 5, 6)}
    types = bytearray()
    params = bytearray()
    lut_ids = []
    mask_tables: dict = {}

    for y in range(0, h, 8):
        for x in range(0, w, 8):
            vals6 = []
            for y2 in (0, 4):
                for x2 in (0, 4):
                    if not claims[min(y + y2, h - 1), min(x + x2, w - 1)]:
                        q = plane[y + y2:y + y2 + 4, x + x2:x + x2 + 4]
                        idx = np.minimum((q.astype(np.int64) + 1) >> 2, 63)
                        vals6.extend(int(v) for v in idx.reshape(-1))
            if not vals6:
                continue
            rep.total_pixels += len(vals6)
            arr = np.asarray(vals6, np.int64)
            unique = len(np.unique(arr))
            mn6, mx6 = int(arr.min()), int(arr.max())
            delta = (mx6 - mn6) + 1
            delta_v = mx6 - mn6

            fmt = 4
            rng = 64
            for f, thr, r in ((3, 32, 32), (2, 16, 16), (1, 8, 8), (0, 4, 4)):
                if unique <= thr:
                    fmt, rng = f, r
            bit = fmt + 2

            if delta <= rng:                      # natural (:8693)
                types.append(fmt)
                params.append(mn6)
                streams[bit] += bytes(int(v - mn6) for v in arr)
                rep.tiles_by_format[fmt] = rep.tiles_by_format.get(fmt, 0) + 1
            else:                                  # masked (:8713)
                types.append(fmt + 5)
                norm = ((arr - mn6) * 63) // delta_v
                mask = 0
                for v in norm:
                    mask |= 1 << int(v)
                params.append(mn6)
                params.append(delta_v)
                mask_bits = {0: 2, 1: 3, 2: 4, 3: 5}.get(fmt, 5)
                lut_ids.append(_find_mask(mask_tables, mask_bits, mask))
                streams[bit] += bytes(_bit_index(mask, int(v)) & 0xFF
                                      for v in norm)
                rep.tiles_by_format[fmt + 5] = \
                    rep.tiles_by_format.get(fmt + 5, 0) + 1

    def probe(name, data: bytes):
        rep.stream_sizes[name] = (
            len(data), len(zstd.compress(bytes(data), 18)) if data else 0)

    for b in (6, 5, 4, 3, 2):
        probe(f"{b}bit", bytes(streams[b]))
    probe("types", bytes(types))
    probe("params", bytes(params))
    probe("lut_ids", np.asarray(lut_ids, "<u2").tobytes())
    rep.mask_table_sizes = {b: len(t) for b, t in mask_tables.items()}
    return rep


def analyze_color_count(planes: np.ndarray, tile_size: int = 8):
    """AnalyzeColorCount (EncoderContext.cpp:6096-6185): per-tile unique
    6-bit-quantized RGB counts. The reference body is dead (immediate
    `return` at :6098) and, when read past that, only zeroes plane channels
    as a PALETTE.png visualization; this analyzer returns the numbers.

    planes: [3, H, W] i32. Returns (counts [nty, ntx] i32, class histogram
    dict keyed by the reference's visualization classes)."""
    _, h, w = planes.shape
    q = (planes >> 2).astype(np.int64)
    nty, ntx = h // tile_size, w // tile_size
    counts = np.zeros((nty, ntx), np.int32)
    packed = (q[0] << 12) | (q[1] << 6) | q[2]
    for ty in range(nty):
        for tx in range(ntx):
            t = packed[ty * tile_size:(ty + 1) * tile_size,
                       tx * tile_size:(tx + 1) * tile_size]
            counts[ty, tx] = len(np.unique(t))
    hist = {
        "1 (flat)": int((counts == 1).sum()),
        "<=4": int(((counts > 1) & (counts <= 4)).sum()),
        "<=8": int(((counts > 4) & (counts <= 8)).sum()),
        "<12": int(((counts > 8) & (counts < 12)).sum()),
        "<16": int(((counts >= 12) & (counts < 16)).sum()),
        ">=16": int((counts >= 16).sum()),
    }
    return counts, hist
