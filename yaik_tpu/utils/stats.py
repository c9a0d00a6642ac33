"""Per-technique encoder statistics (the codec's quality dashboard).

Mirrors the reference's LocalStats/EncoderStats (EncoderContext.h:22-181)
and its `<out>.yaik.log.txt` dump (EncoderContext.cpp:9480-9537): pixel
counts claimed per technique per tile size, per-bit-depth 3D pixels, and
compressed chunk sizes - these directly support bpp parity checks.
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class EncoderStats:
    width: int = 0
    height: int = 0
    # pixels claimed per gradient tile size, keyed "16x16".."4x4"
    gradient_pixels: dict = field(default_factory=dict)
    # pixels claimed per 3D tile size
    tile3d_pixels: dict = field(default_factory=dict)
    # pixels per 3D bit depth 3..6
    tile3d_bit_pixels: dict = field(default_factory=dict)
    # pixels written per 2D plane-pair pass, keyed "RG 8x8".."RB 4x4"
    tile2d_pixels: dict = field(default_factory=dict)
    # UCOL palette map pixels
    ucol_pixels: int = 0
    # 3D LUT usage histogram (lut index -> tiles)
    lut_histogram: dict = field(default_factory=dict)
    tile3d_count: int = 0
    pixels_1d: int = 0
    # compressed chunk bytes by tag
    chunk_bytes: dict = field(default_factory=dict)
    total_bytes: int = 0

    @property
    def total_pixels(self):
        return self.width * self.height

    @property
    def bpp(self):
        return self.total_bytes * 8 / max(1, self.total_pixels)

    def add_gradient(self, sx, sy, tiles):
        key = f"{1 << sx}x{1 << sy}"
        self.gradient_pixels[key] = (self.gradient_pixels.get(key, 0)
                                     + tiles * (1 << sx) * (1 << sy))

    def add_tile3d(self, sx, sy, pixel_count, bit, lut_idx):
        key = f"{1 << sx}x{1 << sy}"
        self.tile3d_pixels[key] = self.tile3d_pixels.get(key, 0) + pixel_count
        self.tile3d_bit_pixels[bit] = (self.tile3d_bit_pixels.get(bit, 0)
                                       + pixel_count)
        self.lut_histogram[lut_idx] = self.lut_histogram.get(lut_idx, 0) + 1
        self.tile3d_count += 1

    def add_chunk(self, tag: str, nbytes: int):
        self.chunk_bytes[tag] = self.chunk_bytes.get(tag, 0) + nbytes

    def summary(self) -> str:
        lines = [f"image {self.width}x{self.height}  "
                 f"stream {self.total_bytes} B  {self.bpp:.3f} bpp"]
        claimed = 0
        for key, px in sorted(self.gradient_pixels.items()):
            lines.append(f"  gradient {key:7s}: {px:8d} px")
            claimed += px
        for key, px in sorted(self.tile3d_pixels.items()):
            lines.append(f"  3d-lut   {key:7s}: {px:8d} px")
            claimed += px
        for bit, px in sorted(self.tile3d_bit_pixels.items()):
            lines.append(f"  3d-lut   {bit}-bit  : {px:8d} px")
        for key, px in sorted(self.tile2d_pixels.items()):
            lines.append(f"  2d-lut   {key:7s}: {px:8d} px")
            claimed += px // 2     # two of three planes written per pixel
        if self.ucol_pixels:
            lines.append(f"  ucol palette    : {self.ucol_pixels:8d} px")
        lines.append(f"  1d residual     : {self.pixels_1d:8d} px")
        claimed += self.pixels_1d
        lines.append(f"  claimed total   : {claimed:8d} / {self.total_pixels}")
        for tag, b in sorted(self.chunk_bytes.items()):
            lines.append(f"  chunk {tag:5s}     : {b:8d} B")
        return "\n".join(lines)

    def to_json(self) -> str:
        return json.dumps({
            "width": self.width, "height": self.height,
            "bpp": self.bpp, "total_bytes": self.total_bytes,
            "gradient_pixels": self.gradient_pixels,
            "tile3d_pixels": self.tile3d_pixels,
            "tile3d_bit_pixels": {str(k): v for k, v
                                  in self.tile3d_bit_pixels.items()},
            "lut_histogram": {str(k): v for k, v in self.lut_histogram.items()},
            "tile2d_pixels": self.tile2d_pixels,
            "ucol_pixels": self.ucol_pixels,
            "tile3d_count": self.tile3d_count,
            "pixels_1d": self.pixels_1d,
            "chunk_bytes": self.chunk_bytes,
        })


def analyze(stream: bytes, lut_data: bytes | None = None) -> EncoderStats:
    """Per-technique statistics for any .yaik stream (ours or reference).

    Replays the decode plan to attribute every pixel to the technique that
    coded it; chunk byte counts come straight from the chunk framing.
    """
    import numpy as np

    from yaik_tpu.decoder import planner as plannermod
    from yaik_tpu.decoder.reference import iter_chunks
    from yaik_tpu.format import lut as lutmod
    from yaik_tpu.format.headers import FileHeader, HeaderBase

    if lut_data is not None:
        expanded = lutmod.expand_lut(lutmod.parse_lut_file(lut_data))
    else:
        # stats need shapes only; dummy full-size tables
        expanded = {bit: np.zeros((256 * 64, 1 << bit, 3), np.int32)
                    for bit in (3, 4, 5, 6)}
    expanded2d = {bit: np.zeros((256 * 8, 1 << bit, 2), np.int32)
                  for bit in (3, 4, 5, 6)}
    fh = FileHeader.unpack(stream)
    st = EncoderStats(width=fh.width, height=fh.height)
    st.total_bytes = len(stream)

    for tag, off, body in iter_chunks(stream):
        st.add_chunk(tag.decode(), len(body) + HeaderBase.size())

    plan = plannermod.build_plan(stream, expanded, expanded2d)
    for g in plan.gradient:
        sx, sy = g.shift
        st.add_gradient(sx, sy, int(g.accept.sum()))
    for p in plan.tile3d:
        sx, sy = p.shift
        acc = p.accept.reshape(-1)
        for gid in np.flatnonzero(acc):
            t = int(p.types[gid])
            st.add_tile3d(sx, sy, int((p.packed[gid] >> 6).sum()),
                          ((t >> 14) & 3) + 3, (t >> 6) & 0xFF)
    if plan.tile2d:
        names = {0: "RG", 1: "GB", 2: "RB"}
        for p in plan.tile2d:
            sx, sy = p.shift
            key = f"{names[p.mode]} {1 << sx}x{1 << sy}"
            px = int((p.packed >> 6).astype(bool).sum())
            if px:
                st.tile2d_pixels[key] = st.tile2d_pixels.get(key, 0) + px
    if plan.overlay is not None:
        st.ucol_pixels = int(plan.overlay.mask.sum())
    st.pixels_1d = int(plan.d1.wmask[0].sum())
    return st


def accumulate_global(path, st: EncoderStats) -> dict:
    """Cross-run statistics accumulation: the reference's globalStats.bin
    analog (read at encoder load, written at end, EncoderContext.cpp:
    1245-1252,9474-9478) as a JSON file. Merges this encode's counters into
    the file and returns the accumulated totals."""
    import os

    acc = {"images": 0, "pixels": 0, "bytes": 0, "gradient_pixels": {},
           "tile3d_pixels": {}, "tile3d_bit_pixels": {}, "lut_histogram": {},
           "pixels_1d": 0, "chunk_bytes": {}}
    if os.path.exists(path):
        with open(path) as f:
            loaded = json.load(f)
        if not isinstance(loaded, dict) or "images" not in loaded:
            raise ValueError(f"{path} is not a yaik_tpu global-stats file")
        acc.update(loaded)

    def merge(key, src):
        dst = acc[key]
        for k, v in src.items():
            dst[str(k)] = dst.get(str(k), 0) + v

    acc["images"] += 1
    acc["pixels"] += st.total_pixels
    acc["bytes"] += st.total_bytes
    acc["pixels_1d"] += st.pixels_1d
    merge("gradient_pixels", st.gradient_pixels)
    merge("tile3d_pixels", st.tile3d_pixels)
    merge("tile3d_bit_pixels", st.tile3d_bit_pixels)
    merge("lut_histogram", st.lut_histogram)
    merge("chunk_bytes", st.chunk_bytes)
    acc["bpp"] = acc["bytes"] * 8 / max(1, acc["pixels"])
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(acc, f, indent=1)
    os.replace(tmp, path)
    return acc
