#!/usr/bin/env python3
"""Generate a synthetic Bank2D: 64x64 pattern PNGs with exactly 64 white
points each, the 2D analog of the Bank3D point clouds.

The reference's 2D bank files (Bank2D/*.lut.png, EncoderContext.cpp:8037-8069)
are not shipped in the repo; they were captured from real tiles by the
isCaptureMode2D path (:6965-6982, 64x64 PNG with one white pixel per
normalized (a,b) sample). These synthetic patterns follow that exact format.
Exactly 64 points per pattern keeps every xFactor/yFactor table fully
initialized (fewer points would expose the reference's uninitialized-tail
write in BinarySave2D).
"""
import os
import sys

import numpy as np
from PIL import Image

# file names follow the reference list's naming shape (tileMapNNNN.lut.png)
PATTERNS = {}


def _dedup_to_64(xs, ys):
    """Reduce to exactly 64 distinct (x, y) points, preserving curve order."""
    seen = set()
    pts = []
    for x, y in zip(xs, ys):
        p = (int(np.clip(x, 0, 63)), int(np.clip(y, 0, 63)))
        if p not in seen:
            seen.add(p)
            pts.append(p)
    t = 0
    while len(pts) < 64:   # pad with neighbors of existing points
        x, y = pts[t % len(pts)]
        for dx, dy in ((1, 0), (0, 1), (-1, 0), (0, -1)):
            q = (min(63, max(0, x + dx)), min(63, max(0, y + dy)))
            if q not in seen:
                seen.add(q)
                pts.append(q)
                break
        t += 1
    return pts[:64]


def _curve(f, n=256):
    t = np.linspace(0.0, 1.0, n)
    xs, ys = f(t)
    return _dedup_to_64(np.round(xs).astype(int), np.round(ys).astype(int))


def build_patterns():
    pats = {}
    pats["t1_tileMap1001"] = _curve(lambda t: (63 * t, 63 * t))
    pats["t2_tileMap1002"] = _curve(lambda t: (63 * t, 63 * (1 - t)))
    pats["t3_tileMap1003"] = _curve(lambda t: (63 * t, 63 * t * t))
    pats["t4_tileMap1004"] = _curve(lambda t: (63 * t, 63 * np.sqrt(t)))
    pats["t5_tileMap1005"] = _curve(
        lambda t: (63 * t, 63 * (0.5 + 0.5 * np.sin(2 * np.pi * t)) * 0.5))
    pats["t6_tileMap1006"] = _curve(
        lambda t: (31.5 + 31.5 * np.cos(np.pi * t), 63 * t))
    pats["t7_tileMap1007"] = _curve(
        lambda t: (63 * t, np.where(t < 0.5, 126 * t, 63 * np.ones_like(t))))
    pats["t8_tileMap1008"] = _curve(
        lambda t: (63 * t, np.where(t < 0.5, np.zeros_like(t), 126 * (t - .5))))
    pats["t9_tileMap1009"] = _curve(lambda t: (63 * t, 63 * t ** 3))
    pats["t10_tileMap1010"] = _curve(
        lambda t: (63 * t, 31.5 + 31.5 * np.sin(np.pi * (t - 0.5))))
    pats["t11_tileMap1011"] = _curve(  # shallow slope: low-b correlation
        lambda t: (63 * t, 16 * t))
    pats["t12_tileMap1012"] = _curve(  # steep: low-a
        lambda t: (16 * t, 63 * t))
    return pats


def main(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    for name, pts in sorted(build_patterns().items()):
        img = np.zeros((64, 64, 3), np.uint8)
        for x, y in pts:
            img[y, x] = 255
        Image.fromarray(img).save(os.path.join(out_dir, f"{name}.lut.png"))
    print(f"Bank2D written to {out_dir} "
          f"({len(build_patterns())} patterns, 64 pts each)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "Bank2D")
