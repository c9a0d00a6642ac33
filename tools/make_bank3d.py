#!/usr/bin/env python3
"""Synthesize a Bank3D point-cloud bank for the YAIK encoder's 3D-LUT pass.

The reference repo ships without its 22 `Bank3D/*.lut` training artifacts
(they are gitignored upstream; see reference EncoderContext.cpp:7796-7819 for
the load sites and :7860-7886 for the file format: u8 count, then r[count],
g[count], b[count] with values in 0..63, the 64^3 unit cube).

We mint our own bank of plausible tile-cloud shapes (diagonals, arcs, elbows,
planes) so that both the reference encoder and yaik_tpu consume the *same*
bank and must produce identical streams. Deterministic (fixed seed).
"""
import os
import sys
import numpy as np


def line(p0, p1, n):
    t = np.linspace(0.0, 1.0, n)[:, None]
    return p0 + (np.asarray(p1, np.float64) - p0) * t


def polyline(points, n):
    points = np.asarray(points, np.float64)
    segs = len(points) - 1
    per = [n // segs] * segs
    per[-1] += n - sum(per)
    out = [line(points[i], points[i + 1], per[i]) for i in range(segs)]
    return np.concatenate(out, axis=0)


def arc(p0, mid, p1, n):
    """Quadratic bezier through the cube."""
    t = np.linspace(0.0, 1.0, n)[:, None]
    p0, mid, p1 = (np.asarray(p, np.float64) for p in (p0, mid, p1))
    return (1 - t) ** 2 * p0 + 2 * (1 - t) * t * mid + t ** 2 * p1


def clouds():
    rng = np.random.default_rng(1234)
    out = []
    # 1. main diagonal (luminance ramp -- the most common tile shape)
    out.append(line([0, 0, 0], [63, 63, 63], 64))
    # 2. diagonal with a warm bend
    out.append(arc([0, 0, 0], [48, 24, 16], [63, 63, 63], 64))
    # 3. diagonal with a cool bend
    out.append(arc([0, 0, 0], [16, 24, 48], [63, 63, 63], 64))
    # 4. elbow: dark->red->white
    out.append(polyline([[0, 0, 0], [55, 12, 10], [63, 63, 63]], 64))
    # 5. elbow: dark->blue->white
    out.append(polyline([[0, 0, 0], [10, 14, 58], [63, 63, 63]], 64))
    # 6. skin-tone-ish curve
    out.append(arc([20, 8, 6], [52, 30, 22], [63, 56, 50], 64))
    # 7. two-cluster split (shadow/highlight)
    a = line([4, 4, 8], [20, 16, 24], 32)
    b = line([44, 40, 48], [62, 60, 63], 32)
    out.append(np.concatenate([a, b], axis=0))
    # 8. green foliage curve
    out.append(arc([4, 12, 4], [20, 52, 18], [56, 63, 48], 64))
    # 9. horseshoe (hue swing at constant value)
    out.append(polyline([[56, 16, 16], [40, 40, 12], [16, 56, 20]], 64))
    # 10. plane-ish scatter around R+B=const (deterministic jitter)
    t = np.linspace(0, 1, 64)
    base = np.stack([t * 63, np.full(64, 32.0), (1 - t) * 63], axis=1)
    base += rng.normal(0, 2.5, base.shape)
    out.append(base)
    # 11. S-curve
    out.append(polyline([[0, 0, 0], [40, 10, 30], [20, 50, 40], [63, 63, 63]], 64))
    # 12. short bright segment (pastel tiles)
    out.append(line([40, 44, 48], [63, 60, 56], 64))
    return [np.clip(np.round(c), 0, 63).astype(np.uint8) for c in out]


def main(outdir):
    os.makedirs(outdir, exist_ok=True)
    # The reference loads exactly these 22 hardcoded file names
    # (EncoderContext.cpp:7796-7819). We provide 12 distinct clouds and
    # leave the rest absent (Load3DPattern skips missing files silently).
    names = [
        "tileMap_Aqours_31107015_n_2250p.png_352-1416.lut",
        "tileMap_Aqours_41107010_2250p.png_1000-112.lut",
        "tileMap_Aqours_41107010_2250p.png_1000-504.lut",
        "tileMap_Aqours_43104009_r_2250p.png_1520-1968.lut",
        "tileMap_Aqours_43104009_r_2250p.png_1520-1976.lut",
        "tileMap_Aqours_43104009_r_2250p.png_1520-800.lut",
        "tileMap_Aqours_43104009_r_2250p.png_1568-2104.lut",
        "tileMap_Aqours_43104009_r_2250p.png_280-888.lut",
        "tileMap_Aqours_43104009_r_2250p.png_352-840.lut",
        "tileMap_Aqours_43104009_r_2250p.png_448-2088.lut",
        "tileMap_Aqours_43104009_r_2250p.png_464-1632.lut",
        "tileMap_Aqours_43104009_r_2250p.png_608-2152.lut",
    ]
    cs = clouds()
    for name, c in zip(names, cs):
        with open(os.path.join(outdir, name), "wb") as f:
            n = len(c)
            f.write(bytes([n & 0xFF]))
            f.write(c[:, 0].tobytes())
            f.write(c[:, 1].tobytes())
            f.write(c[:, 2].tobytes())
    print(f"wrote {len(cs)} bank files to {outdir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "Bank3D")
