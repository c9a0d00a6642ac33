#!/usr/bin/env python3
"""Deterministic synthetic test images for YAIK fixture generation.

Anime-art-like content mix: large smooth bilinear gradients (gradient-tile
food), correlated color ramps (3D-LUT food), cel-shaded flat regions and
speckle (1D-residual food). All dimensions are multiples of 8 (the reference
encoder rejects others, Image.cpp:206-208).
"""
import os
import sys
import numpy as np
from PIL import Image


def bilinear_patch(h, w, c00, c01, c10, c11):
    ty = np.linspace(0, 1, h)[:, None, None]
    tx = np.linspace(0, 1, w)[None, :, None]
    c00, c01, c10, c11 = (np.asarray(c, np.float64) for c in (c00, c01, c10, c11))
    top = c00 * (1 - tx) + c01 * tx
    bot = c10 * (1 - tx) + c11 * tx
    return top * (1 - ty) + bot * ty


def gradient_quilt(rng, h, w, cell):
    """Grid of bilinear patches with shared corner colors -> perfectly
    gradient-tile-compressible content."""
    gh, gw = h // cell + 1, w // cell + 1
    corners = rng.integers(0, 256, (gh, gw, 3)).astype(np.float64)
    img = np.zeros((h, w, 3))
    for gy in range(h // cell):
        for gx in range(w // cell):
            img[gy * cell:(gy + 1) * cell, gx * cell:(gx + 1) * cell] = bilinear_patch(
                cell, cell, corners[gy, gx], corners[gy, gx + 1],
                corners[gy + 1, gx], corners[gy + 1, gx + 1])
    return img


def ramp_region(rng, h, w):
    """Colors along a bent 1D path in RGB space, spatially smooth -> 3D-LUT food."""
    p0 = rng.integers(0, 100, 3).astype(np.float64)
    p1 = rng.integers(100, 200, 3).astype(np.float64)
    p2 = rng.integers(180, 256, 3).astype(np.float64)
    yy, xx = np.mgrid[0:h, 0:w]
    t = (np.sin(xx / w * 2.3 + yy / h * 1.7) + 1) / 2
    t = t[:, :, None]
    return (1 - t) ** 2 * p0 + 2 * (1 - t) * t * p1 + t ** 2 * p2


def cel_region(rng, h, w, levels=4):
    """Cel-shaded: quantized radial shading + outline-ish noise."""
    yy, xx = np.mgrid[0:h, 0:w]
    cx, cy = w * 0.6, h * 0.4
    r = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2) / (0.7 * max(h, w))
    q = np.floor(np.clip(1 - r, 0, 0.999) * levels) / levels
    base = rng.integers(60, 220, 3).astype(np.float64)
    img = base[None, None, :] * (0.4 + 0.6 * q[:, :, None])
    speck = rng.random((h, w)) < 0.02
    img[speck] = rng.integers(0, 256, (speck.sum(), 3))
    return img


def make_main(rng, size):
    h = w = size
    img = np.zeros((h, w, 3))
    img[: h // 2, : w // 2] = gradient_quilt(rng, h // 2, w // 2, 32)
    img[: h // 2, w // 2:] = ramp_region(rng, h // 2, w - w // 2)
    img[h // 2:, : w // 2] = cel_region(rng, h - h // 2, w // 2)
    # bottom-right: a softer quilt overlaid with a ramp (mixed content)
    q = gradient_quilt(rng, h - h // 2, w - w // 2, 64)
    r = ramp_region(rng, h - h // 2, w - w // 2)
    img[h // 2:, w // 2:] = 0.5 * q + 0.5 * r
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def make_sprite_rgba(rng, size):
    """Sprite sheet: transparent background, opaque cel blobs, soft shadow."""
    h = w = size
    rgb = cel_region(rng, h, w, levels=5)
    alpha = np.zeros((h, w))
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(6):
        cx, cy = rng.integers(0, w), rng.integers(0, h)
        rad = rng.integers(size // 10, size // 4)
        d = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
        alpha = np.maximum(alpha, np.clip((rad - d) / 8, 0, 1))
    a8 = np.round(alpha * 255).astype(np.uint8)
    out = np.concatenate([np.clip(np.round(rgb), 0, 255).astype(np.uint8),
                          a8[:, :, None]], axis=2)
    out[a8 == 0, :3] = 0
    return out


def make_corr2d(rng, size):
    """2D-correlation food: per 8x8 tile, one channel PAIR follows a narrow
    (delta <= 10) correlated curve while the third channel is loud noise.
    The noise defeats the gradient pass (err > 3) and the 3D pass (no bank
    curve matches a random axis); the quiet pair stays within the 2D pass's
    reconstruction budget (LUT values 0..63 against a /128 divide means only
    low-dynamic tiles fit err <= 6 - true for the reference's 2D path too).
    Thirds of the image exercise Mode_RG, Mode_GB, Mode_RB; a sprinkling of
    noisy quads inside otherwise-quiet tiles leaves work for the 4x4 pass."""
    h = w = size
    img = np.zeros((h, w, 3), np.int64)
    curves = [
        lambda s: (s, s),                       # diagonal
        lambda s: (s, 63 - s),                  # anti-diagonal
        lambda s: (s, (s * s) // 63),           # quadratic
    ]
    for ty in range(h // 8):
        for tx in range(w // 8):
            region = (3 * tx * 8) // w          # 0: RG, 1: GB, 2: RB
            pa, pb = [(0, 1), (1, 2), (0, 2)][region]
            pn = 3 - pa - pb
            curve = curves[rng.integers(0, len(curves))]
            base_a = int(rng.integers(40, 200))
            base_b = int(rng.integers(40, 200))
            da = int(rng.integers(6, 11))
            db = int(rng.integers(6, 11))
            s = rng.integers(0, 64, (8, 8))
            ca, cb = curve(s)
            tile = np.zeros((8, 8, 3), np.int64)
            tile[:, :, pa] = base_a + (ca * da) // 63
            tile[:, :, pb] = base_b + (cb * db) // 63
            tile[:, :, pn] = rng.integers(0, 256, (8, 8))
            if rng.random() < 0.25:
                # one loud quad: the 8x8 2D tile rejects, 4x4 picks up rest
                qy, qx = rng.integers(0, 2) * 4, rng.integers(0, 2) * 4
                tile[qy:qy + 4, qx:qx + 4, pa] = rng.integers(0, 256, (4, 4))
            img[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8] = tile
    return np.clip(img, 0, 255).astype(np.uint8)


def make_gradpair(rng, size):
    """Plane-subset gradient food: vertical bands where only a SUBSET of
    channels is bilinear-smooth and the rest is loud noise, so the full-RGB
    gradient pass rejects but the disabled 2-plane (RB/RG/GB) and 1-plane
    (R/G/B) 4x4 passes accept. Band order matches the reference's disabled
    call order (EncoderContext.cpp:9260-9290, 9392-9420)."""
    h = w = size
    img = np.zeros((h, w, 3), np.int64)
    # leading full-RGB band: the reference decoder allocates its claim
    # masks in the FIRST GTIL handler, and a stream whose first pixel chunk
    # is 3DTL fails to decode there - give it one plane-7 gradient band
    bands = [(0, 1, 2), (0, 2), (0, 1), (1, 2), (0,), (1,), (2,)]
    bw = w // len(bands)
    for k, smooth in enumerate(bands):
        x0, x1 = k * bw, (k + 1) * bw if k < len(bands) - 1 else w
        patch = gradient_quilt(rng, h, x1 - x0, 32)
        noise = rng.integers(0, 256, (h, x1 - x0, 3))
        for c in range(3):
            img[:, x0:x1, c] = (np.round(patch[:, :, c]) if c in smooth
                                else noise[:, :, c])
    return np.clip(img, 0, 255).astype(np.uint8)


def main(outdir):
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(20260816)
    Image.fromarray(make_main(rng, 512)).save(os.path.join(outdir, "img512.png"))
    Image.fromarray(make_main(rng, 128)).save(os.path.join(outdir, "img128.png"))
    Image.fromarray(make_main(rng, 64)).save(os.path.join(outdir, "img64.png"))
    # pure gradient quilt: every tile should be claimed by the gradient pass
    g = np.clip(np.round(gradient_quilt(rng, 128, 128, 32)), 0, 255).astype(np.uint8)
    Image.fromarray(g).save(os.path.join(outdir, "quilt128.png"))
    Image.fromarray(make_sprite_rgba(rng, 256)).save(os.path.join(outdir, "sprite256.png"))
    Image.fromarray(make_corr2d(rng, 128)).save(os.path.join(outdir, "corr2d128.png"))
    Image.fromarray(make_gradpair(rng, 192)).save(os.path.join(outdir, "gradpair192.png"))
    print(f"wrote test images to {outdir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "images")
