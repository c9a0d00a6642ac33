"""Line-segment geometry + segment-based 3D LUT construction.

Ports of encoder/Segments.h (LinearEqu2D::ComputeDistance2D :143,
LinearEqu3D::ComputeDistance3D :214) and the segment-list LUT path
(EvalCtx3D::Set3D / BuildDistanceField3D / BuildTable3D,
EncoderContext.cpp:4817-5056). The active reference pipeline loads
point-cloud banks only, but the built-in segment patterns (the commented
diag3D/hoppe/equerre sets, :7686-7794) go through this machinery; providing
it completes the LUT-bank toolchain for bank authoring without captures.
"""
from __future__ import annotations

import numpy as np

from yaik_tpu.encoder.bank import FACTOR, EvalCtx3D


def segment_distance_3d(p, a, b):
    """Euclidean distance from points p [n,3] to segment a->b (f32).
    Clamped parametric projection, like ComputeDistance3D."""
    p = np.asarray(p, np.float32)
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    d = b - a
    denom = np.float32((d * d).sum())
    u = ((p - a) * d).sum(axis=1) / denom
    u = np.clip(u, 0.0, 1.0)
    proj = a + u[:, None] * d
    return np.sqrt(((p - proj) ** 2).sum(axis=1)), u


def build_ctx_from_segments(segments) -> EvalCtx3D:
    """Segment-list LUT: factor tables sampled uniformly by arc length
    (BuildTable3D), index maps + distance field by nearest sample point.

    segments: list of (x0,y0,z0,x1,y1,z1) in the 0..64 cube.
    """
    segs = np.asarray(segments, np.float32).reshape(-1, 2, 3)
    lengths = np.sqrt(((segs[:, 1] - segs[:, 0]) ** 2).sum(axis=1))
    total = lengths.sum()
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])

    def table(n):
        out = np.zeros((n, 3), np.int16)
        pos = 0.0
        step = 1.0 / (n - 1)
        for i in range(n):
            t = min(pos * total, total)
            k = np.searchsorted(np.cumsum(lengths), t, side="left")
            k = min(k, len(segs) - 1)
            local = (t - starts[k]) / max(lengths[k], 1e-9)
            pt = segs[k, 0] + local * (segs[k, 1] - segs[k, 0])
            out[i] = ((pt / np.float32(64.0)) * FACTOR).astype(np.int16)
            pos += step
        return out

    factors = {bit: table(1 << bit) for bit in (3, 4, 5, 6)}

    # index maps: nearest factor-table entry per voxel (values back in 0..64)
    g = np.arange(64)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    coords = np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32)
    position = {}
    dist_field = None
    for bit in (6, 5, 4, 3):
        pts = factors[bit].astype(np.float32) * np.float32(64.0 / FACTOR)
        d = ((coords[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
        idx = d.argmin(axis=1)
        position[bit] = idx.astype(np.int32).reshape(64, 64, 64)
        dist_field = d[np.arange(len(coords)), idx].astype(np.int32)
    return EvalCtx3D(factors=factors, position=position,
                     dist_field=dist_field)
