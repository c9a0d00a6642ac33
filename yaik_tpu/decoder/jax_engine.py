"""TPU decode engine: dense, gather-free pixel kernels.

Consumes the dense per-tile tensors from yaik_tpu.decoder.planner and runs
all pixel math on device with TPU-friendly primitives only:

  - gradient passes: integer bilinear blends (broadcast + shifts, exact
    YAIK_Gradient.cpp semantics), masked by accept grids
  - 3D-LUT tiles: per-tile one-hot @ LUT-slice batched matmuls (MXU), then
    min + ((diff * L) >> 7)
  - 1D residual: pure elementwise select
  - image assembly: reshapes of full tile grids (no scatter)

The same function compiles for CPU tests and TPU, and batches with vmap.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from yaik_tpu.decoder import planner as plannermod
from yaik_tpu.format import lut as lutmod
from yaik_tpu.format import swizzle

GRAD_SHIFTS = tuple(swizzle.GRADIENT_PASS_ORDER)
T3_SHIFTS = tuple(swizzle.TILE3D_PASS_ORDER)

# opt-in Pallas path for the 3D-LUT resolve (identical output; keeps the
# one-hot expansion in VMEM instead of HBM). Default off: at current batch
# sizes both paths are dispatch-latency-bound and XLA fuses well.
USE_PALLAS = os.environ.get("YAIK_USE_PALLAS", "0") == "1"


def _blend_pass(plane, accept, corners, sx, sy):
    """One gradient pass: fill accepted tiles with the exact bilinear."""
    tw, th = 1 << sx, 1 << sy
    nty, ntx = accept.shape
    if nty == 0 or ntx == 0:
        return plane
    qsy, qsx = th // 4, tw // 4
    cg = corners.astype(jnp.int32)
    c00 = cg[:nty * qsy:qsy, :ntx * qsx:qsx]
    c01 = cg[:nty * qsy:qsy, qsx:ntx * qsx + 1:qsx]
    c10 = cg[qsy:nty * qsy + 1:qsy, :ntx * qsx:qsx]
    c11 = cg[qsy:nty * qsy + 1:qsy, qsx:ntx * qsx + 1:qsx]

    ry = jnp.arange(th, dtype=jnp.int32).reshape(1, th, 1, 1, 1)
    rx = jnp.arange(tw, dtype=jnp.int32).reshape(1, 1, 1, tw, 1)

    def up(c):  # [nty,ntx,3] -> [nty,1,ntx,1,3]
        return c[:, None, :, None, :]

    left = up(c00) * (th - ry) + up(c10) * ry
    right = up(c01) * (th - ry) + up(c11) * ry
    shift = (th.bit_length() - 1) + (tw.bit_length() - 1)
    vals = (left * (tw - rx) + right * rx) >> shift
    vals = vals.reshape(nty * th, ntx * tw, 3)

    mask = jnp.repeat(jnp.repeat(accept, th, axis=0), tw, axis=1)
    region = plane[: nty * th, : ntx * tw]
    region = jnp.where(mask[:, :, None], vals, region)
    return plane.at[: nty * th, : ntx * tw].set(region)


def _tile3d_pass(plane, accept, luts, colors, indices, wmask, sx, sy):
    """One 3D-LUT size pass as a batched one-hot matmul over the full grid."""
    tw, th = 1 << sx, 1 << sy
    nty, ntx = accept.shape
    g, npx = indices.shape
    if USE_PALLAS and jax.devices()[0].platform == "tpu":
        from yaik_tpu.ops.pallas_kernels import lut3d_resolve
        vals = lut3d_resolve(indices, luts, colors)           # [g, npx, 3]
    else:
        # one-hot [g, npx, 64] in f32 (exact for values <= 2^24)
        onehot = (indices[:, :, None] == jnp.arange(64, dtype=indices.dtype)
                  [None, None, :]).astype(jnp.float32)
        L = jnp.einsum("gpk,gkc->gpc", onehot, luts.astype(jnp.float32),
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        mn = colors[:, None, 0:3]
        diff = colors[:, None, 3:6] - mn
        vals = (mn + ((diff * L) >> 7)) & 0xFF                # [g, npx, 3]

    write = wmask & accept.reshape(g)[:, None]
    vals = vals.reshape(nty, ntx, th, tw, 3).transpose(0, 2, 1, 3, 4)
    vals = vals.reshape(nty * th, ntx * tw, 3)
    wm = write.reshape(nty, ntx, th, tw).transpose(0, 2, 1, 3)
    wm = wm.reshape(nty * th, ntx * tw)

    region = plane[: nty * th, : ntx * tw]
    region = jnp.where(wm[:, :, None], vals, region)
    return plane.at[: nty * th, : ntx * tw].set(region)


def _d1_pass(plane, params, indices, wmask, h8, w8):
    """1D residual for all 3 planes: pure elementwise."""
    nty, ntx = h8 // 8, w8 // 8
    g = nty * ntx
    outs = []
    for p in range(3):
        L = indices[p].astype(jnp.int32)                      # [g, 64]
        color0 = params[p, :, 0:1]
        base = params[p, :, 1:2]
        delta2 = params[p, :, 2:3]
        v = jnp.where(L != 0, base + (((L - 1) * delta2) >> 16), color0) & 0xFF
        v = v.reshape(nty, ntx, 8, 8).transpose(0, 2, 1, 3).reshape(h8, w8)
        wm = wmask[p].reshape(nty, ntx, 8, 8).transpose(0, 2, 1, 3)
        wm = wm.reshape(h8, w8)
        outs.append(jnp.where(wm, v, plane[:, :, p]))
    return jnp.stack(outs, axis=-1)


def decode_core(shifts, grad_accepts, grad_corners,
                t3_accepts, t3_luts, t3_colors, t3_indices, t3_wmasks,
                d1_params, d1_indices, d1_wmask):
    # image dims (multiples of 8) from the 4x4 3D pass grid
    nty4, ntx4 = t3_accepts[-1].shape
    h8, w8 = nty4 * 4, ntx4 * 4

    plane = jnp.full((h8, w8, 3), 0x80, jnp.int32)
    for k, (sx, sy) in enumerate(shifts):
        plane = _blend_pass(plane, grad_accepts[k], grad_corners[k], sx, sy)
    for k, (sx, sy) in enumerate(T3_SHIFTS):
        plane = _tile3d_pass(plane, t3_accepts[k], t3_luts[k], t3_colors[k],
                             t3_indices[k], t3_wmasks[k], sx, sy)
    plane = _d1_pass(plane, d1_params, d1_indices, d1_wmask, h8, w8)
    return plane.astype(jnp.uint8)


decode_pixels = partial(jax.jit, static_argnames=("shifts",))(decode_core)


def batched_decoder(shifts):
    """jit(vmap) decode over a leading batch axis."""
    core = lambda *args: decode_core(shifts, *args)
    in_axes = ((0,) * 7, (0,) * 7, (0,) * 6, (0,) * 6, (0,) * 6, (0,) * 6,
               (0,) * 6, 0, 0, 0)
    return jax.jit(jax.vmap(core, in_axes=in_axes))


def plan_to_device_args(plan: plannermod.DecodePlan, lut_flat=None):
    """Assemble (static shifts, tensor args) from a plan. lut_flat is kept
    for API compatibility; the dense plan no longer needs it on device."""
    w, h = plan.width, plan.height
    qh, qw = h // 4 + 1, w // 4 + 1
    by_shift = {g.shift: g for g in plan.gradient}
    accepts, corners = [], []
    for (sx, sy) in GRAD_SHIFTS:
        tw, th = 1 << sx, 1 << sy
        g = by_shift.get((sx, sy))
        if g is None:
            accepts.append(np.zeros((h // th, w // tw), bool))
            corners.append(np.zeros((qh, qw, 3), np.uint8))
        else:
            accepts.append(g.accept)
            corners.append(g.corners)

    t3_by_shift = {p.shift: p for p in plan.tile3d}
    t3a, t3l, t3c, t3i, t3w = [], [], [], [], []
    for (sx, sy) in T3_SHIFTS:
        tw, th = 1 << sx, 1 << sy
        p = t3_by_shift.get((sx, sy))
        if p is None:
            ntx, nty = w // tw, h // th
            g = nty * ntx
            p = plannermod.Tile3DPassPlan(
                shift=(sx, sy), accept=np.zeros((nty, ntx), bool),
                luts=np.zeros((g, 64, 3), np.uint8),
                colors=np.zeros((g, 6), np.int32),
                indices=np.zeros((g, th * tw), np.uint8),
                wmask=np.zeros((g, th * tw), bool))
        t3a.append(p.accept); t3l.append(p.luts); t3c.append(p.colors)
        t3i.append(p.indices); t3w.append(p.wmask)

    args = (tuple(accepts), tuple(corners),
            tuple(t3a), tuple(t3l), tuple(t3c), tuple(t3i), tuple(t3w),
            plan.d1.params, plan.d1.indices, plan.d1.wmask)
    return GRAD_SHIFTS, args


def decode(stream: bytes, lut) -> np.ndarray:
    """Full decode through the device path (host plan + TPU pixels)."""
    from yaik_tpu.utils import profiler
    if isinstance(lut, (bytes, bytearray)):
        expanded = lutmod.expand_lut(lutmod.parse_lut_file(bytes(lut)))
    else:
        expanded = lut.expanded
    with profiler.stage("decode:plan"):
        plan = plannermod.build_plan(stream, expanded)
    with profiler.stage("decode:pack-args"):
        shifts, args = plan_to_device_args(plan)
    with profiler.stage("decode:device"):
        out = decode_pixels(shifts, *args)
        rgb = np.asarray(out)[: plan.height, : plan.width]
    if plan.has_alpha:
        return np.concatenate([rgb, plan.alpha[:, :, None]], axis=2)
    return rgb
