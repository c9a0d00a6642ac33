"""TPU decode engine: dense, gather-free pixel kernels.

Consumes the dense per-tile tensors from yaik_tpu.decoder.planner and runs
all pixel math on device with TPU-friendly primitives only:

  - gradient passes: exact YAIK_Gradient.cpp bilinears as constant MXU
    matmuls (By @ cg @ Bx, bf16-exact operands), masked by accept grids
  - 3D-LUT tiles: a fused Pallas kernel (entry select-tree + min/diff
    color apply + write bit, per-image LUT dictionary expanded in-kernel
    by one-hot MXU matmuls); XLA one-hot matvec fallback on CPU
  - 1D residual: tile-space values, one relayout, bitwise masked blend
  - image assembly: reshapes of full tile grids (no scatter)

Layout: all pixel state lives in ONE channel-packed u32 word per pixel
(r | g<<8 | b<<16, alpha joining bits 24-31 at the end) - [h, w] with the
full image width on the 128 lanes. Unlike [h, w, 3] (3-wide minor wastes
the lanes 42x) and unlike the earlier planar [3, h, w] u8 select-carry
(every pass output was re-read 3x through the channel broadcast), each
pass applies as a single bitwise masked blend
    plane ^= (plane ^ vals) & mask32
where mask32 carries 0xFF per written channel byte - plane-subset writes
(GTIL plane != 7, 2DTL pairs, per-channel 1D residuals) are just masks.
The reference keeps swizzled PLANAR buffers instead (YAIK.h:205-224).

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
# merged Tile3D: all 6 size passes re-blocked onto the uniform 4x4 grid as
# <= 2 priority layers (see t3_merge_plan) - each layer decodes as one
# (2, 2) pass, so the whole T3 stage costs 2 kernel dispatches + 2
# tile->image relayouts instead of 6 (measured 7.2 ms -> ~2.4 ms of
# lut3d kernels per 64-image step at 512^2)
MERGED_T3_SHIFTS = ((2, 2), (2, 2))

# Pallas path for the 3D-LUT resolve (identical output, verified
# on-chip; see BASELINE.md round-2 decode history for each measured
# step: select-tree default-on at 280 MPix/s, fused color apply 289,
# bit-24 write mask 402, in-kernel LUT dictionary 582). The gate below
# falls back to the XLA one-hot form on non-TPU backends (CPU tests)
# and under YAIK_USE_PALLAS=0.
USE_PALLAS = os.environ.get("YAIK_USE_PALLAS", "1") == "1"
USE_GRAD_MERGED = os.environ.get("YAIK_GRAD_MERGED", "1") == "1"


def _grad_merge_available(w, h=None):
    """Merged-gradient Pallas packing: TPU only (CPU tests keep the XLA
    blends), w <= 1024 (wider images put the [7, 256, W] bxc constant
    past a comfortable VMEM budget; 4K decodes band H, not W), and
    h % 16 == 0 when given (the per-pass y-repeat needs a row block
    >= the largest tile height)."""
    return (USE_PALLAS and USE_GRAD_MERGED and w <= 1024
            and (h is None or h % 16 == 0)
            and jax.devices()[0].platform == "tpu")


def _blend_mats(nty, ntx, qh, qw, sx, sy):
    """Constant blend matrices for one gradient pass: vals = (By @ cg @ Bx)
    >> (sy+sx) reproduces the exact YAIK_Gradient.cpp bilinear. By[y, :]
    carries (th-ry) at the tile's top corner row and ry at the bottom
    (corner grid columns are qsy-strided); Bx likewise for x. All entries
    <= 16, so bf16 operands are exact and the MXU accumulates integers in
    f32 without rounding."""
    tw, th = 1 << sx, 1 << sy
    qsy, qsx = th // 4, tw // 4
    H, W = nty * th, ntx * tw
    By = np.zeros((H, qh), np.float32)
    ys = np.arange(H)
    ty, ry = ys // th, ys % th
    By[ys, ty * qsy] += th - ry
    By[ys, ty * qsy + qsy] += ry
    Bx = np.zeros((qw, W), np.float32)
    xs = np.arange(W)
    tx, rx = xs // tw, xs % tw
    Bx[tx * qsx, xs] += tw - rx
    Bx[tx * qsx + qsx, xs] += rx
    return By.astype(jnp.bfloat16), Bx.astype(jnp.bfloat16)


def _blend_values(corners, accept, sx, sy):
    """Bilinear tile fill values for one gradient pass: [3, nty*th, ntx*tw]
    plus the [nty*th, ntx*tw] accept mask (exact YAIK_Gradient.cpp
    fixed-point semantics).

    Computed as TWO constant matmuls per channel (vals = By @ cg @ Bx,
    see _blend_mats): the corner upsampling rides the idle MXU instead of
    jnp.repeat chains, whose broadcast relayout copies measured ~5 ms/step
    across the 7-pass block (512^2 b32). The y-blend result t <= 255*16
    exceeds bf16's 8 integer bits, so the x-matmul runs on an exact hi/lo
    byte split (each half <= 255, recombined *256 in f32: every
    intermediate < 2^24 stays integer-exact). An earlier tile-space 5D
    repeat form was 1.7x slower again (tw in {4,8,16} on the 128 lanes)."""
    tw, th = 1 << sx, 1 << sy
    nty, ntx = accept.shape
    qh, qw = corners.shape[0], corners.shape[1]
    By, Bx = _blend_mats(nty, ntx, qh, qw, sx, sy)
    cg = jnp.moveaxis(corners, -1, 0).astype(jnp.bfloat16)   # [3, qh, qw]
    t = jnp.einsum("yi,cij->cyj", By, cg,
                   preferred_element_type=jnp.float32)
    ti = t.astype(jnp.int32)                                 # <= 4080 exact
    t_hi = (ti >> 8).astype(jnp.bfloat16)                    # <= 15
    t_lo = (ti & 0xFF).astype(jnp.bfloat16)                  # <= 255
    v = (jnp.einsum("cyj,jx->cyx", t_hi, Bx,
                    preferred_element_type=jnp.float32) * 256.0
         + jnp.einsum("cyj,jx->cyx", t_lo, Bx,
                      preferred_element_type=jnp.float32))
    shift = (th.bit_length() - 1) + (tw.bit_length() - 1)
    vals = v.astype(jnp.int32) >> shift
    mask = jnp.repeat(jnp.repeat(accept, th, axis=0), tw, axis=1)
    return vals, mask


def _mask_blend(plane, vp, m32, H, W):
    """Bitwise masked blend of the packed-u32 plane: copy exactly the bits
    selected by m32 from vp (out = plane ^ ((plane ^ vp) & m32)). One u32
    read of the pass values per pixel - the old [3, H, W] u8 select-carry
    re-read every pass output 3x through the channel broadcast (the
    terminal select fusion alone measured ~8 ms/step at 512^2 b32)."""
    if (H, W) == plane.shape:
        return plane ^ ((plane ^ vp) & m32)
    region = plane[:H, :W]
    return plane.at[:H, :W].set(region ^ ((region ^ vp) & m32))


def _blend_pass(plane, accept, corners, sx, sy, chmask=0xFFFFFF):
    """One gradient pass: fill accepted tiles with the exact bilinear.
    The blend is a convex combination of u8 corners (weights sum to th*tw,
    then >>shift) so each channel is provably 0..255; channels pack into
    the u32 plane word and chmask restricts the write to the pass's plane
    subset (the GTIL plane != 7 variants)."""
    tw, th = 1 << sx, 1 << sy
    nty, ntx = accept.shape
    if nty == 0 or ntx == 0:
        return plane
    vals, mask = _blend_values(corners, accept, sx, sy)
    vp = (vals[0] | (vals[1] << 8) | (vals[2] << 16)).astype(jnp.uint32)
    m32 = mask.astype(jnp.uint32) * chmask
    return _mask_blend(plane, vp, m32, nty * th, ntx * tw)


_GRAD_CONST_CACHE: dict = {}


def _grad_layout(H, W):
    """SHARED merged-gradient layout (the one place the geometry lives -
    _grad_consts, both corner packers, and the kernel's stride rule in
    pallas_kernels._grad_strides must agree byte-for-byte): returns
    (BR, nb, CW, strides, RT). BR = largest row block in (128..16)
    dividing H; CW = corner-grid column width in lanes (W=1024 needs
    W/4 + 1 = 257 columns -> 384; the first 256-wide layout overflowed
    there - caught in review); strides[k] = pass k's per-block sublane
    stride (== nr for contiguous+over-read when nr % 8 == 0, else the
    8-aligned duplicated stride); RT = total corner rows."""
    from yaik_tpu.ops.pallas_kernels import _grad_strides
    BR = next(b for b in (128, 64, 32, 16) if H % b == 0)
    nb = H // BR
    CW = max(256, -(-(W // 4 + 1) // 128) * 128)
    strides = _grad_strides(GRAD_SHIFTS, BR)
    rows_tot = []
    for (sx, sy), st in zip(GRAD_SHIFTS, strides):
        nr = BR // (1 << sy)
        rows_tot.append(nb * nr + 8 if st == nr else nb * st)
    RT = -(-max(rows_tot) // 8) * 8
    return BR, nb, CW, strides, RT


def _grad_consts(H, W):
    """Constants for the merged gradient kernel, cached per image size
    and embedded as jit constants: bxc [7, CW, W] bf16 COMPACT x-interp
    matrices (row t = tile column t: weight tw-rx at t, rx at t+1),
    wy [7, BR, 2] f32 per-row y-weights (th-ry, ry), and r4y/r4x to
    expand the [H/4, W/4] winner-code grid to pixels
    (_grad_merge_available gates on H % 16 == 0: the per-pass y-repeat
    needs BR >= th)."""
    key = (H, W)
    hit = _GRAD_CONST_CACHE.get(key)
    if hit is not None:
        return hit
    BR, nb, CW, strides, RT = _grad_layout(H, W)
    bxc = np.zeros((7, CW, W), np.float32)
    wy = np.zeros((7, BR, 2), np.float32)
    for k, (sx, sy) in enumerate(GRAD_SHIFTS):
        tw, th = 1 << sx, 1 << sy
        nty, ntx = H // th, W // tw
        if nty == 0 or ntx == 0:
            continue
        xs = np.arange(ntx * tw)
        tx, rx = xs // tw, xs % tw
        np.add.at(bxc[k], (tx, xs), tw - rx)
        np.add.at(bxc[k], (tx + 1, xs), rx)
        ys = np.arange(BR)
        wy[k, :, 0] = th - (ys % th)
        wy[k, :, 1] = ys % th
    r4y = np.zeros((BR, BR // 4), np.float32)
    r4y[np.arange(BR), np.arange(BR) // 4] = 1
    r4x = np.zeros((W // 4, W), np.float32)
    r4x[np.arange(W) // 4, np.arange(W)] = 1
    # cache NUMPY arrays only: a jnp array created while tracing is a
    # tracer, and caching it leaks it into later jits (UnexpectedTracer
    # on the second same-shape executable - caught by the bench's
    # half-length elision run)
    out = (wy, bxc.astype(jnp.bfloat16),
           r4y.astype(jnp.bfloat16), r4x.astype(jnp.bfloat16))
    _GRAD_CONST_CACHE[key] = out
    return out


def _pack_grad_corners_host(corners7, H, W):
    """PLAN-TIME pack of the [7, qh, qw, 3] u8 per-pass corner grids into
    the merged kernel's COMPACT [7, 136, 256] i32 layout: pass k's plane
    holds its own (nty+1, ntx+1) corner grid with NO stride (row t =
    tile row t) - the kernel then x-interps only the <= BR/th + 1 rows
    each block needs instead of the whole shared 4-px-granular grid (see
    pallas_kernels._grad_kernel). The strided extraction is exact: the
    shared grid's row t*qsy / col t*qsx IS pass k's corner, and the edge
    row/col are reachable since qsy | H/4. Packing on the host removes
    the per-step concat + u8->i32 convert (~1 ms/step HLO-measured at
    512^2 b128) at the cost of ~0.6 MB/img more upload on the
    tunnel-bound e2e lanes."""
    c = corners7.astype(np.uint32)
    pk = c[..., 0] | (c[..., 1] << 8) | (c[..., 2] << 16)   # [7, qh, qw]
    BR, nb, CW, strides, RT = _grad_layout(H, W)
    corn = np.zeros((7, RT, CW), np.uint32)
    for k, (sx, sy) in enumerate(GRAD_SHIFTS):
        qsy, qsx = (1 << sy) // 4, (1 << sx) // 4
        g = pk[k, ::qsy, ::qsx]              # [nty+1, ntx+1] incl. edges
        nr = BR // (1 << sy)
        if strides[k] == nr:                 # contiguous + over-read tail
            corn[k, : g.shape[0], : g.shape[1]] = g
            continue
        nr8 = strides[k]
        for i in range(nb):
            rows = g[i * nr: i * nr + nr + 1]
            corn[k, i * nr8: i * nr8 + rows.shape[0], : g.shape[1]] = rows
    return corn.view(np.int32)


def _pack_grad_corners_device(corners7, H, W):
    """In-graph twin of _pack_grad_corners_host for the LIGHT-UPLOAD arg
    form (planar u8 [7, 3, qh, qw], ~0.35 MB/img vs ~1 MB packed): the
    tunnel-bound e2e lanes upload the small form and pay ~1 ms/step of
    device packing; the resident chain lanes ship the packed form and
    pay zero (plan_to_device_args resident=...)."""
    c = corners7.astype(jnp.int32)
    pk = c[:, 0] | (c[:, 1] << 8) | (c[:, 2] << 16)         # [7, qh, qw]
    BR, nb, CW, strides, RT = _grad_layout(H, W)
    planes = []
    for k, (sx, sy) in enumerate(GRAD_SHIFTS):
        qsy, qsx = (1 << sy) // 4, (1 << sx) // 4
        g = pk[k, ::qsy, ::qsx]
        nr = BR // (1 << sy)
        if strides[k] == nr:                 # contiguous + over-read tail
            gk = jnp.pad(g, ((0, RT - g.shape[0]),
                             (0, CW - g.shape[1])))
        else:
            nr8 = strides[k]
            blocks = [jnp.pad(g[i * nr: i * nr + nr + 1],
                              ((0, nr8 - (nr + 1)), (0, 0)))
                      for i in range(nb)]
            gk = jnp.pad(jnp.concatenate(blocks, axis=0),
                         ((0, RT - nb * nr8), (0, CW - g.shape[1])))
        planes.append(gk[None])
    return jnp.concatenate(planes, axis=0)                  # [7, RT, CW]


def _grad_merged_pass(plane, corn, code4, interpret=False):
    """All full-plane gradient passes as ONE Pallas dispatch (see
    pallas_kernels.grad_plane). corn [7, 136, 256] i32 PLAN-TIME compact
    packed per-pass corner grids (_pack_grad_corners_host), code4
    [H/4, W/4] u8 per-4x4-block winner (0 = none). The legacy 7x
    _blend_pass chain wrote a ~200 MB f32 + 64 MB u32 plane per pass per
    64-image step; this reads the packed corners and writes the one
    [H, W] u32 result. interpret=True runs the kernel in Pallas
    interpret mode so the CPU test tier can validate this packing
    (tests/test_round3_fastpaths.py)."""
    from yaik_tpu.ops.pallas_kernels import grad_plane
    H, W = plane.shape
    wy, bxc, r4y, r4x = _grad_consts(H, W)
    if corn.ndim == 4:          # light-upload planar u8 form
        corn = _pack_grad_corners_device(corn, H, W)
    V = grad_plane(corn.astype(jnp.int32), code4.astype(jnp.int32), wy,
                   bxc, r4y, r4x, shifts=GRAD_SHIFTS, interpret=interpret
                   ).astype(jnp.uint32)
    m32 = ((V >> 24) & 1) * 0xFFFFFF
    return plane ^ ((plane ^ V) & m32)


def _grad_merged_final(corn, code4, vc, mc, interpret=False):
    """Merged gradient pass + final composition in ONE dispatch: the
    gradient result blends over the constant 0x808080 background in the
    kernel epilogue and the composed T3+1D values (vc) apply under their
    per-channel mask (mc). Returns the FINAL u32 plane; replaces the
    gradient blend AND the last full-plane RMW of the compose path
    (decode_core). Standard streams only (no UCOL/SMAP overlay - the
    overlay pre-initializes the background, which this kernel hardcodes)."""
    from yaik_tpu.ops.pallas_kernels import grad_plane_final
    H, W = vc.shape
    wy, bxc, r4y, r4x = _grad_consts(H, W)
    if corn.ndim == 4:          # light-upload planar u8 form
        corn = _pack_grad_corners_device(corn, H, W)
    return grad_plane_final(corn.astype(jnp.int32),
                            code4.astype(jnp.int32), wy, bxc, r4y,
                            r4x, vc.astype(jnp.int32), mc.astype(jnp.int32),
                            shifts=GRAD_SHIFTS,
                            interpret=interpret).astype(jnp.uint32)


def _tile_to_image(vals, nty, ntx, th, tw):
    """[..., nty*ntx, th*tw] tile-major -> [..., nty*th, ntx*tw] image."""
    lead = vals.shape[:-2]
    v = vals.reshape(lead + (nty, ntx, th, tw))
    perm = tuple(range(len(lead))) + tuple(
        len(lead) + i for i in (0, 2, 1, 3))
    return v.transpose(perm).reshape(lead + (nty * th, ntx * tw))


def _tile3d_pass(plane, lut_tab, accept, rows, colors, packed, sx, sy,
                 dict_rows=None):
    """One 3D-LUT size pass over the full grid, channel-PACKED resolve.

    The global table carries all 3 channels packed into one i32 per entry
    (c0 | c1<<8 | c2<<16; entries are <= 128 so fields never interact and
    the packed value < 2^24 stays f32-exact). One one-hot matvec per pixel
    instead of a 3-lane batched matmul - measured 2x on the full t3 block
    (46 -> 23 ms/step at 512^2 batch 32): the N=3 output starved the MXU.

    Uploads stay thin: the packed table [C,64] travels once per bank, each
    tile carries its table ROW (from its type word), and index+mask pack
    into one byte per pixel. With dict_rows (the plan-time distinct-row
    dictionary, padded to 256), `rows` carries DICTIONARY indices instead
    of table rows.

    The Pallas kernel emits the FINAL per-pixel channels packed in one
    i32 with the write mask (wmask & accept) in bit 24, so the pass needs
    exactly ONE tile->image relayout and the unpack fuses into the
    bitwise blend. (The round-2 bit-24 variant lost 207 -> 150 MPix/s,
    but it still upsampled min/diff image-space and relayouted u8+pred
    besides. A column gather from the pre-transposed table measured 388
    vs 402: XLA's row gather wins even counting the .T relayout.)"""
    tw, th = 1 << sx, 1 << sy
    nty, ntx = accept.shape
    g, npx = packed.shape
    colors = colors.astype(jnp.int32)
    if USE_PALLAS and jax.devices()[0].platform == "tpu":
        acc = accept.reshape(g, 1).astype(jnp.int32)
        # transpose the packed bytes while still u8 (4x fewer bytes moved)
        packedT = packed.T.astype(jnp.int32)
        if dict_rows is not None:
            # dictionary resolve: the per-pass distinct LUT rows (<= 256)
            # expand to per-tile columns inside the kernel via one-hot MXU
            # matmuls - the dense [g, 64] i32 lut_tab[rows] gather
            # (~3.3 ms/step at 512^2 b32) never materializes
            from yaik_tpu.ops.pallas_kernels import lut3d_vals_dict
            ls = lut_tab[dict_rows]                           # [U, 64] i32
            tab3 = jnp.concatenate(
                [(ls & 0xFF).T, ((ls >> 8) & 0xFF).T, (ls >> 16).T],
                axis=0).astype(jnp.bfloat16)                  # [192, U]
            cols8 = jnp.concatenate(
                [colors, acc, rows.reshape(g, 1)], axis=1)
            Vp = lut3d_vals_dict(packedT, tab3, cols8.T).T
        else:
            from yaik_tpu.ops.pallas_kernels import lut3d_vals
            luts_pkT = lut_tab[rows].T                        # [64, g]
            cols7 = jnp.concatenate([colors, acc], axis=1)
            Vp = lut3d_vals(packedT, luts_pkT, cols7.T).T
    else:
        true_rows = rows if dict_rows is None else dict_rows[rows]
        luts_pk = lut_tab[true_rows]         # [g, 64] i32 row gather, exact
        indices = (packed & 63).astype(jnp.int32)
        onehot = (indices[:, :, None] == jnp.arange(64, dtype=indices.dtype)
                  [None, None, :]).astype(jnp.float32)
        Lp = jnp.einsum("gpk,gk->gp", onehot, luts_pk.astype(jnp.float32),
                        preferred_element_type=jnp.float32).astype(jnp.int32)
        L = jnp.stack([Lp & 0xFF, (Lp >> 8) & 0xFF, Lp >> 16], axis=0)
        mn = colors.T[0:3, :, None]                           # [3, g, 1]
        diff = colors.T[3:6, :, None] - mn
        vals = (mn + ((diff * L) >> 7)) & 0xFF                # [3, g, npx]
        write = (packed >> 6).astype(jnp.int32) * \
            accept.reshape(g, 1).astype(jnp.int32)
        Vp = vals[0] | (vals[1] << 8) | (vals[2] << 16) | (write << 24)
    V = _tile_to_image(Vp, nty, ntx, th, tw).astype(jnp.uint32)  # [H, W]
    m32 = (V >> 24) * 0xFFFFFF           # write bit -> all-channel mask
    return _mask_blend(plane, V, m32, nty * th, ntx * tw)


USE_T3_FUSED = os.environ.get("YAIK_T3_FUSED", "1") == "1"
# 1D-residual compose INSIDE the fused T3 kernel - MEASURED NEGATIVE
# (round 5, default off): the per-(pixel, channel) epilogue runs as
# [1, LB] column ops and bloats the kernel 5.2 -> 10.2 ms/step at 512^2
# b128, more than the ~3.5 ms of XLA relayout/blend it replaces. The
# XLA-tail form instead rides the d1 write bits in bits 24-26 of the
# value word (ONE shared relayout - see _d1_vals). Kept for A/B.
USE_T3_D1_KERNEL = os.environ.get("YAIK_T3_D1", "0") == "1"
# Fold the final composition (gradient blend over background + composed
# T3+1D apply) into the merged gradient kernel's epilogue. MEASURED
# NEGATIVE (round 4, default off): 1479 vs 1515 MPix/s at b128 - XLA
# already fuses the compose+blend chain into one fusion WITHOUT
# materializing V/m, while the kernel epilogue forces both to materialize
# in HBM as pallas_call inputs (+2.1 MB/img). Kept for A/B and because
# the interpret test pins the per-channel blend semantics.
USE_GRAD_FINAL = os.environ.get("YAIK_GRAD_FINAL", "0") == "1"


def _pack_d1_blocks(plan: "plannermod.DecodePlan"):
    """Plan-time 4x4-block-space packing of the 1D residual pass
    (host numpy): returns (prm [5, G4] i32, codes4 [12, G4] i32,
    wm2 [2, G4] i32) - the fused kernel's operand form (see _d1_vals for
    the field layout). Block (ty4, tx4) maps to 8x8 tile
    (ty4>>1, tx4>>1), quadrant (ty4&1, tx4&1)."""
    h, w = plan.height, plan.width
    nty8, ntx8 = h // 8, w // 8
    nty4, ntx4 = h // 4, w // 4
    G4 = nty4 * ntx4

    def to_blocks(a):             # [3, g8, 64] -> [3, G4, 16]
        b = a.reshape(3, nty8, ntx8, 2, 4, 2, 4)
        return np.ascontiguousarray(
            b.transpose(0, 1, 3, 2, 5, 4, 6)).reshape(3, G4, 16)

    # byte packs are zero-copy u32 views of the contiguous block layout
    # (little-endian: byte j of lane l = pixel 4l+j) and the bit pack is
    # np.packbits - the arithmetic forms measured ~12 ms per 512^2 image
    # of host time on every plan-pack
    cb = to_blocks(plan.d1.indices)                        # [3, G4, 16] u8
    codes4 = np.ascontiguousarray(
        cb.view(np.uint32).transpose(0, 2, 1)).reshape(12, G4).view(
        np.int32)
    wmb = to_blocks(plan.d1.wmask.astype(np.uint8))
    w16 = np.packbits(wmb, axis=-1, bitorder="little")     # [3, G4, 2] u8
    wbits_c = w16.view("<u2")[:, :, 0].astype(np.uint32)   # [3, G4]
    wm2 = np.ascontiguousarray(np.stack(
        [wbits_c[0] | (wbits_c[1] << 16), wbits_c[2]])).view(np.int32)

    pr = plan.d1.params.astype(np.uint32)                  # [3, g8, 3]
    pb = pr.reshape(3, nty8, ntx8, 3)
    pb = np.repeat(np.repeat(pb, 2, axis=1), 2, axis=2).reshape(3, G4, 3)
    prm = np.ascontiguousarray(np.stack([
        pb[0, :, 0] | (pb[1, :, 0] << 8) | (pb[2, :, 0] << 16),
        pb[0, :, 1] | (pb[1, :, 1] << 8) | (pb[2, :, 1] << 16),
        pb[0, :, 2], pb[1, :, 2], pb[2, :, 2]],
        axis=0)).view(np.int32)
    return prm, codes4, wm2


def _pack_merged_layer(accept, rows, colors, packed):
    """Plan-time byte-pack of one merged-T3 layer into the fused kernel's
    operand form: idx4 [4, G4] i32 (4 raw idx|wmask<<6 bytes per lane,
    little-endian) and cols2 [2, G4] i32 (mn0|mn1<<8|mn2<<16|acc<<24,
    mx0|mx1<<8|mx2<<16|dictrow<<24). numpy, host-side."""
    g = packed.shape[0]
    idx4 = np.ascontiguousarray(
        np.ascontiguousarray(packed).view(np.uint32).T).view(np.int32)
    c = colors.astype(np.uint32)
    acc = accept.reshape(g).astype(np.uint32)
    r0 = c[:, 0] | (c[:, 1] << 8) | (c[:, 2] << 16) | (acc << 24)
    r1 = (c[:, 3] | (c[:, 4] << 8) | (c[:, 5] << 16)
          | (rows.astype(np.uint32) << 24))
    cols2 = np.ascontiguousarray(np.stack([r0, r1])).view(np.int32)
    return idx4, cols2


def _unpack_merged_layer(packed4, cols2):
    """In-graph inverse of _pack_merged_layer for the legacy/CPU fallback
    paths: (rows [g] dict indices, colors [g, 6] i32, packed [g, 16]
    i32 raw bytes)."""
    p = packed4.astype(jnp.int32)                        # [4, g]
    bytes16 = [((p[j] >> (8 * b)) & 0xFF) for j in range(4)
               for b in range(4)]
    packed = jnp.stack(bytes16, axis=1)                  # [g, 16]
    c2 = cols2.astype(jnp.int32)
    cols = jnp.stack([(c2[0] >> (8 * b)) & 0xFF for b in range(3)]
                     + [(c2[1] >> (8 * b)) & 0xFF for b in range(3)],
                     axis=1)                             # [g, 6]
    rows = (c2[1] >> 24) & 0xFF
    return rows, cols, packed


def _tile3d_merged2_pass(plane, lut_tab, accepts, rows, colors, packeds,
                         dict_rows, interpret=False, d1=None):
    """Both merged-T3 priority layers in ONE Pallas dispatch + ONE
    tile->image relayout + ONE plane blend (the per-layer relayout copy
    and blend RMW were the decode roofline's #2/#3 terms). Requires the
    shared union dictionary both layers carry (dict mode); callers fall
    back to two _tile3d_pass calls otherwise. colors/packeds are the
    PLAN-TIME packed operands (cols2/idx4, _pack_merged_layer); `rows`
    is unused (dict indices ride cols2) and kept for arity."""
    nty, ntx = accepts[0].shape
    g = nty * ntx
    from yaik_tpu.ops.pallas_kernels import lut3d_vals_dict2p
    ls = lut_tab[dict_rows]                              # [U, 64] i32
    # entry-1 encoding: the kernel's dictionary matmul runs on the int8
    # MXU path (entries 0..128 -> -1..127 fits s8, the one-hot adds the
    # 1 back; exact i32 accumulation)
    tab3 = (jnp.concatenate(
        [(ls & 0xFF).T, ((ls >> 8) & 0xFF).T, (ls >> 16).T],
        axis=0) - 1).astype(jnp.int8)                    # [192, U]

    # colors/packeds already carry the PLAN-TIME byte-packed kernel
    # operands (idx4 [4, g] i32: 4 raw bytes per lane; cols2 [2, g] i32:
    # the 8 per-tile columns in 2 lanes - see _pack_merged_layer). The
    # kernel's materialized inputs shrink 4x vs the i32-per-byte form
    # (the decode roofline's #1 term), and packing on the host removes
    # the per-step transpose/reshape copies a device-side pack measured
    # (~1.6 ms/step of arg-layout and reshape copies at 512^2 b128).
    if d1 is not None:
        # fused 1D-residual compose: the kernel epilogue applies the d1
        # values per channel and returns per-channel write flags in bits
        # 24-26, so the d1 stage's separate relayout + mask expansion +
        # blend chain (~3 ms/step HLO-measured at 512^2 b128) vanishes
        from yaik_tpu.ops.pallas_kernels import lut3d_vals_dict2p_d1
        codes4, prm, wm2 = d1
        Vp = lut3d_vals_dict2p_d1(packeds[0], packeds[1], tab3,
                                  colors[0], colors[1], codes4, prm, wm2,
                                  interpret=interpret).T       # [g, 16]
        V = _tile_to_image(Vp, nty, ntx, 4, 4).astype(jnp.uint32)
        m32 = (((V >> 24) & 1) * 0xFF | ((V >> 25) & 1) * 0xFF00
               | ((V >> 26) & 1) * 0xFF0000)
        return V, m32        # caller blends once over the gradient plane
    VpT = lut3d_vals_dict2p(packeds[0], packeds[1], tab3, colors[0],
                            colors[1], interpret=interpret)    # [16, g]
    V = _tile_to_image(VpT.T, nty, ntx, 4, 4).astype(jnp.uint32)
    m32 = (V >> 24) * 0xFFFFFF
    if plane is None:
        return V, m32        # fused-compose caller blends once with d1
    return _mask_blend(plane, V, m32, nty * 4, ntx * 4)


_T2_ORDER = tuple((mode, shift) for mode in (0, 1, 2)
                  for shift in ((3, 3), (2, 2)))
_T2_PLANES = {0: (0, 1), 1: (1, 2), 2: (0, 2)}


def _t2_operands(lut2_tab, accept, rows, colors, mode):
    """Per-pass fused-kernel operands for one 2DTL pass: ride the
    3-channel lut3d_vals kernel with the unused channel slot zeroed.
    The packed table is pre-shifted so the two value bytes land directly
    at planes pa/pb, and a zero min/diff makes the third byte 0 (masked
    off by m32 anyway). Returns (tab [g, 64], cols [g, 7])."""
    g = rows.shape[0]
    colors = colors.astype(jnp.int32)
    luts_pk = lut2_tab[rows]                  # [g, 64] i32 (c0 | c1<<8)
    z = jnp.zeros((g, 1), jnp.int32)
    c = [colors[:, i: i + 1] for i in range(4)]
    if mode == 0:       # RG: bytes 0, 1
        tab = luts_pk
        cols7 = [c[0], c[1], z, c[2], c[3], z]
    elif mode == 1:     # GB: bytes 1, 2
        tab = luts_pk << 8
        cols7 = [z, c[0], c[1], z, c[2], c[3]]
    else:               # RB: bytes 0, 2
        tab = (luts_pk & 0xFF) | ((luts_pk >> 8) << 16)
        cols7 = [c[0], z, c[1], c[2], z, c[3]]
    acc = accept.reshape(g, 1).astype(jnp.int32)
    cols = jnp.concatenate(cols7 + [acc], axis=1)            # [g, 7]
    return tab, cols


# per-mode 3-bit written-channel mask (planes pa, pb of _T2_PLANES)
_T2_CHMASK = {0: 0b011, 1: 0b110, 2: 0b101}


def _tile2d_merged_pass(plane, tab3, layers, _interpret=False):
    """The merged-2DTL decode: <= 2 priority layers on the uniform 4x4
    grid (t2_merge_plan), each ONE fused-kernel dispatch + ONE
    tile->image relayout + ONE masked blend - vs six of each on the
    legacy per-(mode, size) path. tab3 is the mode-shifted TRIPLED 2D
    table (lut2d_device_table3): row mode*C + r carries row r's entries
    pre-shifted to the mode's plane bytes, so no per-block table fixup
    runs on device. The per-block written-channel mask rides the kernel's
    accept column: w = wbit * chmask lands the 3-bit mask in output bits
    24-26 (exactly the d1 value-word convention), giving a per-block
    plane mask with no extra relayout. Round 5: the t2dl lane's six
    full-grid dispatches were ~7.2 of 13.9 ms/step (B=16 chained)."""
    from yaik_tpu.ops.pallas_kernels import lut3d_vals
    nty4, ntx4 = layers[0][0].shape
    for chm4, rows4, cols6, pk4 in layers:
        g = rows4.shape[0]
        tab = tab3[rows4]                        # [G4, 64] mode-shifted
        cols = jnp.concatenate(
            [cols6.astype(jnp.int32),
             chm4.reshape(g, 1).astype(jnp.int32)], axis=1)   # [G4, 7]
        Vp = lut3d_vals(pk4.T.astype(jnp.int32), tab.T, cols.T,
                        interpret=_interpret).T
        V = _tile_to_image(Vp, nty4, ntx4, 4, 4).astype(jnp.uint32)
        m32 = (((V >> 24) & 1) * 0xFF | ((V >> 25) & 1) * 0xFF00
               | ((V >> 26) & 1) * 0xFF0000)
        plane = _mask_blend(plane, V, m32, nty4 * 4, ntx4 * 4)
    return plane


def _tile2d_merged2_pass(plane, tab3_full, packed_t2, _interpret=False):
    """Both merged-2DTL priority layers in ONE fused-kernel dispatch +
    ONE tile->image relayout + ONE masked blend - the dict-packed form
    of _tile2d_merged_pass, riding the same int8-MXU dictionary kernel
    as merged T3 (lut3d_vals_dict2p with chan=True: the accept fields
    carry each block's 3-bit written-channel mask and the in-kernel
    layer compose acts per channel, so overlapping layers stay exact).
    packed_t2 = (dict [256] i32 rows into the tripled table,
    (chm4, idx4, cols2) x 2 layers) from plan_to_device_args."""
    d, (chm4a, idx4a, cols2a), (chm4b, idx4b, cols2b) = packed_t2
    nty4, ntx4 = chm4a.shape
    from yaik_tpu.ops.pallas_kernels import lut3d_vals_dict2p
    ls = tab3_full[d]                        # [U, 64] i32 mode-shifted
    tab3 = (jnp.concatenate(
        [(ls & 0xFF).T, ((ls >> 8) & 0xFF).T, (ls >> 16).T],
        axis=0) - 1).astype(jnp.int8)        # [192, U] entry-1 (s8 MXU)
    VpT = lut3d_vals_dict2p(idx4a, idx4b, tab3, cols2a, cols2b,
                            interpret=_interpret, chan=True)
    V = _tile_to_image(VpT.T, nty4, ntx4, 4, 4).astype(jnp.uint32)
    m32 = (((V >> 24) & 1) * 0xFF | ((V >> 25) & 1) * 0xFF00
           | ((V >> 26) & 1) * 0xFF0000)
    return _mask_blend(plane, V, m32, nty4 * 4, ntx4 * 4)


def _tile2d_pass(plane, lut2_tab, accept, rows, colors, packed, mode, sx, sy,
                 _interpret=False):
    """One 2DTL size pass: like _tile3d_pass but two channels
    (min + (diff * L) >> 7 on the pair planes; Tile2D_* semantics)."""
    pa, pb = _T2_PLANES[mode]
    tw, th = 1 << sx, 1 << sy
    nty, ntx = accept.shape
    g, npx = packed.shape
    colors = colors.astype(jnp.int32)
    if _interpret or (USE_PALLAS and jax.devices()[0].platform == "tpu"):
        from yaik_tpu.ops.pallas_kernels import lut3d_vals
        tab, cols = _t2_operands(lut2_tab, accept, rows, colors, mode)
        Vp = lut3d_vals(packed.T.astype(jnp.int32), tab.T, cols.T,
                        interpret=_interpret).T
    else:
        luts_pk = lut2_tab[rows]              # [g, 64] i32 (c0 | c1<<8)
        indices = (packed & 63).astype(jnp.int32)
        onehot = (indices[:, :, None] == jnp.arange(64, dtype=indices.dtype)
                  [None, None, :]).astype(jnp.float32)
        Lp = jnp.einsum("gpk,gk->gp", onehot, luts_pk.astype(jnp.float32),
                        preferred_element_type=jnp.float32
                        ).astype(jnp.int32)
        L = jnp.stack([Lp & 0xFF, Lp >> 8], axis=0)
        mn = colors.T[0:2, :, None]
        diff = colors.T[2:4, :, None] - mn
        vals = (mn + ((diff * L) >> 7)) & 0xFF                # [2, g, npx]
        write = (packed >> 6).astype(jnp.int32) * \
            accept.reshape(g, 1).astype(jnp.int32)
        Vp = ((vals[0] << (8 * pa)) | (vals[1] << (8 * pb))
              | (write << 24))
    V = _tile_to_image(Vp, nty, ntx, th, tw).astype(jnp.uint32)
    m32 = (V >> 24) * ((0xFF << (8 * pa)) | (0xFF << (8 * pb)))
    return _mask_blend(plane, V, m32, nty * th, ntx * tw)


_PGRAD_PAIRS = (5, 3, 6)      # RB, RG, GB 4x4 emission order
_PGRAD_SINGLES = (1, 2, 4)    # R, G, B


def _blend_pass_masked(plane, accept, corners, mask, sx, sy):
    """_blend_pass writing only the planes in `mask` (static) - the
    plane-variant GTIL chunks (GTIL plane != 7)."""
    ch = sum(0xFF << (8 * p) for p in range(3) if mask & (1 << p))
    return _blend_pass(plane, accept, corners, sx, sy, chmask=ch)


def _d1_vals(prm, codes4, wm2, h8, w8):
    """The 1D residual pass's image-space packed values + per-channel
    write mask (see _d1_pass). Split out so the fused merged-T3 path can
    compose the two stages into ONE plane read-modify-write.

    All operands are 4x4-BLOCK-space, byte/bit-packed at plan time
    (_pack_d1_blocks): prm [5, G4] i32 (color0 packed, base packed,
    delta2 per channel), codes4 [12, G4] i32 (per-channel index bytes, 4
    px per lane), wm2 [2, G4] i32 (per-(channel, pixel) write bits).
    delta2 needs up to 21 bits ((delta*inv_range)>>8, inv_range =
    2^24/range) so it rides its own lane per channel - but the resulting
    8-bit values pack. This layout is the fused kernel's operand form
    (pallas_kernels lut3d_vals_dict2p_d1); the XLA path here serves the
    non-fused streams (UCOL/2DTL/plane-gradient chains, CPU tests)."""
    nty4, ntx4 = h8 // 4, w8 // 4
    vpT = _d1_vals_tile(prm, codes4, wm2)                     # [16, G4]
    v_img = _tile_to_image(vpT.T, nty4, ntx4, 4, 4).astype(jnp.uint32)
    m32 = (((v_img >> 24) & 1) * 0xFF | ((v_img >> 25) & 1) * 0xFF00
           | ((v_img >> 26) & 1) * 0xFF0000)
    return v_img, m32


def _d1_vals_tile(prm, codes4, wm2):
    """The 1D residual values in 4x4-block TILE space [16, G4] i32:
    value bytes + per-channel write bits in bits 24-26. Per-channel
    write bits ride the SAME word as the values, so mask and values
    share one tile->image relayout (a separate mask relayout or
    bit-plane expansion each measured ~0.4-1.1 ms/step at 512^2 b128)."""
    c0 = [(prm[0] >> (8 * c)) & 0xFF for c in range(3)]       # [G4]
    bs = [(prm[1] >> (8 * c)) & 0xFF for c in range(3)]
    d2 = [prm[2 + c] for c in range(3)]
    vrows = []
    for p in range(16):
        vb, wb = [], []
        for c in range(3):
            L = (codes4[4 * c + (p >> 2)] >> (8 * (p & 3))) & 0xFF
            v = jnp.where(L != 0,
                          (bs[c] + (((L - 1) * d2[c]) >> 16)) & 0xFF,
                          c0[c])
            bitpos = c * 16 + p
            vb.append(v)
            wb.append((wm2[bitpos >> 5] >> (bitpos & 31)) & 1)
        vrows.append((vb[0] | (vb[1] << 8) | (vb[2] << 16)
                      | (wb[0] << 24) | (wb[1] << 25)
                      | (wb[2] << 26))[None])
    return jnp.concatenate(vrows, axis=0)                     # [16, G4]


def _d1_pass(plane, prm, codes4, wm2, h8, w8):
    """1D residual for all 3 planes (XLA path; the standard-stream chain
    composes this into the fused T3 kernel instead - decode_core)."""
    v_img, m32 = _d1_vals(prm, codes4, wm2, h8, w8)
    return plane ^ ((plane ^ v_img) & m32)


def salt_d1_color0(prm, s):
    """Bench harness hook: perturb every channel's color0 byte by +s
    (mod 256) in the packed d1 params - the round-2 salted-chain data
    dependence, expressed on the block-space operand form. Works on
    batched stacks [..., 5, G4]."""
    p0 = prm[..., 0:1, :]
    nb = ((((p0 >> 0) & 0xFF) + s) & 0xFF) \
        | (((((p0 >> 8) & 0xFF) + s) & 0xFF) << 8) \
        | (((((p0 >> 16) & 0xFF) + s) & 0xFF) << 16)
    return prm.at[..., 0:1, :].set(nb)


def _unpack6_device(raw, count, inverse):
    """count 6-bit values from a 3-byte-group stream -> u8 (v<<2 | v>>4),
    fully dense (reshape + shifts, no gather). raw must be padded to a
    3-byte multiple covering count values (AlphaPlan guarantees it)."""
    n3 = ((count * 6 + 7) // 8 + 2) // 3
    b = raw[: n3 * 3].reshape(n3, 3).astype(jnp.int32)
    v0 = b[:, 0] & 0x3F
    v1 = (b[:, 0] >> 6) | ((b[:, 1] & 0xF) << 2)
    v2 = (b[:, 1] >> 4) | ((b[:, 2] & 0x3) << 4)
    v3 = b[:, 2] >> 2
    v = jnp.stack([v0, v1, v2, v3], axis=1).reshape(-1)[:count]
    if inverse:
        v = 63 - v
    return ((v << 2) | (v >> 4)).astype(jnp.uint8)


def _mip_mask_device(mip_bits, mspec, h8, w8):
    """MIPM tile bits -> [h8, w8] bool mask (static grid/origin, clipped at
    the image edge like the host decoder)."""
    mw, mh, x0, y0, ts = mspec
    bits = ((mip_bits[:, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
            ).reshape(-1)[: mw * mh] != 0
    sub = jnp.repeat(jnp.repeat(bits.reshape(mh, mw), ts, 0), ts, 1)
    sh = min(mh * ts, h8 - y0)
    sw = min(mw * ts, w8 - x0)
    mask = jnp.zeros((h8, w8), bool)
    return mask.at[y0:y0 + sh, x0:x0 + sw].set(sub[:sh, :sw])


def _alpha_pass(aspec, raw, mip_bits, h8, w8):
    """ALPM decode on device: [h8, w8] u8 alpha. aspec is the STATIC
    (mode, bbox, mip_spec) plan so every mode lowers to dense reshapes and
    one static-position update (sparse adds a cumsum + one gather).
    Byte-identical to decoder/alpha.py (YAIK_Alpha.cpp:25-377 hot loops)."""
    mode, (bx, by, bw, bh), mspec = aspec
    if mode == 0:          # has_alpha but no ALPM chunk: constant 255
        return jnp.full((h8, w8), 255, jnp.uint8)
    if mode == 1:          # 1-bit full
        nbytes = (bw * bh + 7) // 8
        bits = ((raw[:nbytes, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
                ).reshape(-1)[: bw * bh]
        region = (bits * jnp.uint8(255)).reshape(bh, bw)
    elif mode in (4, 5):   # 6-bit full (/inverse)
        region = _unpack6_device(raw, bw * bh, mode == 5).reshape(bh, bw)
    elif mode in (2, 3):   # 6-bit sparse over the mipmap mask (/inverse)
        mask = _mip_mask_device(mip_bits, mspec, h8, w8)
        sel = mask[by:by + bh, bx:bx + bw]
        k = jnp.cumsum(sel.reshape(-1).astype(jnp.int32)) - 1
        vals = _unpack6_device(raw, bw * bh, mode == 3)
        picked = jnp.take(vals, jnp.maximum(k, 0)).reshape(bh, bw)
        region = jnp.where(sel, picked, jnp.uint8(0))
    elif mode == 6:        # 8-bit full
        region = raw[: bw * bh].reshape(bh, bw)
    else:
        raise ValueError(f"unsupported alpha mode {mode}")
    alpha = jnp.zeros((h8, w8), jnp.uint8)
    return alpha.at[by:by + bh, bx:bx + bw].set(region)


def decode_core(shifts, lut_tab, grad_accepts, grad_corners,
                t3_accepts, t3_rows, t3_colors, t3_packed, t3_dicts,
                d1_prm, d1_codes4, d1_wm2,
                ucol=None, t2=None, pgrad_pairs=None, pgrad_singles=None,
                alpha=None, aspec=None):
    """ucol: None or the pre-pass overlay (vals [3,h8,w8] u8 planar, mask
    packbits [h8,w8/8] u8) carrying UCOL + SMAP pixels - applied first, in
    stream order. t2: None or (lut2_tab [C,64,2], 6x (accept, rows, colors,
    packed)) in _T2_ORDER. t3_dicts: per-pass [256] LUT-row dictionary (or
    None for the dense-rows fallback when a pass exceeds 256 distinct
    rows). Returns [h8, w8, 3] u8."""
    # image dims (multiples of 8) from the 4x4 3D pass grid
    nty4, ntx4 = t3_accepts[-1].shape
    h8, w8 = nty4 * 4, ntx4 * 4
    # merged-T3 layout is carried by the pytree structure itself (2 layers
    # instead of 6 size passes) so no extra static argument is needed and
    # jit re-specializes automatically
    t3_shift_list = MERGED_T3_SHIFTS if len(t3_accepts) == 2 else T3_SHIFTS

    plane = jnp.full((h8, w8), 0x808080, jnp.uint32)
    if ucol is not None:
        ov_vals, ov_bits = ucol        # overlay (UCOL + SMAP, stream order)
        m = (((ov_bits[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1)
             .reshape(h8, w8).astype(jnp.uint32))
        vp = (ov_vals[0].astype(jnp.uint32)
              | (ov_vals[1].astype(jnp.uint32) << 8)
              | (ov_vals[2].astype(jnp.uint32) << 16))
        plane = plane ^ ((plane ^ vp) & (m * 0xFFFFFF))
    fused_t3 = (len(t3_accepts) == 2 and t3_dicts[0] is not None
                and t3_dicts[1] is not None and USE_T3_FUSED and USE_PALLAS
                and jax.devices()[0].platform == "tpu")
    # standard streams (no pgrad/t2 between T3 and 1D): compose the fused
    # T3 output with the 1D residual values into ONE plane RMW blend
    compose_d1 = (fused_t3 and pgrad_pairs is None and t2 is None
                  and pgrad_singles is None)
    # ... and when the merged gradient kernel is in play with no overlay,
    # the whole post-plan pipeline is ONE kernel epilogue: gradient blend
    # over the constant background + composed T3+1D apply, no
    # intermediate plane ever touches HBM (round 4; USE_GRAD_FINAL=0
    # forces the split form for A/B)
    fuse_final = (compose_d1 and ucol is None and grad_accepts is None
                  and USE_GRAD_FINAL)
    if grad_accepts is None:
        # merged: (corners7 [7, qh, qw, 3] u8, code4 [h/4, w/4] u8) - one
        # Pallas dispatch for all 7 full-plane passes (TPU packing only)
        if not fuse_final:
            plane = _grad_merged_pass(plane, *grad_corners)
    else:
        for k, (sx, sy) in enumerate(shifts):
            plane = _blend_pass(plane, grad_accepts[k], grad_corners[k],
                                sx, sy)
    if compose_d1:
        if USE_T3_D1_KERNEL:
            V, m = _tile3d_merged2_pass(None, lut_tab, t3_accepts,
                                        t3_rows, t3_colors, t3_packed,
                                        t3_dicts[0],
                                        d1=(d1_codes4, d1_prm, d1_wm2))
        else:
            # image-space compose: TWO tile->image relayouts (T3 and d1)
            # feeding one fused elementwise pass (mask expansions +
            # XOR-blend + plane RMW). A single-relayout TILE-space
            # compose was built and measured NEGATIVE (1746 -> 1504
            # MPix/s chained, b128): the extra materialized tile-space
            # word costs more than the saved relayout because XLA fuses
            # the whole image-space tail into one pass either way.
            V3, m3 = _tile3d_merged2_pass(None, lut_tab, t3_accepts,
                                          t3_rows, t3_colors, t3_packed,
                                          t3_dicts[0])
            V1, m1 = _d1_vals(d1_prm, d1_codes4, d1_wm2, h8, w8)
            V = V3 ^ ((V3 ^ V1) & m1)     # d1 wins where it writes
            m = m3 | m1
        if fuse_final:
            plane = _grad_merged_final(*grad_corners, V, m)
        else:
            plane = plane ^ ((plane ^ V) & m)
    elif fused_t3:
        # both merged layers share one union dictionary (plan_to_device_args
        # builds t3_dicts[0] is t3_dicts[1]) -> fused single-dispatch path
        plane = _tile3d_merged2_pass(plane, lut_tab, t3_accepts, t3_rows,
                                     t3_colors, t3_packed, t3_dicts[0])
    else:
        for k, (sx, sy) in enumerate(t3_shift_list):
            if len(t3_accepts) == 2 and t3_dicts[k] is not None:
                # merged+dict layers carry the plan-time packed operands;
                # the non-fused fallback (CPU tests, YAIK_T3_FUSED=0)
                # unpacks in-graph and reuses the legacy pass
                rws, cols, pk = _unpack_merged_layer(t3_packed[k],
                                                     t3_colors[k])
                plane = _tile3d_pass(plane, lut_tab, t3_accepts[k], rws,
                                     cols, pk, sx, sy,
                                     dict_rows=t3_dicts[k])
            else:
                plane = _tile3d_pass(plane, lut_tab, t3_accepts[k],
                                     t3_rows[k], t3_colors[k],
                                     t3_packed[k], sx, sy,
                                     dict_rows=t3_dicts[k])
    if pgrad_pairs is not None:     # GTIL plane in (5, 3, 6), before 2DTL
        for k, mask in enumerate(_PGRAD_PAIRS):
            plane = _blend_pass_masked(plane, *pgrad_pairs[k], mask, 2, 2)
    if t2 is not None:
        lut2_tab, t2passes = t2
        if not isinstance(t2passes[0], (tuple, list)):
            # dict-packed merged layers: (dict, layerA, layerB)
            plane = _tile2d_merged2_pass(plane, lut2_tab, t2passes)
        elif len(t2passes) <= 2:   # merged layers (t2_merge_plan packing)
            plane = _tile2d_merged_pass(plane, lut2_tab, t2passes)
        else:
            for k, (mode, (sx, sy)) in enumerate(_T2_ORDER):
                plane = _tile2d_pass(plane, lut2_tab, *t2passes[k],
                                     mode, sx, sy)
    if pgrad_singles is not None:   # GTIL plane in (1, 2, 4), after 2DTL
        for k, mask in enumerate(_PGRAD_SINGLES):
            plane = _blend_pass_masked(plane, *pgrad_singles[k], mask, 2, 2)
    if not compose_d1:
        plane = _d1_pass(plane, d1_prm, d1_codes4, d1_wm2, h8, w8)
    # The plane IS the channel-packed u32 word (r | g<<8 | b<<16); the
    # final interleave is just the bitcast to [H, W, 4] u8 - byte-exact
    # little-endian on both TPU and CPU backends. Alpha rides bits 24-31.
    if aspec is not None:
        raw, mip_bits = alpha if alpha is not None else (None, None)
        a = _alpha_pass(aspec, raw, mip_bits, h8, w8)
        plane = plane | (a.astype(jnp.uint32) << 24)
        return jax.lax.bitcast_convert_type(plane, jnp.uint8)
    return jax.lax.bitcast_convert_type(plane, jnp.uint8)[:, :, :3]


decode_pixels = partial(jax.jit,
                        static_argnames=("shifts", "aspec"))(decode_core)
# batched decode lives in yaik_tpu.parallel.batch._batched_decoder (vmap
# over the per-image arg pytree; LUT table and the static alpha spec shared)


_LUT_TAB_CACHE: dict = {}


def lut_device_table(expanded: dict):
    """Global device LUT table: per-bit expanded tables padded to 64 points
    and concatenated, 3 channels PACKED into one i32 per entry
    (c0 | c1<<8 | c2<<16, entries <= 128 so the packed value < 2^24) ->
    ([C, 64] i32, row base per bit). Cached per expanded-dict identity
    (one upload per bank)."""
    key = id(expanded)
    hit = _LUT_TAB_CACHE.get(key)
    if hit is not None:
        return hit[0], hit[1]
    parts, bases, off = [], {}, 0
    for bit in (3, 4, 5, 6):
        t = expanded[bit].astype(np.int32)      # [n_b, 2^bit, 3]
        pad = np.zeros((t.shape[0], 64), np.int32)
        pad[:, : t.shape[1]] = t[:, :, 0] | (t[:, :, 1] << 8) | (
            t[:, :, 2] << 16)
        bases[bit] = off
        off += t.shape[0]
        parts.append(pad)
    tab = jax.device_put(np.concatenate(parts, axis=0))
    # keep a reference to the dict so its id can never be recycled to a
    # different bank while the cache entry lives
    _LUT_TAB_CACHE[key] = (tab, bases, expanded)
    return tab, bases


def lut2d_device_table(expanded2d: dict):
    """2D analog of lut_device_table: [C, 64] i32 (2 channels packed as
    c0 | c1<<8) + per-bit row bases.

    Rows are cut as 128-byte windows of the FLAT per-bit section rather than
    zero-padded blocks: 3-bit tiles legitimately index past their 16-byte
    block into the next pattern's entries (the encoder's 4-bit-map idx3Bit
    bug, EncoderContext.cpp:5642; the reference decoder reads straight
    through its contiguous table memory, YAIK_3DTile.cpp:2255)."""
    key = ("2d", id(expanded2d))
    hit = _LUT_TAB_CACHE.get(key)
    if hit is not None:
        return hit[0], hit[1]
    parts, bases, off = [], {}, 0
    for bit in (3, 4, 5, 6):
        t = expanded2d[bit]                     # [n*8, 2^bit, 2]
        n_rows = t.shape[0]
        flat = np.concatenate([t.reshape(-1).astype(np.uint8),
                               np.zeros(128, np.uint8)])
        row_size = t.shape[1] * 2
        starts = np.arange(n_rows) * row_size
        pad = flat[starts[:, None] + np.arange(128)].reshape(
            n_rows, 64, 2).astype(np.int32)
        bases[bit] = off
        off += n_rows
        parts.append(pad[:, :, 0] | (pad[:, :, 1] << 8))
    tab = jax.device_put(np.concatenate(parts, axis=0))
    _LUT_TAB_CACHE[key] = (tab, bases, expanded2d)
    return tab, bases


def lut2d_device_table3(expanded2d: dict):
    """Mode-shifted TRIPLED 2D table for the merged-2DTL path: [3C, 64]
    i32 where row mode*C + r is lut2d_device_table row r with its two
    value bytes pre-shifted to the mode's written planes (mode 0 RG:
    bytes 0,1; mode 1 GB: bytes 1,2; mode 2 RB: bytes 0,2 - the same
    shifts _t2_operands applies per pass). Encoding the mode into the
    row id removes every per-block table fixup from the device graph.
    Cached per bank like the other device tables."""
    key = ("2d3", id(expanded2d))
    hit = _LUT_TAB_CACHE.get(key)
    if hit is not None:
        return hit[0], hit[1]
    tab, bases = lut2d_device_table(expanded2d)
    t = np.asarray(tab)
    tab3 = jax.device_put(np.concatenate(
        [t, t << 8, (t & 0xFF) | ((t >> 8) << 16)], axis=0))
    _LUT_TAB_CACHE[key] = (tab3, bases, expanded2d)
    return tab3, bases


def _t2_rows_full(p, expanded2d, bases2):
    """Full 2D-table row per tile of one 2DTL pass (type-word decode +
    clamp; mirrors the host planner's table addressing)."""
    t = p.types.astype(np.int64) & 0xFFFF
    bi = (t >> 14) & 3
    n2 = np.array([expanded2d[b].shape[0] for b in (3, 4, 5, 6)])
    b2 = np.array([bases2[b] for b in (3, 4, 5, 6)], np.int64)
    comb = np.minimum(t & 0x3FFF, n2[bi] - 1)
    return (b2[bi] + comb).astype(np.int32)


def t2_merge_plan(plan: plannermod.DecodePlan, expanded2d: dict,
                  max_layers: int = 2):
    """Re-block ALL six 2DTL passes (3 modes x {8x8, 4x4}, _T2_ORDER)
    onto the uniform 4x4 grid - the 2DTL analog of t3_merge_plan.

    Each accepted tile scatters its mode-encoded table row (row' =
    mode*C + row into the lut2d_device_table3 tripled table), its
    mode-arranged 6 color columns, its idx|wbit<<6 bytes, and the mode's
    3-bit written-channel mask onto its covering 4x4 blocks. Blocks
    claimed by tiles of k different passes land on k priority layers in
    _T2_ORDER, so blending layer 0 then 1 reproduces the sequential
    6-pass semantics exactly. Returns a tuple of max_layers layers
    (chm4 [nty4, ntx4] u8 channel mask (0 = not accepted), rows4 [G4]
    i32, cols6 [G4, 6] u8, packed4 [G4, 16] u8), or None when any block
    needs > max_layers (callers fall back to the per-pass path).
    Cached on the plan. Ref: the dead Tile2D_* decoders,
    YAIK_3DTile.cpp (see decoder/reference.py:_tile2d_size_pass)."""
    cached = getattr(plan, "_t2_merge_cache", None)
    if cached is not None and cached[0] is expanded2d:
        return cached[1]
    h, w = plan.height, plan.width
    nty4, ntx4 = h // 4, w // 4
    G4 = nty4 * ntx4
    _, bases2 = lut2d_device_table(expanded2d)
    C = sum(expanded2d[b].shape[0] for b in (3, 4, 5, 6))
    count = np.zeros(G4, np.uint8)
    lay_chm = [np.zeros(G4, np.uint8) for _ in range(max_layers)]
    lay_rows = [np.zeros(G4, np.int32) for _ in range(max_layers)]
    lay_cols = [np.zeros((G4, 6), np.uint8) for _ in range(max_layers)]
    lay_pk = [np.zeros((G4, 16), np.uint8) for _ in range(max_layers)]
    by_key = {(p.mode, p.shift): p for p in plan.tile2d}
    result = None
    ok = True
    for mode, (sx, sy) in _T2_ORDER:
        p = by_key.get((mode, (sx, sy)))
        if p is None:
            continue
        tw, th = 1 << sx, 1 << sy
        nty, ntx = p.accept.shape
        ids = np.flatnonzero(p.accept.reshape(-1))
        if ids.size == 0:
            continue
        nsy, nsx = th // 4, tw // 4
        nsub = nsy * nsx
        ty, tx = ids // ntx, ids % ntx
        by = ty[:, None, None] * nsy + np.arange(nsy)[None, :, None]
        bx = tx[:, None, None] * nsx + np.arange(nsx)[None, None, :]
        g4 = (by * ntx4 + bx).reshape(-1)
        pk = p.packed[ids].reshape(-1, nsy, 4, nsx, 4).transpose(
            0, 1, 3, 2, 4).reshape(-1, 16)
        rows_sub = np.repeat(
            mode * C + _t2_rows_full(p, expanded2d, bases2)[ids], nsub)
        c = p.colors[ids].astype(np.uint8)        # [n, 4] min0 min1 max0 max1
        z = np.zeros(ids.size, np.uint8)
        if mode == 0:       # RG
            cols = np.stack([c[:, 0], c[:, 1], z, c[:, 2], c[:, 3], z], 1)
        elif mode == 1:     # GB
            cols = np.stack([z, c[:, 0], c[:, 1], z, c[:, 2], c[:, 3]], 1)
        else:               # RB
            cols = np.stack([c[:, 0], z, c[:, 1], c[:, 2], z, c[:, 3]], 1)
        cols_sub = np.repeat(cols, nsub, axis=0)
        cur = count[g4]
        if int(cur.max(initial=0)) >= max_layers:
            ok = False
            break
        for L in range(max_layers):
            sel = cur == L
            if not sel.any():
                continue
            t = g4[sel]
            lay_chm[L][t] = _T2_CHMASK[mode]
            lay_rows[L][t] = rows_sub[sel]
            lay_cols[L][t] = cols_sub[sel]
            lay_pk[L][t] = pk[sel]
        count[g4] = cur + 1                # g4 unique within one pass
    if ok:
        result = tuple(
            (lay_chm[L].reshape(nty4, ntx4), lay_rows[L], lay_cols[L],
             lay_pk[L]) for L in range(max_layers))
    try:
        plan._t2_merge_cache = (expanded2d, result)
    except AttributeError:
        pass
    return result


def _t2_pack_dict(m, expanded2d):
    """Plan-time dict-pack of t2_merge_plan layers for the fused kernel:
    (dict [256] i32 tripled-table rows, (chm4, idx4 [4, G4], cols2
    [2, G4]) x 2) - or None when the layers exceed the 256-entry
    dictionary (callers ship the dense-rows gather form instead)."""
    C3 = 3 * sum(expanded2d[b].shape[0] for b in (3, 4, 5, 6))
    uniq, inv = _flag_uniq(np.concatenate([l[1] for l in m]), C3)
    if uniq.size > 256:
        return None
    d = np.zeros(256, np.int32)
    d[: uniq.size] = uniq
    invs = inv.reshape(len(m), -1)
    lay = []
    for L, (chm4, rows4, cols6, pk4) in enumerate(m):
        idx4, cols2 = _pack_merged_layer(chm4, invs[L], cols6, pk4)
        lay.append((chm4, idx4, cols2))
    return (d, lay[0], lay[1])


def t2_dict_ok(plan: plannermod.DecodePlan, expanded2d: dict) -> bool:
    """Can this plan's merged-2DTL layers share one <= 256-entry
    mode-encoded row dictionary (the dict-packed kernel form)? Batch
    callers AND this across images so stacked pytrees stay uniform."""
    m = t2_merge_plan(plan, expanded2d)
    if m is None:
        return False
    C3 = 3 * sum(expanded2d[b].shape[0] for b in (3, 4, 5, 6))
    uniq, _ = _flag_uniq(np.concatenate([l[1] for l in m]), C3)
    return uniq.size <= 256


def _flag_uniq(vals, bound):
    """np.unique(vals, return_inverse=True) without the sort: O(n + bound)
    flag-array remap (vals are small non-negative ints: LUT rows < C,
    type words < 2^16)."""
    flags = np.zeros(bound, bool)
    flags[vals] = True
    uniq = np.flatnonzero(flags)
    remap = np.empty(bound, np.int32)
    remap[uniq] = np.arange(uniq.size, dtype=np.int32)
    return uniq.astype(np.int32), remap[vals]


def t3_dict_modes(plan: plannermod.DecodePlan):
    """Per-T3-pass: can the pass use the <= 256-row LUT dictionary?
    (uniq(rows) <= uniq(types), so the type-word count is a safe bound;
    batch decode ANDs these across images so stacked args stay uniform)."""
    by_shift = {p.shift: p for p in plan.tile3d}
    modes = []
    for shift in T3_SHIFTS:
        p = by_shift.get(shift)
        if p is None:
            modes.append(True)
            continue
        flags = np.zeros(1 << 16, bool)
        flags[p.types] = True
        modes.append(int(flags.sum()) <= 256)
    return tuple(modes)


def _t3_rows_full(p, base_arr, nrows):
    """Full LUT-table row per tile of one T3 pass (same type-word decode +
    clamp as the host planner, YAIK_3DTile.cpp type words)."""
    t = p.types.astype(np.int64) & 0xFFFF
    bi = (t >> 14) & 3
    comb = np.minimum(t & 0x3FFF, nrows[bi] - 1)
    return (base_arr[bi] + comb).astype(np.int32)


def _lut_bases_arrays(expanded):
    _, bases = lut_device_table(expanded)
    base_arr = np.zeros(4, np.int64)
    nrows = np.zeros(4, np.int64)
    for bi, bit in enumerate((3, 4, 5, 6)):
        base_arr[bi] = bases[bit]
        nrows[bi] = expanded[bit].shape[0]
    return base_arr, nrows


def t3_merge_plan(plan: plannermod.DecodePlan, expanded: dict,
                  max_layers: int = 2):
    """Re-block ALL Tile3D size passes onto the uniform 4x4 grid.

    Every T3 tile size is a multiple of 4x4, so each accepted tile scatters
    its LUT row / colors / idx bytes onto its covering 4x4 blocks. Blocks
    covered by tiles from k different passes land on k priority LAYERS in
    stream-pass order, so blending layer 0 then layer 1 reproduces the
    sequential 6-pass semantics exactly (later passes win, per-pixel write
    bits ride bit 6 of the idx byte unchanged). Measured streams need
    <= 2 layers (accepted tiles of different passes rarely share a block
    and their written pixels are disjoint); returns None when a block
    needs more - callers fall back to the legacy per-size path.

    Returns (layers, dict_ok): layers = tuple of (accept4 [nty4, ntx4],
    rows4 [G4] full table rows, colors4 [G4, 6] u8, packed4 [G4, 16] u8);
    dict_ok = the union of distinct rows fits the 256-entry kernel
    dictionary. Cached on the plan (the feasibility probe and the arg
    packer would otherwise both pay it)."""
    cached = getattr(plan, "_t3_merge_cache", None)
    if cached is not None and cached[0] is expanded:
        return cached[1]
    h, w = plan.height, plan.width
    nty4, ntx4 = h // 4, w // 4
    G4 = nty4 * ntx4
    base_arr, nrows = _lut_bases_arrays(expanded)
    count = np.zeros(G4, np.uint8)
    lay_acc = [np.zeros(G4, bool) for _ in range(max_layers)]
    lay_rows = [np.zeros(G4, np.int32) for _ in range(max_layers)]
    lay_cols = [np.zeros((G4, 6), np.uint8) for _ in range(max_layers)]
    lay_pk = [np.zeros((G4, 16), np.uint8) for _ in range(max_layers)]
    by_shift = {p.shift: p for p in plan.tile3d}
    result = None
    ok = True
    for (sx, sy) in T3_SHIFTS:
        p = by_shift.get((sx, sy))
        if p is None:
            continue
        tw, th = 1 << sx, 1 << sy
        nty, ntx = p.accept.shape
        ids = np.flatnonzero(p.accept.reshape(-1))
        if ids.size == 0:
            continue
        nsy, nsx = th // 4, tw // 4
        nsub = nsy * nsx
        ty, tx = ids // ntx, ids % ntx
        by = ty[:, None, None] * nsy + np.arange(nsy)[None, :, None]
        bx = tx[:, None, None] * nsx + np.arange(nsx)[None, None, :]
        g4 = (by * ntx4 + bx).reshape(-1)                 # [n*nsub]
        pk = p.packed[ids].reshape(-1, nsy, 4, nsx, 4).transpose(
            0, 1, 3, 2, 4).reshape(-1, 16)                # g4-ordered
        rows_sub = np.repeat(_t3_rows_full(p, base_arr, nrows)[ids], nsub)
        cols_sub = np.repeat(p.colors[ids].astype(np.uint8), nsub, axis=0)
        cur = count[g4]
        if int(cur.max(initial=0)) >= max_layers:
            ok = False
            break
        for L in range(max_layers):
            sel = cur == L
            if not sel.any():
                continue
            t = g4[sel]
            lay_acc[L][t] = True
            lay_rows[L][t] = rows_sub[sel]
            lay_cols[L][t] = cols_sub[sel]
            lay_pk[L][t] = pk[sel]
        count[g4] = cur + 1                # g4 unique within one pass
    if ok:
        uniq = np.zeros(int(base_arr[3] + nrows[3]), bool)
        for r in lay_rows:
            uniq[r] = True
        dict_ok = int(uniq.sum()) <= 256
        layers = tuple(
            (lay_acc[L].reshape(nty4, ntx4), lay_rows[L], lay_cols[L],
             lay_pk[L]) for L in range(max_layers))
        result = (layers, dict_ok)
    try:
        plan._t3_merge_cache = (expanded, result)
    except AttributeError:
        pass
    return result


def t3_pack_mode(plan: plannermod.DecodePlan, expanded: dict):
    """Preferred T3 device packing for one plan: ("merged", dict_ok) when
    the passes re-block onto <= 2 layers (t3_merge_plan), else
    ("legacy",) + t3_dict_modes(plan). Batch callers AND these with
    combine_t3_modes so stacked pytrees share one structure."""
    m = t3_merge_plan(plan, expanded)
    if m is not None:
        return ("merged", m[1])
    return ("legacy",) + t3_dict_modes(plan)


def combine_t3_modes(modes, plans=None):
    """AND a set of per-plan t3_pack_mode results into one batch-uniform
    mode. All-merged -> merged with the AND of dict_ok; any legacy ->
    legacy with per-pass dict modes ANDed (merged members contribute
    their t3_dict_modes via `plans`, required in that case)."""
    modes = list(modes)
    if all(m[0] == "merged" for m in modes):
        return ("merged", all(m[1] for m in modes))
    cols = []
    for i, m in enumerate(modes):
        if m[0] == "legacy":
            cols.append(m[1:])
        else:
            if plans is None:
                raise ValueError("mixed merged/legacy modes need plans")
            cols.append(t3_dict_modes(plans[i]))
    return ("legacy",) + tuple(all(c) for c in zip(*cols))


def plan_to_device_args(plan: plannermod.DecodePlan, expanded: dict,
                        expanded2d: dict | None = None,
                        t3_modes: tuple | None = None,
                        resident: bool = False,
                        t2_merged: bool | None = None):
    """Assemble (static shifts, lut table + bases, per-image tensor args)
    from a plan. Per-image tensors are packed thin for the host->device
    link: LUT row ids instead of per-tile table slices, idx|mask<<6 bytes,
    u8 colors. t3_modes (default: per-pass automatic) forces each T3
    pass's dictionary-vs-dense-rows choice - batch decode passes the AND
    across its images so the stacked pytrees share one structure."""
    w, h = plan.width, plan.height
    qh, qw = h // 4 + 1, w // 4 + 1
    tab, bases = lut_device_table(expanded)
    by_shift = {g.shift: g for g in plan.gradient if g.plane_mask == 7}
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
    if _grad_merge_available(w, h):
        # merged gradient packing: stacked corner grids + the per-4x4-block
        # winner code (later passes overwrite - sequential blend order)
        code4 = np.zeros((h // 4, w // 4), np.uint8)
        for k, (sx, sy) in enumerate(GRAD_SHIFTS):
            g = by_shift.get((sx, sy))
            if g is None:
                continue
            tw, th = 1 << sx, 1 << sy
            exp = np.repeat(np.repeat(g.accept, th // 4, 0), tw // 4, 1)
            region = code4[: exp.shape[0], : exp.shape[1]]
            region[exp] = k + 1
        if resident:
            # device-resident consumers (the bench chains): ship the
            # kernel's packed layout, zero per-step prep
            corn = _pack_grad_corners_host(np.stack(corners), h, w)
        else:
            # upload-light (e2e lanes over the rig tunnel): planar u8,
            # packed on device per decode (~1 ms/step at 512^2 b128)
            corn = np.ascontiguousarray(
                np.stack(corners).transpose(0, 3, 1, 2))
        grad_args = (None, (corn, code4))
    else:
        grad_args = (tuple(accepts), tuple(corners))

    mode = t3_modes
    if mode is None:
        mode = t3_pack_mode(plan, expanded)
    elif not isinstance(mode[0], str):
        mode = ("legacy",) + tuple(mode)   # round-2 style 6-tuple of bools
    base_arr, nrows = _lut_bases_arrays(expanded)
    t3a, t3r, t3c, t3p, t3d = [], [], [], [], []
    if mode[0] == "merged":
        m = t3_merge_plan(plan, expanded)
        if m is None:
            raise ValueError("merged T3 requested but plan needs >2 layers")
        layers, _ = m
        use_dict = bool(mode[1])
        if use_dict:
            allrows = np.concatenate([l[1] for l in layers])
            uniq, inv = _flag_uniq(allrows, int(base_arr[3] + nrows[3]))
            d = np.zeros(256, np.int32)
            d[: uniq.size] = uniq
            invs = inv.reshape(len(layers), -1)
        for L, (acc4, rows4, cols4, pk4) in enumerate(layers):
            t3a.append(acc4)
            if use_dict:
                # plan-time byte-pack for the fused kernel (4 payloads
                # per i32 lane; device-side packing measured ~1.6 ms/step
                # of layout/reshape copies at 512^2 b128). rows ride
                # cols2's top byte; the t3r slot shrinks to a dummy.
                idx4, cols2 = _pack_merged_layer(acc4, invs[L], cols4,
                                                 pk4)
                t3r.append(np.zeros(1, np.int32))
                t3d.append(d)
                t3c.append(cols2)
                t3p.append(idx4)
            else:
                t3r.append(rows4)
                t3d.append(None)
                t3c.append(cols4)
                t3p.append(pk4)
    else:
        t3_dicts_on = mode[1:]
        t3_by_shift = {p.shift: p for p in plan.tile3d}
        for k, (sx, sy) in enumerate(T3_SHIFTS):
            tw, th = 1 << sx, 1 << sy
            ntx, nty = w // tw, h // th
            g = nty * ntx
            p = t3_by_shift.get((sx, sy))
            if p is None:
                t3a.append(np.zeros((nty, ntx), bool))
                t3r.append(np.zeros(g, np.int32))
                t3c.append(np.zeros((g, 6), np.uint8))
                t3p.append(np.zeros((g, th * tw), np.uint8))
                t3d.append(np.zeros(256, np.int32) if t3_dicts_on[k]
                           else None)
                continue
            rows_full = _t3_rows_full(p, base_arr, nrows)
            t3a.append(p.accept)
            if t3_dicts_on[k]:
                # distinct-row dictionary (<= 256 by t3_dict_modes); `rows`
                # then carries dictionary indices - the device expands them
                # in-kernel (lut3d_vals_dict) instead of a dense [g,64]
                # gather
                uniq, inv = _flag_uniq(rows_full,
                                       int(base_arr[3] + nrows[3]))
                d = np.zeros(256, np.int32)
                d[: uniq.size] = uniq
                t3r.append(inv)
                t3d.append(d)
            else:
                t3r.append(rows_full)
                t3d.append(None)
            t3c.append(p.colors.astype(np.uint8))     # min/max are 0..255
            # the planner already stores idx|wmask<<6 with idx clamped to
            # 63 (corrupt streams can carry byte//3 <= 85) - zero-copy here
            t3p.append(p.packed)

    d1_prm, d1_codes4, d1_wm2 = _pack_d1_blocks(plan)

    ucol_arg = None
    if plan.overlay is not None:
        wbits_ov = np.packbits(plan.overlay.mask.astype(np.uint8),
                               axis=-1, bitorder="little")
        # planar [3, h8, w8] for the device (channel-minor wastes lanes)
        ucol_arg = (np.ascontiguousarray(
            np.moveaxis(plan.overlay.vals, -1, 0)), wbits_ov)

    t2_arg = None
    if plan.tile2d:
        if expanded2d is None:
            raise ValueError("plan carries 2DTL passes but no 2D LUT given")
        use_merged = t2_merged
        if use_merged is None:
            # merged layers ride the fused Pallas kernel; the CPU/XLA
            # fallback keeps the legacy per-(mode, size) passes
            use_merged = (USE_PALLAS
                          and jax.devices()[0].platform == "tpu")
        m = t2_merge_plan(plan, expanded2d) if use_merged else None
        if m is not None:
            tab3, _ = lut2d_device_table3(expanded2d)
            pk = None if t2_merged == "gather" else _t2_pack_dict(
                m, expanded2d)
            # dict-packed form: both layers resolve + compose in ONE
            # int8-MXU dictionary dispatch (lut3d_vals_dict2p chan=True),
            # operands byte-packed at plan time like merged T3; dense
            # per-block table rows when > 256 distinct (row, mode) pairs
            t2_arg = (tab3, pk if pk is not None else m)
        else:
            tab2, bases2 = lut2d_device_table(expanded2d)
            by_key = {(p.mode, p.shift): p for p in plan.tile2d}
            entries = []
            for mode, (sx, sy) in _T2_ORDER:
                tw, th = 1 << sx, 1 << sy
                ntx, nty = w // tw, h // th
                g = nty * ntx
                p = by_key.get((mode, (sx, sy)))
                if p is None:
                    entries.append((np.zeros((nty, ntx), bool),
                                    np.zeros(g, np.int32),
                                    np.zeros((g, 4), np.uint8),
                                    np.zeros((g, th * tw), np.uint8)))
                    continue
                rows = _t2_rows_full(p, expanded2d, bases2)
                entries.append((p.accept, rows, p.colors.astype(np.uint8),
                                p.packed))
            t2_arg = (tab2, tuple(entries))

    pg_pairs = pg_singles = None
    variants = {g.plane_mask: g for g in plan.gradient if g.plane_mask != 7}
    if variants:
        def slot(mask):
            g = variants.get(mask)
            if g is None:
                return (np.zeros((h // 4, w // 4), bool),
                        np.zeros((h // 4 + 1, w // 4 + 1, 3), np.uint8))
            return (g.accept, g.corners)
        pg_pairs = tuple(slot(m) for m in _PGRAD_PAIRS)
        pg_singles = tuple(slot(m) for m in _PGRAD_SINGLES)

    alpha_arg = None
    if alpha_spec_of(plan) is not None:
        ap = plan.alpha_plan
        raw = ap.raw if ap is not None else np.zeros(1, np.uint8)
        mip = (ap.mip.bits if ap is not None and ap.mip is not None
               else np.zeros(1, np.uint8))
        alpha_arg = (raw, mip)

    args = grad_args + (
            tuple(t3a), tuple(t3r), tuple(t3c), tuple(t3p), tuple(t3d),
            d1_prm, d1_codes4, d1_wm2, ucol_arg, t2_arg,
            pg_pairs, pg_singles, alpha_arg)
    return GRAD_SHIFTS, tab, args


def alpha_spec_of(plan: plannermod.DecodePlan):
    """The STATIC alpha spec of a plan: None (no alpha) or
    (mode, bbox, mip_spec) - hashable, part of the jit specialization.
    mode 0 = constant-255 fill (has_alpha, no ALPM chunk)."""
    if not plan.has_alpha:
        return None
    ap = plan.alpha_plan
    if ap is None:
        return (0, (0, 0, plan.width, plan.height), None)
    mspec = None
    if ap.mip is not None:
        mw, mh = ap.mip.grid
        x0, y0 = ap.mip.origin
        mspec = (mw, mh, x0, y0, 1 << ap.mip.level)
    return (ap.mode, ap.bbox, mspec)


def plnt_device_args(hdr, body: bytes, valid: np.ndarray | None = None):
    """Host planning for the PLNT device decode: parse the chunk (same
    stream semantics as decoder/reference.py:decode_plnt_plane), build the
    dense per-tile tensors. Returns (luts [T,16] i32, codes [T,64] i32
    pre-clamped to each tile's LUT length, vmask [T,64] bool, nty, ntx) or
    None when the bbox is empty. PLNT never had an upstream decoder
    (deprecated at YAIK_API.cpp:567); this is the device twin of our
    standalone plane reconstruction."""
    from yaik_tpu.decoder.reference import zstd
    from yaik_tpu.encoder.plnt import (curves_from, diff_range_decode,
                                       min_range_decode)
    h, w = hdr.h, hdr.w
    nty, ntx = h // 8, w // 8
    if nty == 0 or ntx == 0:
        return None
    usize = zstd.frame_content_size(body[:hdr.stream_size_tile_map])
    if usize is None or usize > nty * ntx * 2:
        raise ValueError("PLNT tile map size missing or out of bounds")
    types = np.frombuffer(
        zstd.decompress(body[:hdr.stream_size_tile_map], usize), "<u2")
    codes_packed = zstd.decompress(
        body[hdr.stream_size_tile_map:
             hdr.stream_size_tile_map + hdr.stream_size_tile_stream],
        hdr.expected_size_tile_stream)
    nib = np.frombuffer(codes_packed, np.uint8)
    flat = np.empty(nib.size * 2, np.uint8)
    flat[0::2] = nib & 0xF
    flat[1::2] = nib >> 4

    if valid is None:
        vm = np.ones((nty * ntx, 64), bool)
    else:
        v = valid[hdr.y:hdr.y + h, hdr.x:hdr.x + w]
        vm = v.reshape(nty, 8, ntx, 8).transpose(0, 2, 1, 3).reshape(-1, 64)
    counts = vm.sum(axis=1)
    live = counts > 0                      # tiles that consumed a type word
    if int(live.sum()) > len(types):
        raise ValueError("PLNT tile map shorter than claimed tiles")
    ends = np.cumsum(counts)
    if int(ends[-1]) > flat.size:
        raise ValueError("PLNT code stream shorter than claimed pixels")

    t_of = np.zeros(nty * ntx, np.int64)
    t_of[live] = types[:int(live.sum())]
    luts = np.zeros((nty * ntx, 16), np.int32)
    lens = np.zeros(nty * ntx, np.int32)
    for t in np.unique(t_of[live]):
        bn = min_range_decode(int(t) & 0x7F)
        dist = diff_range_decode((int(t) >> 7) & 0x3F, bn)
        lut = np.asarray(curves_from(bn, dist)[int(t) >> 13], np.int32)
        rows = live & (t_of == t)
        luts[rows, :len(lut)] = lut
        lens[rows] = len(lut)

    codes = np.zeros((nty * ntx, 64), np.int32)
    codes[vm] = flat[:int(ends[-1])]
    codes = np.minimum(codes, np.maximum(lens - 1, 0)[:, None])
    return (luts, codes, vm, nty, ntx)


@partial(jax.jit, static_argnames=("nty", "ntx"))
def decode_plnt_plane_device(luts, codes, vmask, nty, ntx):
    """Device twin of decode_plnt_plane's pixel stage: per-tile 16-entry
    LUT resolve (one-hot matvec, exact) + masked assembly. Returns the
    [nty*8, ntx*8] i32 plane with -999 at never-written pixels."""
    onehot = (codes[:, :, None] == jnp.arange(16, dtype=codes.dtype)
              [None, None, :]).astype(jnp.float32)
    L = jnp.einsum("tpk,tk->tp", onehot, luts.astype(jnp.float32),
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    vals = jnp.where(vmask, L, jnp.int32(-999))
    return _tile_to_image(vals, nty, ntx, 8, 8)


def decode(stream: bytes, lut) -> np.ndarray:
    """Full decode through the device path (host plan + TPU pixels)."""
    from yaik_tpu.utils import profiler
    expanded2d = None
    if isinstance(lut, (bytes, bytearray)):
        expanded = lutmod.expand_lut(lutmod.parse_lut_file(bytes(lut)))
    else:
        expanded = lut.expanded
        expanded2d = getattr(lut, "expanded2d", None)
    with profiler.stage("decode:plan"):
        plan = plannermod.build_plan(stream, expanded, expanded2d)
    with profiler.stage("decode:pack-args"):
        shifts, tab, args = plan_to_device_args(plan, expanded, expanded2d)
    with profiler.stage("decode:device"):
        out = decode_pixels(shifts, tab, *args,
                            aspec=alpha_spec_of(plan))
        return np.asarray(out)[: plan.height, : plan.width]
