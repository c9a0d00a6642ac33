"""Pallas TPU kernels for the codec hot paths.

lut3d_tree (decode): the per-pixel 3D-LUT entry lookup
    L[p, g] = luts_packed[idx[p, g], g]
as a 6-level binary select tree run entirely in VMEM, tiles on the 128-lane
axis and the 64-entry table on sublanes; all 3 channels travel packed in one
i32 (entries <= 128: fields can't interact). Measured at parity with the
best XLA formulation (packed one-hot matvec) and 2.2x over the old per-tile
[*, 64] one-hot reduce kernel this replaces.

score48 (encode): the Correlation3DSearch 48-pattern scoring
    sums[t, e, n] = sum_{p alive} min_k || c[t,p] - Q[e,n,k] ||^2
(EncoderContext.cpp:6421-6423 hot loop 2). The XLA elementwise form
materializes the [T, P, E, 48, 8] s32 transient in HBM (38 GB unchunked at
512^2 batch 8 - measured) with the 3-vector on the 128-lane axis; this
kernel instead expands ||c - q||^2 = |c|^2 - 2 c.q + |q|^2, puts the
E*48*8-point axis on lanes, computes the cross term as ONE MXU matmul per
pixel block and fuses the min-over-8-points + masked tile-sum in VMEM.
Exact: c, -2q are integers <= 126 (bf16-exact operands, f32 accumulation),
|q|^2 is added as f32 outside the matmul, every distance and tile sum is an
integer < 2^24 (f32-exact).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tree_kernel(P, idx_ref, lut_ref, out_ref):
    V0 = lut_ref[:]                                  # [64, LB] i32 packed
    for p in range(P):
        b = idx_ref[p, :]                            # [LB]
        v = V0
        for lev in (5, 4, 3, 2, 1, 0):
            half = v.shape[0] // 2
            bit = ((b >> lev) & 1)[None, :] != 0     # [1, LB]
            v = jnp.where(bit, v[half:, :], v[:half, :])
        out_ref[p, :] = v[0]


@partial(jax.jit, static_argnames=("interpret",))
def lut3d_tree(idxT, lutsT_pk, interpret=False):
    """idxT [P, G] i32 entry ids (tile-minor!); lutsT_pk [64, G] i32 packed
    per-tile tables. Returns L packed [P, G] i32: the per-pixel table entry,
    all channels in one value (callers unpack with & 0xFF / >> 8 / >> 16)."""
    P, G = idxT.shape
    LB = 512
    pad = (-G) % LB
    idxp = jnp.pad(idxT, ((0, 0), (0, pad)))
    lutp = jnp.pad(lutsT_pk, ((0, 0), (0, pad)))
    grid = ((G + pad) // LB,)
    out = pl.pallas_call(
        partial(_tree_kernel, P),
        out_shape=jax.ShapeDtypeStruct((P, G + pad), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((P, LB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, LB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, LB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idxp, lutp)
    return out[:, :G]


def _vals_kernel(P, idx_ref, lut_ref, col_ref, out_ref):
    V0 = lut_ref[:]                                  # [64, LB] i32 packed
    for p in range(P):
        b = idx_ref[p, :] & 63
        v = V0
        for lev in (5, 4, 3, 2, 1, 0):
            half = v.shape[0] // 2
            bit = ((b >> lev) & 1)[None, :] != 0     # [1, LB]
            v = jnp.where(bit, v[half:, :], v[:half, :])
        out_ref[p, :] = v[0]
    # color apply vectorized over the whole [P, LB] block (a per-p apply
    # on [1, LB] rows uses 1 of 8 sublanes - measured ~1.9 ms/step slower)
    L = out_ref[:]
    C = col_ref[:]                                   # [8, LB] i32 (7 used)
    mn0, mn1, mn2 = C[0:1, :], C[1:2, :], C[2:3, :]
    d0, d1, d2 = C[3:4, :] - mn0, C[4:5, :] - mn1, C[5:6, :] - mn2
    v0 = (mn0 + ((d0 * (L & 0xFF)) >> 7)) & 0xFF
    v1 = (mn1 + ((d1 * ((L >> 8) & 0xFF)) >> 7)) & 0xFF
    v2 = (mn2 + ((d2 * (L >> 16)) >> 7)) & 0xFF
    # write bit: per-pixel wmask (bit 6 of the packed byte) AND the
    # per-tile accept flag (col row 6) - rides bit 24 of the output so the
    # pass needs ONE tile->image relayout, with no separate pred plane
    w = ((idx_ref[:] >> 6) & 1) * C[6:7, :]
    out_ref[:] = v0 | (v1 << 8) | (v2 << 16) | (w << 24)


@partial(jax.jit, static_argnames=("interpret",))
def lut3d_vals(idxT, lutsT_pk, colsT, interpret=False):
    """lut3d_tree fused with the Tile3D color apply AND the write mask:
    for each pixel vals_c = (mn_c + ((diff_c * entry_c) >> 7)) & 0xFF
    (YAIK_3DTile.cpp per-pixel math), channels packed v0 | v1<<8 | v2<<16,
    and bit 24 = (packed byte bit 6) & per-tile accept. idxT [P, G] i32
    RAW packed bytes (idx | wmask<<6), lutsT_pk [64, G] i32 packed
    entries, colsT [7, G] i32 (min0..2, max0..2, accept per tile).
    Returns [P, G] i32 - the XLA side relayouts ONCE to image space and
    unpacks channels + write bit elementwise, so neither the [3, g, npx]
    entry stack nor a separate pred write plane ever reaches HBM."""
    P, G = idxT.shape
    LB = 512
    pad = (-G) % LB
    idxp = jnp.pad(idxT, ((0, 0), (0, pad)))
    lutp = jnp.pad(lutsT_pk, ((0, 0), (0, pad)))
    colp = jnp.pad(colsT, ((0, 1), (0, pad)))        # 8 sublanes
    grid = ((G + pad) // LB,)
    out = pl.pallas_call(
        partial(_vals_kernel, P),
        out_shape=jax.ShapeDtypeStruct((P, G + pad), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((P, LB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, LB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, LB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idxp, lutp, colp)
    return out[:, :G]


def _vals_dict_kernel(P, U, idx_ref, tab_ref, col_ref, out_ref):
    C = col_ref[:]                                   # [8, LB] i32
    loc = C[7, :]                                    # [LB] dict index
    T = tab_ref[:]                                   # [192, U] bf16
    oh = (jax.lax.broadcasted_iota(jnp.int32, (U, loc.shape[0]), 0)
          == loc[None, :]).astype(jnp.bfloat16)      # [U, LB]
    # per-tile LUT columns via ONE one-hot MXU matmul (entries <= 128 are
    # bf16-exact; each output column has exactly one contribution)
    L = jnp.dot(T, oh, preferred_element_type=jnp.float32).astype(jnp.int32)
    V0 = (L[0:64] | (L[64:128] << 8) | (L[128:192] << 16))   # [64, LB]
    for p in range(P):
        b = idx_ref[p, :] & 63
        v = V0
        for lev in (5, 4, 3, 2, 1, 0):
            half = v.shape[0] // 2
            bit = ((b >> lev) & 1)[None, :] != 0
            v = jnp.where(bit, v[half:, :], v[:half, :])
        out_ref[p, :] = v[0]
    L = out_ref[:]
    mn0, mn1, mn2 = C[0:1, :], C[1:2, :], C[2:3, :]
    d0, d1, d2 = C[3:4, :] - mn0, C[4:5, :] - mn1, C[5:6, :] - mn2
    v0 = (mn0 + ((d0 * (L & 0xFF)) >> 7)) & 0xFF
    v1 = (mn1 + ((d1 * ((L >> 8) & 0xFF)) >> 7)) & 0xFF
    v2 = (mn2 + ((d2 * (L >> 16)) >> 7)) & 0xFF
    w = ((idx_ref[:] >> 6) & 1) * C[6:7, :]
    out_ref[:] = v0 | (v1 << 8) | (v2 << 16) | (w << 24)


@partial(jax.jit, static_argnames=("interpret",))
def lut3d_vals_dict(idxT, tab3, colsT, interpret=False):
    """lut3d_vals with a per-image LUT DICTIONARY instead of per-tile
    gathered tables: most streams use only a handful of distinct LUT rows
    per pass (6-104 observed vs 2048-16384 tiles), so the dense
    lut_tab[rows] gather (~3.3 ms/step at 512^2 b32, [g, 64] i32 in HBM)
    is replaced by a [U=256]-row dictionary expanded to per-tile columns
    INSIDE the kernel by one-hot MXU matmuls. idxT [P, G] i32 raw packed
    bytes; tab3 [192, U] bf16 (three 64-entry channel tables stacked);
    colsT [8, G] i32 (min0..2, max0..2, accept, dict index per tile).
    Returns [P, G] i32 packed values + write bit, as lut3d_vals."""
    P, G = idxT.shape
    U = tab3.shape[1]
    LB = 512
    pad = (-G) % LB
    idxp = jnp.pad(idxT, ((0, 0), (0, pad)))
    colp = jnp.pad(colsT, ((0, 0), (0, pad)))
    grid = ((G + pad) // LB,)
    out = pl.pallas_call(
        partial(_vals_dict_kernel, P, U),
        out_shape=jax.ShapeDtypeStruct((P, G + pad), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((P, LB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((192, U), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, LB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idxp, tab3, colp)
    return out[:, :G]


# NOTE (negative results, this chip's Mosaic): the tile->image relayout
# cannot move into the kernels.
# (1) A fused relayout+blend kernel (vp_ref[:].reshape(th, tw, BR, ntx)
#     .transpose(2, 0, 3, 1) on VMEM blocks) fails "infer-vector-layout:
#     unsupported shape cast" on the 2D->4D reshape.
# (2) A py-major emit (per within-tile row: seg [tw, LB] -> seg.T
#     .reshape(1, LB*tw), leaving XLA only a whole-row block permute)
#     fails on the [LB, tw] -> [1, LB*tw] LANE-INTERLEAVE collapse; the
#     orientation Mosaic does accept ([tw, LB] row-major flatten) is the
#     trivial px-major concat, which doesn't help the consumer.
# The tile->image permutation stays an XLA transpose-copy per pass.


# ---------------------------------------------------------------------------
# Merged gradient pass (decode)
# ---------------------------------------------------------------------------

def _grad_strides(shifts, BR):
    """Per-pass block stride of the compact corner layout (single source
    of the alignment rule; jax_engine._grad_layout consumes it for the
    plan-time packers): stride == nr means contiguous rows with an
    8-row over-read, else rows are duplicated at this 8-aligned
    stride."""
    out = []
    for (sx, sy) in shifts:
        nr = BR // (1 << sy)
        out.append(nr if nr % 8 == 0 else -(-(nr + 1) // 8) * 8)
    return tuple(out)


def _grad_kernel(shifts, BR, W, corn_ref, code_ref, wy_ref, bx_ref,
                 r4y_ref, r4x_ref, *rest):
    """All 7 gradient size passes for one row block, in VMEM.

    Per pass k the block needs only BR/th + 1 rows of the pass's
    COMPACT corner grid (row t = tile row t, no stride): one small
    channel-stacked x-interp matmul [3*(nr+1), 256] @ [256, W] over
    those rows, then the y-interp as a VPU 2-term blend on
    sublane-REPEATED rows (the previous dense [BR, KY] @ [KY, 6W]
    y-matmul multiplied a 2-banded matrix - 64x zero work - and the
    x-matmul processed the whole 136-row grid per block; HLO-profiled
    ~4.3 ms/step at 512^2 b128, ~10x more MXU work than needed).
    Exact: corner values <= 255 and weights <= 16 are bf16-exact
    operands, every f32 intermediate is an integer < 2^24.

    The per-pixel winner pass rides `code` (1..7 in GRADIENT_PASS_ORDER,
    0 = no gradient) at 4x4-block granularity - every tile size is a
    multiple of 4x4 and later passes overwrite earlier ones exactly as
    the sequential blends did. Expanded to pixels by constant 0/1
    matmuls, the select chain replaces 7 full-image masked blends."""
    i = pl.program_id(0)
    strides = _grad_strides(shifts, BR)
    code = code_ref[:].astype(jnp.bfloat16)              # [BR/4, W/4]
    Cf = jnp.dot(r4y_ref[:],
                 jnp.dot(code, r4x_ref[:],
                         preferred_element_type=jnp.float32)
                 .astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    C = Cf.astype(jnp.int32)                             # [BR, W]
    out = jnp.zeros(C.shape, jnp.int32)
    for k, (sx, sy) in enumerate(shifts):
        tw, th = 1 << sx, 1 << sy
        nr = BR // th
        # Mosaic requires the dynamic sublane load offset provably % 8
        # (i*nr with nr=4 at H=64 is not - caught by an end-to-end
        # verify drive, not the 512^2 chain where every nr is a multiple
        # of 8). _grad_strides (shared with the plan-time packers via
        # jax_engine._grad_layout) stores contiguous+over-read-8 rows
        # when nr % 8 == 0, else plan-time-duplicated rows at an
        # 8-aligned block stride.
        stride = strides[k]
        nr8 = nr + 8 if stride == nr else stride
        blk = corn_ref[k, pl.ds(i * stride, nr8), :]     # [nr8, CW]
        # (an int8-MXU x-interp variant - corners-128 as s8 with the
        # constant 128*tw correction - measured a wash: 2318 vs 2327
        # MPix/s chained; the bf16 form stays)
        cg3 = jnp.concatenate(
            [((blk >> c) & 0xFF) for c in (0, 8, 16)],
            axis=0).astype(jnp.bfloat16)                 # [3*nr8, 256]
        u3 = jnp.dot(cg3, bx_ref[k],
                     preferred_element_type=jnp.float32)  # [3*nr8, W]
        R = nr8
        # y-interp: rows ty and ty+1 of u, sublane-repeated th times,
        # blended by the static per-row weights (th-ry) / ry
        wy1 = wy_ref[k, :, 0:1]                          # [BR, 1]
        wy2 = wy_ref[k, :, 1:2]
        vk = None
        for ci in range(3):
            u = u3[ci * R: (ci + 1) * R]
            utop = jnp.repeat(u[:nr], th, axis=0)        # [BR, W]
            ubot = jnp.repeat(u[1: nr + 1], th, axis=0)
            t = wy1 * utop + wy2 * ubot                  # exact < 2^24
            vc = t.astype(jnp.int32) >> (sy + sx)
            vk = vc if ci == 0 else vk | (vc << (8 * ci))
        out = jnp.where(C == k + 1, vk, out)
    if len(rest) == 1:                                   # (out_ref,)
        rest[0][:] = out | jnp.where(C > 0, 1 << 24, 0)
        return
    # fused final composition (vc_ref, mc_ref, out_ref): blend the
    # gradient result over the 0x808080 background, then apply the
    # composed T3+1D values with their per-CHANNEL mask - the whole
    # post-overlay pipeline's last two full-plane RMW chains collapse
    # into this block's epilogue (decode_core compose path)
    vc_ref, mc_ref, out_ref = rest
    bg = jnp.int32(0x808080)
    # & 0xFFFFFF replicates the legacy masked blend exactly (the packed
    # OR could carry bits >= 24 only on out-of-range channel values, but
    # the legacy path discarded them and so must this one)
    p1 = jnp.where(C > 0, out & 0xFFFFFF, bg)
    vc, mc = vc_ref[:], mc_ref[:]
    out_ref[:] = p1 ^ ((p1 ^ vc) & mc)


@partial(jax.jit, static_argnames=("shifts", "interpret"))
def grad_plane(corn, code4, wy, bxc, r4y, r4x, shifts, interpret=False):
    """Merged gradient plane: corn [7, RT, 256] i32 COMPACT per-pass
    packed corner grids in the 8-aligned per-block-stride layout
    (_pack_grad_corners_host), code4 [H/4, W/4] i32
    winner codes, wy [7, BR, 2] f32 per-row y-weights, bxc [7, 256, W]
    bf16 compact x-interp matrices, r4y/r4x the code-expansion constants
    (all from jax_engine._grad_consts). Returns [H, W] i32: packed RGB +
    write flag in bit 24. Exact YAIK_Gradient.cpp fixed-point
    semantics."""
    BR = r4y.shape[0]
    W = bxc.shape[2]
    H = code4.shape[0] * 4
    RT, CW = corn.shape[1], corn.shape[2]
    grid = (H // BR,)
    return pl.pallas_call(
        partial(_grad_kernel, shifts, BR, W),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((7, RT, CW), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR // 4, W // 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, BR, 2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, CW, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, BR // 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W // 4, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BR, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(corn, code4, wy, bxc, r4y, r4x)


@partial(jax.jit, static_argnames=("shifts", "interpret"))
def grad_plane_final(corn, code4, wy, bxc, r4y, r4x, vc, mc, shifts,
                     interpret=False):
    """grad_plane + the final composition in one dispatch: the gradient
    result blends over the 0x808080 background and the composed T3+1D
    values vc apply under the per-channel mask mc (both [H, W] i32) in
    the kernel epilogue. Returns the FINAL [H, W] i32 packed plane -
    replaces two full-plane XLA RMW chains on the standard decode path
    (decode_core compose branch; ucol streams keep the split form)."""
    BR = r4y.shape[0]
    W = bxc.shape[2]
    H = code4.shape[0] * 4
    RT, CW = corn.shape[1], corn.shape[2]
    grid = (H // BR,)
    return pl.pallas_call(
        partial(_grad_kernel, shifts, BR, W),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((7, RT, CW), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR // 4, W // 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, BR, 2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, CW, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, BR // 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W // 4, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BR, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(corn, code4, wy, bxc, r4y, r4x, vc, mc)


# ---------------------------------------------------------------------------
# Encoder 48-pattern scoring
# ---------------------------------------------------------------------------

def _score48_kernel(n48p, P, x_ref, m_ref, q_ref, q2_ref, o_ref):
    X = x_ref[:]                                           # [Pb, 3] f32
    G = jnp.dot(X, q_ref[:], preferred_element_type=jnp.float32)
    D = G + q2_ref[:]                                      # -2c.q + |q|^2
    m = D[:, :n48p]
    for k in range(1, 8):
        m = jnp.minimum(m, D[:, k * n48p:(k + 1) * n48p])
    x2 = (X * X).sum(axis=1, keepdims=True)                # [Pb, 1]
    dist = (m + x2) * m_ref[:]                             # mask [Pb, 1]
    pb = dist.shape[0]
    o_ref[0] = dist.reshape(pb // P, P, n48p).sum(axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def score48(c, alive, qpts, interpret=False):
    """c [T, P, 3] i32 in 0..63; alive [T, P] bool; qpts [E, 48, 8, 3] i32.
    Returns sums [T, E, 48] i32 == where(alive, min_k |c-q|^2, 0).sum(P)."""
    T, P, _ = c.shape
    E = qpts.shape[0]
    n48 = E * 48
    n48p = -(-n48 // 128) * 128
    K = 8 * n48p

    # column j = e*48 + n, lanes hold the pattern axis; point axis k is the
    # 8-slice min inside the kernel
    qq = qpts.transpose(2, 0, 1, 3).reshape(8, n48, 3).astype(jnp.float32)
    qneg2 = jnp.pad(-2.0 * qq, ((0, 0), (0, n48p - n48), (0, 0)))
    qmat = qneg2.transpose(2, 0, 1).reshape(3, K)
    q2 = jnp.pad((qq * qq).sum(-1), ((0, 0), (0, n48p - n48)),
                 constant_values=1e9).reshape(1, K)

    # block VMEM is dominated by the [pb, K] dots matrix; a pb=1024 probe
    # at K=6144 (25 MB transient) compiled and measured NO faster than
    # 256, so the conservative size stays (and larger banks - E=22 gives
    # K=9216 - would overrun VMEM at 1024)
    pb = 256 if K * 4 * 256 <= 6 << 20 else 128
    pb = max(pb, P)
    if pb % P:
        raise ValueError(f"tile size {P} does not divide block {pb}")
    tb = pb // P
    padT = (-T) % tb
    x = jnp.pad(c, ((0, padT), (0, 0), (0, 0))).astype(jnp.float32)
    x = x.reshape((T + padT) * P, 3)
    mask = jnp.pad(alive, ((0, padT), (0, 0))).astype(jnp.float32)
    mask = mask.reshape((T + padT) * P, 1)
    grid = ((T + padT) // tb,)

    ngrid = (T + padT) // tb
    out = pl.pallas_call(
        partial(_score48_kernel, n48p, P),
        # 3D out [grid, tb, n48p] with full trailing block dims satisfies
        # the Mosaic (8, 128) block-tiling rule for any tb
        out_shape=jax.ShapeDtypeStruct((ngrid, tb, n48p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((pb, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb, n48p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, mask, qmat, q2)
    out = out.reshape(ngrid * tb, n48p)
    return out[:T, :n48].reshape(T, E, 48).astype(jnp.int32)


def _vals_dict2p_kernel(P, U, idxa_ref, idxb_ref, tab_ref, cola_ref,
                        colb_ref, *rest, chan=False):
    """_vals_dict2_kernel with BYTE-PACKED inputs and PER-BLOCK work
    elision. Inputs: idx rows carry 4 raw bytes per i32 lane ([P/4, LB]);
    the 8 per-tile columns pack into 2 lanes ([2, LB]:
    mn0|mn1<<8|mn2<<16|acc<<24, mx0|mx1<<8|mx2<<16|dict<<24). The
    kernel's materialized VMEM inputs shrink 4x (the decode roofline's #1
    term - u8 payloads in i32 lanes).

    Work elision (value-dependent lax.cond per block, round 5): a block
    with no accepted tiles in a layer skips that layer's whole resolve
    (~44% of LB=512 blocks for the sparse priority layer 1 on real
    content), and a block whose indices all fit 4 bits walks a 15-row
    select tree instead of 63 (layer 1 measures 100% <16, layer 0
    25-31%). Bit-exact vs the unpacked kernel - the skipped work could
    only produce lanes that the accept/write masks already zero."""
    T = tab_ref[:]                                   # [192, U] bf16

    def resolve(idx_ref, col_ref):
        C = col_ref[:]                               # [2, LB] i32 packed
        loc = (C[1, :] >> 24) & 0xFF
        acc = (C[0:1, :] >> 24) & 0xFF
        raws = [(idx_ref[p >> 2, :] >> (8 * (p & 3))) & 0xFF
                for p in range(P)]
        wr = jnp.concatenate([((r >> 6) & 1)[None, :] for r in raws],
                             axis=0) * acc           # [P, LB]
        bs = [r & 63 for r in raws]
        zero = jnp.zeros((P, C.shape[1]), jnp.int32)

        def tree(depth):
            # dictionary expand only the rows the tree can reach: the
            # one-hot matmul shrinks [192,U] -> [3*depth,U] with it.
            # The matmul runs on the int8 MXU path (2x the bf16 rate;
            # this matmul dominated the kernel at LB=2048): the table
            # stores entry-1 (entries 0..128 -> -1..127 fits s8) and the
            # exactly-one-hot contraction adds it back (+1), all in
            # exact i32 accumulation.
            parts = [T[c * 64: c * 64 + depth] for c in range(3)]
            Ts = jnp.concatenate(parts, axis=0)      # [3*depth, U] s8
            oh = (jax.lax.broadcasted_iota(
                jnp.int32, (U, loc.shape[0]), 0)
                == loc[None, :]).astype(jnp.int8)
            L = jax.lax.dot_general(
                Ts, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32) + 1
            V0 = (L[0:depth] | (L[depth:2 * depth] << 8)
                  | (L[2 * depth:] << 16))
            levs = tuple(range(depth.bit_length() - 2, -1, -1))
            rows = []
            for p in range(P):
                v = V0
                for lev in levs:
                    half = v.shape[0] // 2
                    bit = ((bs[p] >> lev) & 1)[None, :] != 0
                    v = jnp.where(bit, v[half:, :], v[:half, :])
                rows.append(v[0])
            return jnp.concatenate([r[None] for r in rows], axis=0)

        # any idx byte >= 16 sets a bit under mask 0x30303030 (bytes are
        # <= 0x7F: idx|wmask<<6; wmask bit 6 must not force the deep
        # tree). OR the four byte rows (no inter-byte carries), mask,
        # then max > 0 == any-lane test (values are non-negative)
        wbits = ((idx_ref[0, :] | idx_ref[1, :])
                 | (idx_ref[2, :] | idx_ref[3, :])) & 0x30303030
        deep = jnp.max(wbits) > 0
        E = jax.lax.cond(jnp.max(acc) == 0, lambda: zero,
                         lambda: jax.lax.cond(deep, lambda: tree(64),
                                              lambda: tree(16)))
        mn0 = C[0:1, :] & 0xFF
        mn1 = (C[0:1, :] >> 8) & 0xFF
        mn2 = (C[0:1, :] >> 16) & 0xFF
        d0 = (C[1:2, :] & 0xFF) - mn0
        d1 = ((C[1:2, :] >> 8) & 0xFF) - mn1
        d2 = ((C[1:2, :] >> 16) & 0xFF) - mn2
        v0 = (mn0 + ((d0 * (E & 0xFF)) >> 7)) & 0xFF
        v1 = (mn1 + ((d1 * ((E >> 8) & 0xFF)) >> 7)) & 0xFF
        v2 = (mn2 + ((d2 * (E >> 16)) >> 7)) & 0xFF
        return v0 | (v1 << 8) | (v2 << 16), wr

    va, wa = resolve(idxa_ref, cola_ref)
    vb, wb = resolve(idxb_ref, colb_ref)
    if len(rest) == 1:
        out_ref = rest[0]
        if chan:
            # merged-2DTL compose: the accept fields carry the mode's
            # 3-bit written-CHANNEL mask, so wa/wb are per-pixel channel
            # masks (wbit * chmask). Layer 1 overrides layer 0 only on
            # ITS channels, and the OR of both masks rides bits 24-26
            # (the d1 value-word convention) for the image-side blend.
            mb = (((wb & 1) * 0xFF) | (((wb >> 1) & 1) * 0xFF00)
                  | (((wb >> 2) & 1) * 0xFF0000))
            out_ref[:] = (va ^ ((va ^ vb) & mb)) | ((wa | wb) << 24)
        else:
            out_ref[:] = jnp.where(wb != 0, vb, va) | ((wa | wb) << 24)
        return
    # Fused 1D-residual compose (round 5): the d1 pass applies on top of
    # the T3 result per CHANNEL byte (YAIK_3DTile.cpp:24-240 semantics,
    # Decompress1D per plane), so its values never take the separate
    # tile->image relayout + mask-expansion + blend chain that HLO
    # profiling measured at ~3 ms/step (512^2 b128). Inputs are
    # 4x4-block-space, byte/bit-packed at plan time:
    #   codes_ref [12, LB] i32 - per-channel index bytes, 4 px per lane
    #     (channel c rows 4c..4c+3)
    #   prm_ref [5, LB] i32 - color0 c0|c1<<8|c2<<16, base likewise,
    #     then delta2 per channel (<= 21 bits) in rows 2..4
    #   wm_ref [2, LB] i32 - per-(channel, pixel) write bits, bit
    #     index c*16+p in lane (c*16+p)>>5
    # Output: per-channel composed value bytes + per-channel write flags
    # in bits 24/25/26 (T3 writes set all three).
    codes_ref, prm_ref, wm_ref, out_ref = rest
    t3 = jnp.where(wb != 0, vb, va)
    wt = (wa | wb)                                    # [P, LB] 0/1
    PR = prm_ref[:]                                   # [5, LB]
    WM = wm_ref[:]                                    # [2, LB]
    c0 = [(PR[0:1, :] >> (8 * c)) & 0xFF for c in range(3)]
    bs = [(PR[1:2, :] >> (8 * c)) & 0xFF for c in range(3)]
    d2 = [PR[2 + c: 3 + c, :] for c in range(3)]
    outs = []
    for p in range(P):
        t3p = t3[p: p + 1, :]
        wtp = wt[p: p + 1, :]
        acc_v = None
        acc_w = None
        for c in range(3):
            L = (codes_ref[4 * c + (p >> 2), :] >> (8 * (p & 3))) & 0xFF
            L = L[None, :]
            v1 = (bs[c] + (((L - 1) * d2[c]) >> 16)) & 0xFF
            v1 = jnp.where(L != 0, v1, c0[c])
            bitpos = c * 16 + p
            w1 = (WM[bitpos >> 5: (bitpos >> 5) + 1, :]
                  >> (bitpos & 31)) & 1
            tv = (t3p >> (8 * c)) & 0xFF
            sel = jnp.where(w1 != 0, v1, tv)
            wb_c = (wtp | w1) << (24 + c)
            term = (sel << (8 * c)) | wb_c
            acc_v = term if c == 0 else acc_v | term
        outs.append(acc_v)
    out_ref[:] = jnp.concatenate(outs, axis=0)


@partial(jax.jit, static_argnames=("interpret",))
def lut3d_vals_dict2p_d1(idx4a, idx4b, tab3, cols2a, cols2b, codes4, prm,
                         wm2, interpret=False):
    """lut3d_vals_dict2p + the fused 1D-residual compose (see
    _vals_dict2p_kernel's d1 epilogue). Returns [P, G] i32: per-channel
    composed value bytes with per-channel write flags in bits 24-26."""
    P4, G = idx4a.shape
    P = P4 * 4
    U = tab3.shape[1]
    LB = int(os.environ.get("YAIK_T3_LB", "2048"))
    pad = (-G) % LB
    args = [jnp.pad(a, ((0, 0), (0, pad)))
            for a in (idx4a, idx4b, cols2a, cols2b, codes4, prm, wm2)]
    grid = ((G + pad) // LB,)

    def spec(r):
        return pl.BlockSpec((r, LB), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_vals_dict2p_kernel, P, U),
        out_shape=jax.ShapeDtypeStruct((P, G + pad), jnp.int32),
        grid=grid,
        in_specs=[spec(P4), spec(P4),
                  pl.BlockSpec((192, U), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  spec(2), spec(2), spec(12), spec(5), spec(2)],
        out_specs=pl.BlockSpec((P, LB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(args[0], args[1], tab3, *args[2:])
    return out[:, :G]


@partial(jax.jit, static_argnames=("interpret", "chan"))
def lut3d_vals_dict2p(idx4a, idx4b, tab3, cols2a, cols2b, interpret=False,
                      chan=False):
    """Packed-input fused two-layer merged-T3 resolve (see
    _vals_dict2p_kernel): idx4* [P/4, G] i32 (4 raw idx|wmask<<6 bytes
    per lane, little-endian), cols2* [2, G] i32 packed per-tile columns.
    Returns [P, G] i32 packed RGB + (wA|wB)<<24, bit-identical to
    lut3d_vals_dict2 on the equivalent unpacked arguments. chan=True is
    the merged-2DTL form: accept fields carry 3-bit channel masks and
    the layer compose + the bits-24-26 write flags act per channel."""
    P4, G = idx4a.shape
    P = P4 * 4
    U = tab3.shape[1]
    # round-5 final sweep at the cert config (64 steps, b128, plan-time
    # packed operands): 512/1024/2048/4096 = 1982/2241/2268/2248 MPix/s
    LB = int(os.environ.get("YAIK_T3_LB", "2048"))
    pad = (-G) % LB
    idxap = jnp.pad(idx4a, ((0, 0), (0, pad)))
    idxbp = jnp.pad(idx4b, ((0, 0), (0, pad)))
    colap = jnp.pad(cols2a, ((0, 0), (0, pad)))
    colbp = jnp.pad(cols2b, ((0, 0), (0, pad)))
    grid = ((G + pad) // LB,)
    out = pl.pallas_call(
        partial(_vals_dict2p_kernel, P, U, chan=chan),
        out_shape=jax.ShapeDtypeStruct((P, G + pad), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((P4, LB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P4, LB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((192, U), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, LB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idxap, idxbp, tab3, colap, colbp)
    return out[:, :G]


def _vals_dict2_kernel(P, U, idxa_ref, idxb_ref, tab_ref, cola_ref,
                       colb_ref, out_ref):
    """Both merged-T3 priority layers resolved AND composed in one kernel
    (layer B wins where it writes - the priority-layer contract)."""
    T = tab_ref[:]                                   # [192, U] bf16

    def resolve(idx_ref, col_ref):
        C = col_ref[:]                               # [8, LB] i32
        loc = C[7, :]
        oh = (jax.lax.broadcasted_iota(jnp.int32, (U, loc.shape[0]), 0)
              == loc[None, :]).astype(jnp.bfloat16)
        L = jnp.dot(T, oh,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
        V0 = (L[0:64] | (L[64:128] << 8) | (L[128:192] << 16))
        rows = []
        for p in range(P):
            b = idx_ref[p, :] & 63
            v = V0
            for lev in (5, 4, 3, 2, 1, 0):
                half = v.shape[0] // 2
                bit = ((b >> lev) & 1)[None, :] != 0
                v = jnp.where(bit, v[half:, :], v[:half, :])
            rows.append(v[0])
        E = jnp.concatenate([r[None] for r in rows], axis=0)   # [P, LB]
        mn0, mn1, mn2 = C[0:1, :], C[1:2, :], C[2:3, :]
        d0, d1, d2 = C[3:4, :] - mn0, C[4:5, :] - mn1, C[5:6, :] - mn2
        v0 = (mn0 + ((d0 * (E & 0xFF)) >> 7)) & 0xFF
        v1 = (mn1 + ((d1 * ((E >> 8) & 0xFF)) >> 7)) & 0xFF
        v2 = (mn2 + ((d2 * (E >> 16)) >> 7)) & 0xFF
        wr = ((idx_ref[:] >> 6) & 1) * C[6:7, :]
        return v0 | (v1 << 8) | (v2 << 16), wr

    va, wa = resolve(idxa_ref, cola_ref)
    vb, wb = resolve(idxb_ref, colb_ref)
    out_ref[:] = jnp.where(wb != 0, vb, va) | ((wa | wb) << 24)


@partial(jax.jit, static_argnames=("interpret",))
def lut3d_vals_dict2(idxaT, idxbT, tab3, colsaT, colsbT, interpret=False):
    """Fused two-layer merged-T3 resolve: lut3d_vals_dict on layer A and
    layer B plus the priority compose (B-over-A) in ONE dispatch, so the
    whole post-gradient T3 stage pays ONE [P, G] output, ONE tile->image
    relayout and ONE plane blend instead of two of each (the relayout +
    blend RMW were the roofline's #2/#3 terms - BASELINE.md round 4).
    Layer tensors exactly as lut3d_vals_dict; both layers share tab3 (the
    union dictionary t3_merge_plan builds). Returns [P, G] i32 packed
    RGB + (wA|wB)<<24."""
    P, G = idxaT.shape
    U = tab3.shape[1]
    LB = 512
    pad = (-G) % LB
    idxap = jnp.pad(idxaT, ((0, 0), (0, pad)))
    idxbp = jnp.pad(idxbT, ((0, 0), (0, pad)))
    colap = jnp.pad(colsaT, ((0, 0), (0, pad)))
    colbp = jnp.pad(colsbT, ((0, 0), (0, pad)))
    grid = ((G + pad) // LB,)
    out = pl.pallas_call(
        partial(_vals_dict2_kernel, P, U),
        out_shape=jax.ShapeDtypeStruct((P, G + pad), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((P, LB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, LB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((192, U), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, LB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idxap, idxbp, tab3, colap, colbp)
    return out[:, :G]


# ---------------------------------------------------------------------------
# Encoder values stage (computeValues3D for all (tile, LUT))
# ---------------------------------------------------------------------------

_V48_WINDOWS = ((0, 64), (64, 32), (96, 16), (112, 8))
_V48_INIT = 1215752191                 # (int)99999999999, EncoderContext:6459
_V48_SKIP = 4
_V48_SWAP = ((0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1),
             (2, 1, 0))


def _values48_kernel(P, E, factor, ab_ref, tmd_ref, m48_ref, sf_ref,
                     ff_ref, idx_ref, meta_ref):
    """One (tile-block, LUT e) grid step of the values stage.

    Rows = tile*pixel flattened on sublanes (score48's layout); the packed
    120-lane point axis carries all four bit depths. Per-tile quantities
    move between [tb, 1] and [Pb, 1] by sublane-split/merge reshapes with
    the lane dim fixed at 1 (the only reshape class Mosaic supports, same
    as score48's (Pb, X) -> (tb, P, X)). The LUT axis rides the grid's
    inner dimension; the selection scan accumulates in the revisited
    meta/idx output blocks (lanes: 0 best_diff, 1 best_e, 2 best_acc,
    3 mode_sel, 4 accept, 5 tile_type)."""
    e = pl.program_id(1)
    n_e = pl.num_programs(1)
    AB = ab_ref[:]                                     # [Pb, 8] f32 a|b
    TMD = tmd_ref[:]                                   # [Pb, 16] i32
    Pb = AB.shape[0]
    tb = Pb // P

    def to_tile(x_r, red):                             # [Pb,1] -> [tb,1]
        return red(x_r.reshape(tb, P, 1), axis=1)

    def to_rows(x_t):                                  # [tb,1] -> [Pb,1]
        return jnp.broadcast_to(x_t[:, None, :], (tb, P, 1)).reshape(Pb, 1)

    # mode48 column e: one-hot MXU extract from the [tb, 128] block
    ids = jax.lax.broadcasted_iota(jnp.int32, (m48_ref.shape[1], 1), 0)
    oh = (ids == e).astype(jnp.float32)
    m48t = jnp.dot(m48_ref[:], oh,
                   preferred_element_type=jnp.float32)  # [tb,1] exact (<48)
    mi = to_rows(m48t).astype(jnp.int32)                # [Pb,1]
    k = mi >> 3
    flip = [(mi >> s) & 1 for s in range(3)]
    m_s = [jnp.where(flip[s] == 1, AB[:, 3 + s:4 + s], AB[:, s:s + 1])
           for s in range(3)]                           # 3x [Pb,1] f32
    # perm_o = SWAP3D[k][o] via 6-way selects (k is per-row)
    perm = []
    for o in range(3):
        po = jnp.zeros_like(k)
        for kk in range(6):
            po = jnp.where(k == kk, _V48_SWAP[kk][o], po)
        perm.append(po)

    def permute3(v3, o):
        return jnp.where(perm[o] == 0, v3[0],
                         jnp.where(perm[o] == 1, v3[1], v3[2]))

    mf = [permute3(m_s, o) for o in range(3)]           # 3x [Pb,1] f32
    sfm = sf_ref[0]                                     # [3,128] point vals
    # elementwise |mf - sf|^2 in the XLA form's exact op order (sum of 3
    # squares, same association). The MXU form dist' = (-2 mf).sf + |sf|^2
    # is argmin-equivalent ONLY while products stay f32-exact; dead pixels
    # can carry huge out-of-range normalizations (the caller's i32
    # magic-multiply wraps for tiles < mn) whose products exceed 2^24 and
    # round DIFFERENTLY than the squared form - and accepted tiles emit
    # dead-pixel idx bytes, so those argmins are part of the byte contract
    # (found as a 28-byte stream divergence on real content; the random
    # unit tests never produced out-of-range inputs).
    dist = sum((mf[s] - sfm[s:s + 1, :]) ** 2 for s in range(3))
    ffm = ff_ref[0]                                     # [3,128]

    sgn = [jnp.where(flip[s] == 1, jnp.float32(-1), jnp.float32(1))
           for s in range(3)]
    base = [flip[s].astype(jnp.float32) * jnp.float32(factor)
            for s in range(3)]
    mnr = [to_rows(to_tile(TMD[:, 4 + o:5 + o], jnp.max))
           for o in range(3)]    # mn is per-tile constant; max == identity
    dr = [to_rows(to_tile(TMD[:, 7 + o:8 + o], jnp.max)) for o in range(3)]
    alive_r = TMD[:, 3:4]
    tl = [TMD[:, o:o + 1] for o in range(3)]

    acc_e = jnp.full((tb, 1), _V48_SKIP, jnp.int32)
    diff_e = jnp.zeros((tb, 1), jnp.int32)
    idx_e = jnp.zeros((Pb, 1), jnp.int32)
    idx_w0 = None
    BIG = jnp.float32(3.0e38)
    for bi, (off, npts) in enumerate(_V48_WINDOWS):
        db = dist[:, off:off + npts]
        dmin = jnp.min(db, axis=1, keepdims=True)
        iot = jax.lax.broadcasted_iota(jnp.int32, (Pb, npts), 1)
        idx = jnp.min(jnp.where(db <= dmin, iot, npts), axis=1,
                      keepdims=True)                    # [Pb,1]
        if bi == 0:
            idx_w0 = idx
        hit = iot == idx
        fx_s = [base[s] + sgn[s] * jnp.min(
            jnp.where(hit, ffm[s:s + 1, off:off + npts], BIG),
            axis=1, keepdims=True) for s in range(3)]   # 3x [Pb,1] f32
        ld = jnp.zeros((Pb, 1), jnp.int32)
        for o in range(3):
            fx_o = permute3(fx_s, o).astype(jnp.int32)
            recon = mnr[o] + ((fx_o * dr[o]) >> 7)
            ld = jnp.maximum(ld, jnp.abs(recon - tl[o]))
        ldiff = jnp.where(alive_r != 0, ld, 0)
        cnt = to_tile((ldiff > 5).astype(jnp.float32), jnp.sum)
        ok_t = cnt <= 3.0                               # [tb,1] bool
        dsum = to_tile(ldiff.astype(jnp.float32), jnp.sum)
        acc_e = jnp.where(ok_t, jnp.int32(3 - bi), acc_e)
        diff_e = jnp.where(ok_t, dsum.astype(jnp.int32), diff_e)
        ok_r = to_rows(ok_t.astype(jnp.int32)) != 0
        idx_e = jnp.where(ok_r, idx, idx_e)

    m48t_i = m48t.astype(jnp.int32)

    @pl.when(e == 0)
    def _seed():
        # unaccepted tiles replicate the XLA tail exactly: e_sel=0,
        # bitmode=min(SKIP,3)=3 -> idx_stack[0] = e0/window-0 idx
        meta0 = jnp.concatenate(
            [jnp.full((tb, 1), _V48_INIT, jnp.int32),    # best_diff
             jnp.full((tb, 1), -1, jnp.int32),           # best_e
             jnp.full((tb, 1), _V48_SKIP, jnp.int32),    # best_acc
             m48t_i,                                     # mode_sel
             jnp.zeros((tb, 4), jnp.int32)], axis=1)
        meta_ref[0] = meta0
        idx_ref[0] = idx_w0

    meta = meta_ref[0]                                   # [tb, 8]
    best_diff = meta[:, 0:1]
    best_e = meta[:, 1:2]
    best_acc = meta[:, 2:3]
    mode_sel = meta[:, 3:4]
    okE = (acc_e != _V48_SKIP) & (diff_e <= best_diff)
    best_diff = jnp.where(okE, diff_e, best_diff)
    best_e = jnp.where(okE, e, best_e)
    best_acc = jnp.where(okE, acc_e, best_acc)
    mode_sel = jnp.where(okE, m48t_i, mode_sel)
    ok_r = to_rows(okE.astype(jnp.int32)) != 0
    idx_ref[0] = jnp.where(ok_r, idx_e, idx_ref[0])

    accept = (best_e >= 0).astype(jnp.int32)
    e_sel = jnp.maximum(best_e, 0)
    bitmode = jnp.minimum(best_acc, 3)
    tile_type = mode_sel | (e_sel << 6) | (bitmode << 14)
    meta_ref[0] = jnp.concatenate(
        [best_diff, best_e, best_acc, mode_sel, accept, tile_type,
         jnp.zeros((tb, 2), jnp.int32)], axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def values48(tiles, alive, a_c, b_c, mode48, mn, d, pts_sub, factors,
             interpret=False):
    """Pallas twin of jax_scoring.tile3d_values_device (same signature,
    same returns (accept [T] bool, tile_type [T] i32, idx_sel [T,P] i32),
    bit-identical - tests/test_values48.py). The whole stage - distance
    argmins over the packed 120-point axis for all 4 bit depths, factor
    gathers, integer reconstruction/acceptance, and the E-LUT selection
    scan - runs in one dispatch with the LUT axis on the inner grid
    dimension and the scan state accumulated in revisited output blocks;
    the lax.map chunk loop and its [Tc,E,P,120] XLA transients disappear."""
    from yaik_tpu.encoder.jax_scoring import FACTOR
    T, P, _ = tiles.shape
    E = mode48.shape[1]
    steps = ((1, 64), (2, 32), (4, 16), (8, 8))

    Pb = 1024            # 2048 exceeds the 16 MB scoped-vmem stack limit
    tb = Pb // P
    padT = (-T) % tb
    Tp = T + padT

    def padt(x):
        return jnp.pad(x, [(0, padT)] + [(0, 0)] * (x.ndim - 1))

    ab = jnp.concatenate(
        [padt(a_c).astype(jnp.float32).reshape(Tp * P, 3),
         padt(b_c).astype(jnp.float32).reshape(Tp * P, 3),
         jnp.zeros((Tp * P, 2), jnp.float32)], axis=1)          # [N,8]
    mn_r = jnp.repeat(padt(mn).astype(jnp.int32), P, axis=0)    # [N,3]
    d_r = jnp.repeat(padt(d).astype(jnp.int32), P, axis=0)
    tmd = jnp.concatenate(
        [padt(tiles).astype(jnp.int32).reshape(Tp * P, 3),
         padt(alive).astype(jnp.int32).reshape(Tp * P, 1),
         mn_r, d_r, jnp.zeros((Tp * P, 6), jnp.int32)],
        axis=1)                                                 # [N,16]
    m48p = jnp.pad(padt(mode48).astype(jnp.float32),
                   ((0, 0), (0, 128 - E)))                      # [Tp,128]

    # packed 120-lane point/factor tables (window order = steps order)
    sf = jnp.concatenate([pts_sub[:, ::st][:, :n] for st, n in steps],
                         axis=1).astype(jnp.float32)            # [E,120,3]
    sfm = jnp.pad(sf.transpose(0, 2, 1), ((0, 0), (0, 0), (0, 8)))
    ff = jnp.concatenate(
        [factors[3 - bi][:, :n] for bi, (st, n) in enumerate(steps)],
        axis=1).astype(jnp.float32)                             # [E,120,3]
    ffm = jnp.pad(ff.transpose(0, 2, 1), ((0, 0), (0, 0), (0, 8)))

    ngrid = Tp // tb
    idx_out, meta_out = pl.pallas_call(
        partial(_values48_kernel, P, E, float(FACTOR)),
        out_shape=(jax.ShapeDtypeStruct((ngrid, Pb, 1), jnp.int32),
                   jax.ShapeDtypeStruct((ngrid, tb, 8), jnp.int32)),
        grid=(ngrid, E),
        in_specs=[
            pl.BlockSpec((Pb, 8), lambda i, e: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Pb, 16), lambda i, e: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 128), lambda i, e: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 128), lambda i, e: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 128), lambda i, e: (e, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, Pb, 1), lambda i, e: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tb, 8), lambda i, e: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(ab, tmd, m48p, sfm, ffm)
    idx_sel = idx_out.reshape(Tp, P)[:T]
    meta = meta_out.reshape(Tp, 8)[:T]
    return meta[:, 4] != 0, meta[:, 5], idx_sel
