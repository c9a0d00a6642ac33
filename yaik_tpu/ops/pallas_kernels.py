"""Pallas TPU kernels for the codec hot paths.

lut3d_resolve (decode): the 3D-LUT reconstruction
    out[g, p, c] = (mn[g, c] + ((diff[g, c] * lut[g, idx[g, p], c]) >> 7)) & 0xFF

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

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, lut0_ref, lut1_ref, lut2_ref, col_ref,
            out0_ref, out1_ref, out2_ref):
    idx = idx_ref[:].astype(jnp.int32)                    # [BG, P]
    k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 64), 2)
    oh = idx[:, :, None] == k                             # [BG, P, 64] VMEM
    col = col_ref[:].astype(jnp.int32)                    # [BG, 8]
    for c, (lut_ref, out_ref) in enumerate(((lut0_ref, out0_ref),
                                            (lut1_ref, out1_ref),
                                            (lut2_ref, out2_ref))):
        lut = lut_ref[:].astype(jnp.int32)                # [BG, 64]
        L = jnp.where(oh, lut[:, None, :], 0).sum(axis=2)  # [BG, P]
        mn = col[:, c][:, None]
        diff = col[:, c + 3][:, None] - mn
        out_ref[:] = (mn + ((diff * L) >> 7)) & 0xFF


@partial(jax.jit, static_argnames=("interpret",))
def lut3d_resolve(indices, luts, colors, interpret=False):
    """indices [G, P] u8 (entry ids), luts [G, 64, 3] u8, colors [G, 6] i32.
    Returns [G, P, 3] i32 reconstructed values (mask/assembly done by the
    caller)."""
    g, p = indices.shape
    bg = max(1, 2048 // p)
    pad = (-g) % bg
    idx = jnp.pad(indices, ((0, pad), (0, 0)))
    lutp = jnp.pad(luts, ((0, pad), (0, 0), (0, 0)))
    col = jnp.pad(colors, ((0, pad), (0, 2)))             # 6 -> 8 lanes
    grid = ((g + pad) // bg,)

    blk2 = lambda n: pl.BlockSpec((bg, n), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((g + pad, p), jnp.int32)
                        for _ in range(3)),
        grid=grid,
        in_specs=[blk2(p), blk2(64), blk2(64), blk2(64), blk2(8)],
        out_specs=(blk2(p), blk2(p), blk2(p)),
        interpret=interpret,
    )(idx, lutp[:, :, 0], lutp[:, :, 1], lutp[:, :, 2], col)
    return jnp.stack([o[:g] for o in outs], axis=-1)


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
