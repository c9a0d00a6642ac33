"""Pallas TPU kernels for the decode hot path.

lut3d_resolve: the 3D-LUT reconstruction
    out[g, p, c] = (mn[g, c] + ((diff[g, c] * lut[g, idx[g, p], c]) >> 7)) & 0xFF

The XLA formulation (decoder.jax_engine._tile3d_pass) materializes the
one-hot [G, P, 64] f32 tensor in HBM before the batched matmul; this kernel
keeps the expansion in VMEM, streaming only idx/lut/colors in and pixels
out. Numerically identical (integer select-accumulate, no floats).
Channels are handled as separate 2D [G, 64] tables - Mosaic lowers 2D
broadcasts/reductions cleanly where 3D reshapes would fall to gathers.
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
