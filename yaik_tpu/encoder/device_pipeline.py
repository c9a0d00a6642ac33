"""Device-scored encode pipeline.

The O(pixels) work - gradient variant scoring and the 3D-LUT tile search
(every tile x every LUT x 48 patterns) - runs on the accelerator
(encoder.jax_scoring); the host keeps the O(tiles) sequential parts
(scan-order corner dedup, stream cursors, palette + zstd entropy, chunk mux)
AND the float32 normalizations + pattern argmin: this TPU's f32 divide is up
to 2 ulp off IEEE, so those few scalar-ish float steps run on x86 to stay
bit-identical with the C reference. Everything device-side is integer.
Produces byte-identical streams to the host pipeline (tested)."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from yaik_tpu.encoder import bank as bankmod
from yaik_tpu.encoder import jax_scoring
from yaik_tpu.format import swizzle


def bank_device_tables(bank: bankmod.Bank):
    """Pack the bank into device arrays: (qpts [E,48,8,3], pts [E,64,3],
    factors [4,E,64,3] for bits 3,4,5,6 at indices 0..3)."""
    E = bank.count
    pts = np.zeros((E, 64, 3), np.int32)
    for e, p in enumerate(bank.points):
        pts[e, :len(p)] = p
    qpts = jax_scoring.transformed_points(pts[:, ::8][:, :8])
    factors = np.zeros((4, E, 64, 3), np.int32)
    for e, ctx in enumerate(bank.ctxs):
        for bi, bit in enumerate((3, 4, 5, 6)):
            t = ctx.factors[bit]
            factors[bi, e, :t.shape[0]] = t
    return (jnp.asarray(qpts), jnp.asarray(pts), jnp.asarray(factors))


def run_gradient_scoring(planes_dev, claims_dev, reject_factor):
    """All 7 gradient passes in one device dispatch; returns
    (accept grids as numpy, final claims)."""
    accepts, claims_dev = jax_scoring.gradient_all_device(
        planes_dev, claims_dev, reject_factor)
    # transfer immediately: the axon runtime wedges when asked to fetch
    # older buffers after newer computations were enqueued
    return [np.asarray(a) for a in accepts], claims_dev


import jax.numpy as _jnp
from functools import partial as _partial


@_partial(jax.jit, static_argnames=("sx", "sy"))
def _resident_packed(planes, claims, qpts, pts, factors, sx, sy):
    """One resident 3D pass; outputs packed into a single u8 array
    [T, P+9] = (idx | mask<<6)(P) | acc(1) | typ(2) | bbox(6) - one
    device->host transfer per pass, ~1 byte/pixel (the tunnel charges
    ~100ms + ~30MB/s per transfer; idx is 6 bits, mask 1)."""
    accept, typ, idx, mask, mn, mx, claims = \
        jax_scoring.tile3d_pass_resident.__wrapped__(
            planes, claims, qpts, pts, factors, sx, sy)
    T, P = idx.shape
    packed = _jnp.concatenate([
        (idx | (mask.astype(_jnp.int32) << 6)).astype(_jnp.uint8),
        accept.astype(_jnp.uint8)[:, None],
        (typ & 0xFF).astype(_jnp.uint8)[:, None],
        ((typ >> 8) & 0xFF).astype(_jnp.uint8)[:, None],
        mn.astype(_jnp.uint8), mx.astype(_jnp.uint8)], axis=1)
    return packed, claims


def _unpack_pass(packed, P):
    im = packed[:, :P]
    idx = (im & 63).astype(np.int32)
    mask = (im >> 6).astype(bool)
    accept = packed[:, P].astype(bool)
    typ = (packed[:, P + 1].astype(np.int32)
           | (packed[:, P + 2].astype(np.int32) << 8))
    bbox = packed[:, P + 3:P + 9].astype(np.int32)
    return idx, mask, accept, typ, bbox


@jax.jit
def _tile3d_all(planes, claims, qpts, pts, factors):
    """All six 3D size passes in ONE dispatch (claims evolve in-graph);
    outputs one packed u8 vector per pass."""
    outs = []
    for (sx, sy) in [(4, 3), (3, 4), (3, 3), (3, 2), (2, 3), (2, 2)]:
        packed, claims = _resident_packed.__wrapped__(
            planes, claims, qpts, pts, factors, sx, sy)
        outs.append(packed.reshape(-1))
    return jnp.concatenate(outs), claims


def run_tile3d_scoring(planes_dev, claims_dev, tables):
    """All 6 3D passes fully device-resident in a single dispatch
    (planes/claims never leave the device; normalizations are exact
    on-device - see tile3d_pass_resident). Returns
    (list of per-pass dicts as numpy, final claims device array)."""
    qpts, pts, factors = tables
    _, h, w = planes_dev.shape
    packed_all, claims_dev = _tile3d_all(planes_dev, claims_dev,
                                         qpts, pts, factors)
    packed_all = np.asarray(packed_all)
    results, off = [], 0
    for (sx, sy) in swizzle.TILE3D_PASS_ORDER:
        tw, th = 1 << sx, 1 << sy
        P = tw * th
        T = (h // th) * (w // tw)
        n = T * (P + 9)
        packed = packed_all[off:off + n].reshape(T, P + 9)
        off += n
        idx, mask, accept, typ, bbox = _unpack_pass(packed, P)
        results.append({"shift": (sx, sy), "accept": accept, "type": typ,
                        "bbox": bbox, "idx": idx, "mask": mask})
    return results, claims_dev


def emit_tile3d_streams(results, w, h, streams):
    """Host emission from device 3D scoring outputs: scan-order stream
    append identical to corr3d.run_pass."""
    for res in results:
        sx, sy = res["shift"]
        tw, th = 1 << sx, 1 << sy
        ntx = w // tw
        accept = res["accept"]
        types = res["type"]
        bbox = res["bbox"]
        idx = res["idx"]
        mask = res["mask"]

        tx_all, ty_all, valid = swizzle.tile_scan_coords(sx, sy, w, h)
        inside = ((tx_all + 1) * tw <= w) & ((ty_all + 1) * th <= h)
        bits = np.zeros(tx_all.shape[0], bool)
        # slot order within a tile: xa 8-col blocks, then rows, then cols
        # (computeValues3D iteration, EncoderContext.cpp:5854-5860)
        if tw > 8:
            order = []
            for xa in range(2):
                for y in range(th):
                    for x in range(8):
                        order.append(y * tw + xa * 8 + x)
            order = np.asarray(order)
        else:
            order = np.arange(th * tw)

        # vectorized scan-order emission (bit-identical to the old per-tile
        # loop): accepted tiles in scan order, colors/types appended per
        # tile, per-bit index streams built from the slot-reordered
        # (idx, mask) rows - the row-major ravel of [tile, slot] preserves
        # both the tile order and the within-tile slot order
        sel = np.flatnonzero(valid & inside)
        gids = ty_all[sel].astype(np.int64) * ntx + tx_all[sel]
        acc = accept[gids].astype(bool)
        sel = sel[acc]
        gids = gids[acc]
        if gids.size:
            bits[sel] = True
            streams["color"] += bbox[gids].astype(np.uint8).tobytes()
            tvals = types[gids].astype(np.int64)
            streams["type"].extend(int(t) for t in tvals)
            idxo = idx[gids][:, order]
            masko = mask[gids][:, order].astype(bool)
            bit_arr = ((tvals >> 14) & 3) + 3
            for bit in (3, 4, 5, 6):
                tb = bit_arr == bit
                if tb.any():
                    rows = idxo[tb]
                    streams[bit] += rows[~masko[tb]].astype(
                        np.uint8).tobytes()

        packed = np.frombuffer(swizzle.pack_bitmap(bits), np.uint8)
        m = streams["maps"][(sx, sy)]
        m[:len(packed)] |= packed
