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
    """All 7 gradient passes on device; returns (accept grids np, claims)."""
    accepts = []
    for (sx, sy) in swizzle.GRADIENT_PASS_ORDER:
        acc, claims_dev = jax_scoring.gradient_pass_device(
            planes_dev, claims_dev, sx, sy, reject_factor)
        # transfer immediately: the axon runtime wedges when asked to
        # fetch an older buffer after newer computations were enqueued
        accepts.append(np.asarray(acc))
    return accepts, claims_dev


# pixel budget per device chunk (bounds the [Tc,P,E,48,8,3] transient)
_CHUNK_PX = 262144


def _chunks(T, P):
    tc = max(1, _CHUNK_PX // P)
    return tc, (T + tc - 1) // tc


def run_tile3d_scoring(planes, claims, tables):
    """All 6 3D passes: hybrid host/device (see module docstring).

    planes: np [3,H,W] i32; claims: np [3,H,W] bool (mutated in place).
    Returns a list of per-pass dicts (accept/type/bbox/idx/mask as numpy).
    """
    qpts, pts, factors = tables
    _, h, w = planes.shape
    results = []
    for (sx, sy) in swizzle.TILE3D_PASS_ORDER:
        tw, th = 1 << sx, 1 << sy
        ntx, nty = w // tw, h // th
        T, P = nty * ntx, th * tw

        tiles = planes[:, :nty * th, :ntx * tw].reshape(3, nty, th, ntx, tw)
        tiles = tiles.transpose(1, 3, 2, 4, 0).reshape(T, P, 3)
        cm = claims.all(axis=0)[:nty * th, :ntx * tw]
        mask = cm.reshape(nty, th, ntx, tw).transpose(0, 2, 1, 3).reshape(T, P)
        alive = ~mask

        cnt = alive.sum(axis=1)
        mn = np.where(alive[:, :, None], tiles, 999).min(axis=1)
        mx = np.where(alive[:, :, None], tiles, -999).max(axis=1)
        d = mx - mn
        pre = (cnt > 0) & ((d == 0).sum(axis=1) <= 1)

        # float32 normalizations on host (exact IEEE, matches C)
        nvec = np.where(d > 0, (1 << 20) // np.maximum(d, 1), 0)
        r = (tiles - mn[:, None, :]) * nvec[:, None, :]
        fr = r.astype(np.float32) / np.float32(1 << 20)
        c = (fr * np.float32(63)).astype(np.int32)

        rel = (tiles - mn[:, None, :]).astype(np.float32)
        dd = np.maximum(d, 1).astype(np.float32)
        rel = np.where(d[:, None, :] > 0, rel / dd[:, None, :], rel)
        rel = rel * np.float32(63)
        a_c = rel.astype(np.int32)
        b_c = (np.float32(63) - rel).astype(np.int32)

        tc, nch = _chunks(T, P)
        pad = nch * tc - T

        def padded(x, fill=0):
            return np.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                          constant_values=fill)

        # slim dtypes for the tunnel: coords fit i16 (masked-pixel garbage
        # clipped; those lanes are never read), pixels are u8
        clip16 = lambda x: np.clip(x, -32768, 32767).astype(np.int16)
        c_p, alive_p = clip16(padded(c)), padded(alive)
        tiles_p = padded(tiles).astype(np.uint8)
        a_p, b_p = clip16(padded(a_c)), clip16(padded(b_c))
        mn_p, d_p = padded(mn).astype(np.int16), padded(d).astype(np.int16)

        accept = np.zeros(nch * tc, bool)
        types = np.zeros(nch * tc, np.int32)
        idx_sel = np.zeros((nch * tc, P), np.int32)
        for ci in range(nch):
            s = slice(ci * tc, (ci + 1) * tc)
            acc_c, type_c, idx_c = jax_scoring.tile3d_pass_hybrid(
                tiles_p[s], alive_p[s], c_p[s], a_p[s], b_p[s],
                mn_p[s], d_p[s], qpts, pts, factors)
            accept[s] = np.asarray(acc_c)
            types[s] = np.asarray(type_c)
            idx_sel[s] = np.asarray(idx_c)

        accept = accept[:T] & pre
        types, idx_sel = types[:T], idx_sel[:T]
        bbox = np.concatenate([mn, mx], axis=1)
        results.append({"shift": (sx, sy), "accept": accept, "type": types,
                        "bbox": bbox, "idx": idx_sel, "mask": mask})

        up = np.repeat(np.repeat(accept.reshape(nty, ntx), th, 0), tw, 1)
        claims[:, :nty * th, :ntx * tw] |= up[None]
    return results


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

        for i in np.flatnonzero(valid & inside):
            tx, ty = int(tx_all[i]), int(ty_all[i])
            gid = ty * ntx + tx
            if not accept[gid]:
                continue
            bits[i] = True
            streams["color"] += bytes(int(v) for v in bbox[gid])
            streams["type"].append(int(types[gid]))
            bit = ((int(types[gid]) >> 14) & 3) + 3
            slots = order[~mask[gid][order]]
            streams[bit] += idx[gid][slots].astype(np.uint8).tobytes()

        packed = np.frombuffer(swizzle.pack_bitmap(bits), np.uint8)
        m = streams["maps"][(sx, sy)]
        m[:len(packed)] |= packed
