"""Merged-2DTL decode path (t2_merge_plan + _tile2d_merged_pass).

The six 2DTL passes (3 modes x {8x8, 4x4}, _T2_ORDER) re-block onto the
uniform 4x4 grid as <= 2 priority layers, each ONE fused-kernel dispatch
(interpret mode here) - the round-5 t2dl family-lane win (306 -> ~550
MPix/s chained). These tests pin byte-identity of the merged packing
against the sequential per-(mode, size) XLA path, on the committed
fixture streams AND on synthetic overlapping passes that force layer 1.
Ref: the dead Tile2D_* decoders (see decoder/reference.py:
_tile2d_size_pass); layering analog of t3_merge_plan.
"""
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp
import pytest

from yaik_tpu.decoder import jax_engine as je
from yaik_tpu.decoder import planner
from yaik_tpu.format import lut as lmod

FIX = Path(__file__).parent / "fixtures"


def _luts2d():
    return lmod.expand_lut2d(
        lmod.parse_lut2d_file((FIX / "LutFile2D.lut").read_bytes()))


def _legacy_apply(plane, tab2, entries):
    for k, (mode, (sx, sy)) in enumerate(je._T2_ORDER):
        plane = je._tile2d_pass(plane, tab2, *entries[k], mode, sx, sy)
    return plane


def _merged_apply(plane, tab3, layers):
    return je._tile2d_merged_pass(plane, tab3, layers, _interpret=True)


def _dict_apply(plane, tab3, packed_t2):
    return je._tile2d_merged2_pass(plane, tab3, packed_t2, _interpret=True)


@pytest.mark.parametrize("fname", ["corr2d128.2d.yaik", "bench_2d512.yaik"])
def test_merged_t2_matches_legacy_on_fixture(fname):
    exp2d = _luts2d()
    expanded = lmod.expand_lut(
        lmod.parse_lut_file((FIX / "LutFile.lut").read_bytes()))
    stream = (FIX / fname).read_bytes()
    plan = planner.build_plan(stream, expanded, exp2d)
    assert plan.tile2d, "fixture must carry 2DTL passes"
    _, _, args_leg = je.plan_to_device_args(plan, expanded, exp2d,
                                            t2_merged=False)
    _, _, args_mrg = je.plan_to_device_args(plan, expanded, exp2d,
                                            t2_merged="gather")
    tab2, entries = args_leg[11]
    tab3, layers = args_mrg[11]
    assert len(entries) == 6 and len(layers) == 2
    assert isinstance(layers[0], tuple)
    rng = np.random.default_rng(7)
    plane0 = jnp.asarray(rng.integers(
        0, 1 << 24, (plan.height, plan.width)).astype(np.uint32))
    want = np.asarray(_legacy_apply(plane0, jnp.asarray(np.asarray(tab2)),
                                    entries))
    got = np.asarray(_merged_apply(plane0, jnp.asarray(np.asarray(tab3)),
                                   layers))
    assert np.array_equal(got, want)
    # dict-packed single-dispatch form (the default on TPU)
    pk = je._t2_pack_dict(layers, exp2d)
    assert pk is not None
    got2 = np.asarray(_dict_apply(plane0, jnp.asarray(np.asarray(tab3)),
                                  pk))
    assert np.array_equal(got2, want)


def _synth_pass(rng, mode, shift, nty, ntx, accept):
    tw, th = 1 << shift[0], 1 << shift[1]
    g = nty * ntx
    types = ((rng.integers(0, 4, g) << 14)
             | rng.integers(0, 8, g)).astype(np.int64)
    colors = rng.integers(0, 256, (g, 4)).astype(np.uint8)
    packed = (rng.integers(0, 64, (g, th * tw))
              | (rng.integers(0, 2, (g, th * tw)) << 6)).astype(np.uint8)
    return planner.Tile2DPassPlan(mode=mode, shift=shift, accept=accept,
                                  types=types, colors=colors,
                                  packed=packed)


def test_merged_t2_overlap_layers_and_fallback():
    """Overlapping passes land on layer 1 in _T2_ORDER priority; three
    overlapping passes exceed max_layers and return None (legacy
    fallback)."""
    exp2d = _luts2d()
    rng = np.random.default_rng(11)
    h = w = 64
    nty8, ntx8 = h // 8, w // 8
    nty4, ntx4 = h // 4, w // 4
    acc8 = rng.random((nty8, ntx8)) < 0.7
    acc4 = rng.random((nty4, ntx4)) < 0.7   # overlaps acc8 heavily
    passes = [
        _synth_pass(rng, 0, (3, 3), nty8, ntx8, acc8),
        _synth_pass(rng, 1, (2, 2), nty4, ntx4, acc4),
    ]
    plan = SimpleNamespace(height=h, width=w, tile2d=passes)
    layers = je.t2_merge_plan(plan, exp2d)
    assert layers is not None
    assert layers[1][0].any(), "overlap must populate layer 1"
    # byte-identity incl. the priority ordering
    tab2, _ = je.lut2d_device_table(exp2d)
    tab3, _ = je.lut2d_device_table3(exp2d)
    by_key = {(p.mode, p.shift): p for p in passes}
    entries = []
    for mode, (sx, sy) in je._T2_ORDER:
        tw, th = 1 << sx, 1 << sy
        ntx, nty = w // tw, h // th
        g = nty * ntx
        p = by_key.get((mode, (sx, sy)))
        if p is None:
            entries.append((np.zeros((nty, ntx), bool),
                            np.zeros(g, np.int32),
                            np.zeros((g, 4), np.uint8),
                            np.zeros((g, th * tw), np.uint8)))
        else:
            _, bases2 = je.lut2d_device_table(exp2d)
            entries.append((p.accept, je._t2_rows_full(p, exp2d, bases2),
                            p.colors, p.packed))
    plane0 = jnp.asarray(rng.integers(0, 1 << 24, (h, w)).astype(np.uint32))
    want = np.asarray(_legacy_apply(plane0, jnp.asarray(np.asarray(tab2)),
                                    tuple(entries)))
    got = np.asarray(_merged_apply(plane0, jnp.asarray(np.asarray(tab3)),
                                   layers))
    assert np.array_equal(got, want)
    # dict-packed form on OVERLAPPING layers: the per-channel in-kernel
    # compose (chan=True) must reproduce the partial-channel override
    # (layer 1 wins only on ITS channels; a whole-word compose would
    # clobber layer 0's other channels)
    pk = je._t2_pack_dict(layers, exp2d)
    assert pk is not None
    got2 = np.asarray(_dict_apply(plane0, jnp.asarray(np.asarray(tab3)),
                                  pk))
    assert np.array_equal(got2, want)
    # three passes on one block: infeasible -> None
    full = np.ones((nty4, ntx4), bool)
    plan3 = SimpleNamespace(height=h, width=w, tile2d=[
        _synth_pass(rng, m, (2, 2), nty4, ntx4, full) for m in (0, 1, 2)])
    assert je.t2_merge_plan(plan3, exp2d) is None
