"""values48 Pallas kernel == jax_scoring.tile3d_values_device, bit-exact.

The values stage is the encoder's dominant device cost (~76 of 128 ms per
8-image batch, tools/profile_encode_hlo.py); the kernel replaces the
lax.map chunk loop. Byte identity of encoded streams rides on this
function's exact integer semantics (EncoderContext.cpp:5807-6094), so the
test sweeps both tile sizes, random permutation/flip modes, dead pixels,
and all-dead tiles, comparing every output against the XLA form in
interpret mode.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from yaik_tpu.encoder.jax_scoring import tile3d_values_device
from yaik_tpu.ops.pallas_kernels import values48


def _rand_inputs(rng, T, P, E):
    tiles = rng.integers(0, 256, (T, P, 3)).astype(np.int32)
    alive = rng.random((T, P)) < 0.7
    alive[T // 2] = False                      # one all-dead tile
    a_c = rng.integers(0, 64, (T, P, 3)).astype(np.int32)
    b_c = np.clip(63 - a_c - rng.integers(0, 2, (T, P, 3)), 0,
                  63).astype(np.int32)
    # dead pixels can carry WILD normalizations upstream (the caller's
    # magic-multiply wraps i32 when tiles < mn) and their idx bytes are
    # still emitted for accepted tiles - cover that class
    wild = rng.random((T, P, 3)) < 0.05
    a_c = np.where(wild & ~alive[:, :, None],
                   rng.integers(-(1 << 24), 1 << 24, (T, P, 3)), a_c
                   ).astype(np.int32)
    b_c = np.where(wild & ~alive[:, :, None],
                   rng.integers(-(1 << 24), 1 << 24, (T, P, 3)), b_c
                   ).astype(np.int32)
    mode48 = rng.integers(0, 48, (T, E)).astype(np.int32)
    mn = rng.integers(0, 200, (T, 3)).astype(np.int32)
    d = rng.integers(1, 128, (T, 3)).astype(np.int32)
    pts = rng.integers(0, 64, (E, 64, 3)).astype(np.int32)
    factors = rng.integers(0, 128, (4, E, 64, 3)).astype(np.int32)
    return tiles, alive, a_c, b_c, mode48, mn, d, pts, factors


@pytest.mark.parametrize("P", [16, 32, 64, 128])
def test_values48_matches_xla(P):
    # all four production pass sizes: P = tw*th for TILE3D_PASS_ORDER's
    # 16x8/8x16 (128), 8x8 (64), 8x4/4x8 (32), 4x4 (16) - the tb = Pb//P
    # reshapes differ per P, so every size the flag could run is pinned
    rng = np.random.default_rng(5 + P)
    T, E = 70, 12                              # pad path: 70 % tb != 0
    args = _rand_inputs(rng, T, P, E)
    jargs = [jnp.asarray(a) for a in args]
    ref_acc, ref_type, ref_idx = (np.asarray(x) for x in
                                  tile3d_values_device(*jargs))
    got_acc, got_type, got_idx = (np.asarray(x) for x in
                                  values48(*jargs, interpret=True))
    assert np.array_equal(got_acc, ref_acc)
    # tile_type/idx of unaccepted tiles also replicated (the e0/window-0
    # seed) so the comparison is total, not accept-masked
    assert np.array_equal(got_type, ref_type)
    assert np.array_equal(got_idx, ref_idx)


def test_values48_all_skip():
    """No tile accepts any LUT: outputs still replicate the XLA tail."""
    rng = np.random.default_rng(9)
    T, P, E = 20, 16, 3
    args = list(_rand_inputs(rng, T, P, E))
    args[1] = np.ones((T, P), bool)         # no all-dead tile: a dead tile
    # accepts trivially (ldiff == 0), which is not the case under test
    args[8] = np.full((4, E, 64, 3), 4000, np.int32)    # absurd factors
    jargs = [jnp.asarray(a) for a in args]
    ref = [np.asarray(x) for x in tile3d_values_device(*jargs)]
    got = [np.asarray(x) for x in values48(*jargs, interpret=True)]
    assert not ref[0].any()
    for g, r in zip(got, ref):
        assert np.array_equal(g, r)
