"""Compacted 3D-download encode path (device -> host link carries accept
bitmaps + only accepted tiles' rows, in swizzle-scan order).

Byte-parity with the host engine on the CPU backend, including the
cap-overflow fallback to the single-image full-download path.
Matches: the encoder hot-loop scan order (EncoderContext.cpp:6245-6779)
and stream cursor semantics (:7316-7660).
"""
import numpy as np
import pytest
from PIL import Image

from tests.conftest import FIXTURES
from yaik_tpu.encoder import bank as bankmod

pytestmark = pytest.mark.slow   # CPU-backend batch-scoring compiles
from yaik_tpu.encoder import device_pipeline as devp
from yaik_tpu.encoder.batch import _all_batch_compact_fn, encode_corpus
from yaik_tpu.encoder.context import EncoderConfig, encode_image


@pytest.fixture(scope="module")
def bank():
    return bankmod.load_bank(str(FIXTURES / "Bank3D"))


def test_corpus_compact_parity(bank):
    img = np.asarray(Image.open(FIXTURES / "img64.png"))
    img128 = np.asarray(Image.open(FIXTURES / "img128.png"))
    h64 = encode_image(img, bank, engine="host")
    h128 = encode_image(img128, bank, engine="host")
    sts = encode_corpus([img, img128, img, img128], bank, batch_size=2)
    assert sts[0] == h64 and sts[2] == h64
    assert sts[1] == h128 and sts[3] == h128


def test_overflow_escalates_and_matches(bank, monkeypatch):
    """Tiny caps force every pass to overflow; the corpus path must grow
    the caps to fit (caps_fit escalation loop), stay byte-identical to the
    host engine, and remember the learned caps for later batches."""
    from yaik_tpu.encoder import batch as encbatch
    _all_batch_compact_fn.cache_clear()
    real = devp.pass_caps

    def tiny_caps(w, h, scale=1):
        return tuple((1, 1) for _ in real(w, h))

    monkeypatch.setattr(devp, "pass_caps", tiny_caps)
    try:
        encbatch._CAP_STATE.clear()
        img = np.asarray(Image.open(FIXTURES / "img64.png"))
        want = encode_image(img, bank, engine="host")
        got = encode_corpus([img, img], bank, batch_size=2)
        assert got[0] == want and got[1] == want
        learned = encbatch._CAP_STATE.get((64, 64, 3))
        assert learned is not None and all(
            s >= 1 and d >= 1 for s, d in learned)
        assert any(s > 1 or d > 1 for s, d in learned)
    finally:
        encbatch._CAP_STATE.clear()
        _all_batch_compact_fn.cache_clear()


def test_adaptive_caps_noise_parity(bank):
    """Pure noise (gradients claim nothing, every 3D pass ~all-alive)
    overflows the art-tuned T/8 caps; the adaptive path must stay
    byte-identical to single-image host encode."""
    from yaik_tpu.encoder import batch as encbatch
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (64, 64, 3), np.uint8) for _ in range(3)]
    encbatch._CAP_STATE.clear()
    try:
        outs = encode_corpus(imgs, bank, batch_size=2)
        for im, got in zip(imgs, outs):
            assert got == encode_image(im, bank, engine="host")
        assert (64, 64, 3) in encbatch._CAP_STATE
    finally:
        encbatch._CAP_STATE.clear()


def test_device_score_gate_falls_back(bank, monkeypatch):
    """Images above DEVICE_SCORE_MAX_PIX must bypass device scoring (the
    3D scorer's [T,P,3] channel-minor temps OOM HBM past ~2 MPix) and
    host-encode byte-identically, through both entry points."""
    from yaik_tpu.encoder import batch as encbatch
    monkeypatch.setattr(encbatch, "DEVICE_SCORE_MAX_PIX", 1)
    img = np.asarray(Image.open(FIXTURES / "img64.png"))
    want = encode_image(img, bank, engine="host")
    assert encbatch.encode_batch([img, img], bank) == [want, want]
    assert encode_corpus([img, img], bank, batch_size=2) == [want, want]


def test_caps_sane():
    caps = devp.pass_caps(512, 512)
    assert len(caps) == 6
    assert all(s >= 64 and d >= 64 and s >= d for s, d in caps)
    # compact layout round-trips: bits + counts + rows offsets must tile the
    # flat buffer exactly (unpack_compact asserts by construction)
    total = 0
    for (sx, sy), (scap, dcap) in zip(
            [(4, 3), (3, 4), (3, 3), (3, 2), (2, 3), (2, 2)], caps):
        P = (1 << sx) * (1 << sy)
        _, gids = devp._scan_perm(sx, sy, 512, 512)
        total += -(-gids.shape[0] // 8) + 8 + dcap * (P + 9)
    assert total < 300_000      # ~0.28 MB/image vs 1.9 MB full download


@pytest.mark.slow
def test_banded_device_scoring_byte_identical(monkeypatch):
    """encode_image_banded (the past-the-gate path, VERDICT r3 #2) must
    produce the exact host-engine bytes; forced tiny per-dispatch ceiling
    exercises 3 bands incl. a short remainder."""
    from yaik_tpu.encoder import batch as encbatch
    bank = bankmod.load_bank(str(FIXTURES / "Bank3D"))
    img = np.asarray(Image.open(FIXTURES / "img128.png"))
    monkeypatch.setattr(encbatch, "DEVICE_SCORE_MAX_PIX", 128 * 48)
    banded = encbatch.encode_image_banded(img, bank)
    host = encode_image(img, bank, engine="host")
    assert banded == host
    # the corpus path routes oversized images through the banded encoder
    via_corpus = encbatch.encode_corpus([img], bank, batch_size=2)
    assert via_corpus[0] == host


@pytest.mark.nightly
def test_encode_corpus_mesh_dp_byte_identical(bank):
    """encode_corpus(mesh=...) shards the scoring batch over the mesh's
    data axis (shard_map, no collectives); streams must equal the
    unsharded encode bit-for-bit. Nightly: ~2.5 min of CPU-mesh compiles;
    the multichip dryrun's axis 6 covers the same path every round."""
    import jax
    from jax.sharding import Mesh

    img = np.asarray(Image.open(FIXTURES / "img64.png").convert("RGB"))
    imgs = [np.ascontiguousarray(np.roll(img, 8 * i, axis=1))
            for i in range(8)]
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    plain = encode_corpus(imgs, bank, batch_size=4)
    sharded = encode_corpus(imgs, bank, batch_size=4, mesh=mesh)
    assert all(a == b for a, b in zip(plain, sharded))


def test_encode_banded_mesh_byte_identical(bank):
    """encode_image_banded_mesh: every band scored in one mesh-sharded
    dispatch; bytes must equal host-engine encode exactly, including the
    replicated-last-row halo at the image bottom (h not a multiple of
    n_bands * 16 exercises the pad-band slicing)."""
    import jax
    from jax.sharding import Mesh

    from yaik_tpu.encoder import batch as encbatch
    img = np.asarray(Image.open(FIXTURES / "img128.png").convert("RGB"))
    # 96 rows over a 4-device mesh: bh rounds to 32, so band 3 is ALL pad
    # (its grids must be discarded) and band 2's halo is the replicated
    # bottom row - both edge paths exercised
    img = img[:96]
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    got = encbatch.encode_image_banded_mesh(img, bank, mesh=mesh)
    want = encode_image(img, bank, engine="host")
    assert got == want
