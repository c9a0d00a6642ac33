"""YAIK_ZSTD_WORKERS: the multi-core entropy-stage claim, tested.

The production encode-throughput story rests on fanning the per-image
zstd-18 stream batch over N threads (encoder/context.py:_ZstdBatch.run);
these tests pin that the fan-out changes BYTES not at all — each stream
is an independent one-shot ZSTD_compressCCtx with a per-thread context,
so worker count must be invisible in the output (reference zstd call
sites: EncoderContext.cpp:3697 level 18, :1590 alpha sweep).
"""
import numpy as np
import pytest
from PIL import Image

from tests.conftest import FIXTURES
from yaik_tpu.encoder import bank as bankmod
from yaik_tpu.encoder.context import _ZstdBatch, encode_image


@pytest.fixture(scope="module")
def bank():
    return bankmod.load_bank(str(FIXTURES / "Bank3D"))


@pytest.mark.parametrize("png,mode", [("img128", "RGB"),
                                      ("sprite256", "RGBA")])
def test_encode_byte_identity_across_workers(monkeypatch, bank, png, mode):
    """Full encode (RGB incl. the fixed-18 streams; RGBA incl. the alpha
    5..21 level sweep) with YAIK_ZSTD_WORKERS=4 is byte-identical to the
    single-threaded path."""
    img = np.asarray(Image.open(FIXTURES / f"{png}.png").convert(mode))
    monkeypatch.delenv("YAIK_ZSTD_WORKERS", raising=False)
    base = encode_image(img, bank)
    monkeypatch.setenv("YAIK_ZSTD_WORKERS", "4")
    multi = encode_image(img, bank)
    assert base == multi


def test_emit_workers_byte_identity(monkeypatch, bank):
    """YAIK_EMIT_WORKERS fans the WHOLE per-image emission over threads
    (encoder/batch.py): corpus output must be byte-identical to the
    serial path - on any host, including this 1-core one where threads
    merely interleave."""
    from yaik_tpu.encoder.batch import encode_corpus
    img = np.asarray(Image.open(FIXTURES / "img128.png").convert("RGB"))
    corpus = [np.ascontiguousarray(np.roll(img, 8 * (i + 1), axis=1))
              for i in range(4)]
    monkeypatch.delenv("YAIK_EMIT_WORKERS", raising=False)
    base = encode_corpus(corpus, bank, batch_size=4)
    monkeypatch.setenv("YAIK_EMIT_WORKERS", "3")
    multi = encode_corpus(corpus, bank, batch_size=4)
    assert base == multi


def test_zstd_batch_results_identical_and_ordered(monkeypatch):
    """_ZstdBatch.run at every worker count returns the same bytes in the
    same slot order (the emission assemblers index results by handle)."""
    rng = np.random.default_rng(7)
    jobs = []
    for i in range(24):
        # mix of compressible and noisy payloads, varied sizes
        if i % 3:
            d = np.repeat(rng.integers(0, 9, 200 + 37 * i), 11
                          ).astype(np.uint8).tobytes()
        else:
            d = rng.integers(0, 256, 500 + 100 * i).astype(np.uint8
                                                           ).tobytes()
        jobs.append((d, 18 if i % 4 else 5))
    outs = {}
    for n in (0, 2, 3, 8):
        monkeypatch.setenv("YAIK_ZSTD_WORKERS", str(n))
        zb = _ZstdBatch()
        handles = [zb.add(d, lv) for d, lv in jobs]
        zb.run()
        outs[n] = [zb.get(h) for h in handles]
    for n in (2, 3, 8):
        assert outs[n] == outs[0], f"workers={n} diverged"
