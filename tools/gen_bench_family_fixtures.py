#!/usr/bin/env python3
"""Generate the committed bench streams for the non-RGB chunk-family lanes
(VERDICT r3 #5): RGBA (MIPM+ALPM), UCOL+SMAP overlay, 2DTL, and the 4K
3DTX stream for the banded-decode lane. Streams come from OUR encoder
(whose byte-parity with the reference is certified separately by the
encode lane goldens / parity tests); the host decoder provides each
lane's golden pixels at bench time.

Deterministic content derived from the img512 fixture. Run once; outputs
land in tests/fixtures/bench_*.yaik (small, committed).
"""
import pathlib
import sys

import numpy as np
from PIL import Image

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from yaik_tpu.decoder import reference as refdec  # noqa: E402
from yaik_tpu.encoder import bank as bankmod  # noqa: E402
from yaik_tpu.encoder import bank2d as bank2dmod  # noqa: E402
from yaik_tpu.encoder.context import EncoderConfig, encode_image  # noqa: E402
from yaik_tpu.format import lut as lutmod  # noqa: E402

FIX = REPO / "tests" / "fixtures"


def rgba512(img):
    """img512 + analog alpha with an all-zero 64x64 corner (emits MIPM +
    8-bit ALPM under the default config)."""
    h, w = img.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    a = (255 * (0.25 + 0.75 * (xx + yy) / (w + h))).astype(np.uint8)
    a[:64, :64] = 0
    return np.dstack([img, a])


def main():
    bank = bankmod.load_bank(str(FIX / "Bank3D"))
    bank2d = bank2dmod.load_bank2d(str(FIX / "Bank2D"))
    expanded = lutmod.expand_lut(
        lutmod.parse_lut_file((FIX / "LutFile.lut").read_bytes()))
    img = np.asarray(Image.open(FIX / "img512.png").convert("RGB"))

    only = sys.argv[1] if len(sys.argv) > 1 else None

    if only in (None, "rgba"):
        st = encode_image(rgba512(img), bank)
        (FIX / "bench_rgba512.yaik").write_bytes(st)
        out = refdec.decode(st, expanded)
        assert out.shape[2] == 4
        print("bench_rgba512.yaik", len(st), flush=True)

    if only in (None, "ucol"):
        # posterize a quadrant so UCOL accepts colors; SMAP stays enabled
        # for the overlay path
        im2 = img.copy()
        im2[:256, :256] = (im2[:256, :256] // 64) * 64
        cfg = EncoderConfig(enable_single_color=True, enable_smooth_map=True)
        st = encode_image(im2, bank, cfg)
        (FIX / "bench_ucol512.yaik").write_bytes(st)
        refdec.decode(st, expanded)
        print("bench_ucol512.yaik", len(st), flush=True)

    if only in (None, "2d"):
        cfg = EncoderConfig(enable_2d=True)
        st = encode_image(img, bank, cfg, bank2d=bank2d)
        (FIX / "bench_2d512.yaik").write_bytes(st)
        lut2 = lutmod.expand_lut2d(lutmod.parse_lut2d_file(
            (FIX / "LutFile2D.lut").read_bytes()))
        refdec.decode(st, expanded, lut2)
        print("bench_2d512.yaik", len(st), flush=True)

    if only in (None, "4k"):
        # 3840x2160: tiled art content (rolls of img512) so every chunk
        # family appears; the stream uses the u32 3DTX extension
        big = np.zeros((2160, 3840, 3), np.uint8)
        for by in range(0, 2160, 512):
            for bx in range(0, 3840, 512):
                v = np.roll(np.roll(img, bx // 64, 1), by // 64, 0)
                big[by:by + 512, bx:bx + 512] = v[: 2160 - by, : 3840 - bx]
        from yaik_tpu.encoder.batch import encode_image_banded
        st = encode_image_banded(big, bank)   # device-banded scoring
        (FIX / "bench_4k.yaik").write_bytes(st)
        print("bench_4k.yaik", len(st), flush=True)


if __name__ == "__main__":
    main()
