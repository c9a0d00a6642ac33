#!/usr/bin/env python3
"""Regenerate tests/fixtures/bench_encode_golden.json ANCHORED TO THE
REFERENCE ENCODER (VERDICT r3 #7): every CRC comes from a stream produced
by the compiled C++ reference (tools/refbuild/ref_encoder) on the exact
bench encode corpus, so the bench lane certifies reference parity, not
merely stability since our own golden generation.

The pixel checksums are computed by OUR host decoder on the reference
streams (entropy-independent); the byte CRCs are the reference's. Our
encoder matching these CRCs == byte-identical to the reference on all
ENC_IMAGES bench images (the strongest parity statement the lane can make).

Runs the reference encoder once per image in a scratch dir seeded with the
Bank3D fixtures (it reloads + re-sorts the LUT bank per process - slow,
one-time cost). Requires tools/build_reference.sh products.
"""
import json
import os
import pathlib
import shutil
import subprocess
import sys
import tempfile
import zlib

import numpy as np
from PIL import Image

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from yaik_tpu.decoder import reference as refdec  # noqa: E402
from yaik_tpu.format import lut as lutmod  # noqa: E402
from yaik_tpu.format.headers import normalize_stream  # noqa: E402

FIX = REPO / "tests" / "fixtures"
REFBUILD = REPO / "tools" / "refbuild"


def main():
    sys.path.insert(0, str(REPO))
    import bench
    enc = REFBUILD / "ref_encoder"
    if not enc.exists():
        print("ref_encoder missing; run tools/build_reference.sh", file=sys.stderr)
        return 2
    names = ("img512", "img512b")
    base = [np.asarray(Image.open(FIX / f"{n}.png").convert("RGB"))
            for n in names]
    n_img = bench.ENC_IMAGES
    corpus = [bench._enc_variant(base[i % 2], i) for i in range(n_img)]
    h, w = corpus[0].shape[:2]
    wgt = bench._checksum_weights(h, w)
    expanded = lutmod.expand_lut(
        lutmod.parse_lut_file((FIX / "LutFile.lut").read_bytes()))

    pix, crcs = [], []
    with tempfile.TemporaryDirectory() as td:
        tdp = pathlib.Path(td)
        shutil.copytree(FIX / "Bank3D", tdp / "Bank3D")
        for i, img in enumerate(corpus):
            png = tdp / f"b{i}.png"
            Image.fromarray(img).save(png)
            out = tdp / f"b{i}.yaik"
            r = subprocess.run([str(enc), str(png), str(out)], cwd=td,
                               stdout=subprocess.DEVNULL,
                               stderr=subprocess.DEVNULL, timeout=600)
            if r.returncode != 0 or not out.exists():
                print(f"image {i}: ref_encoder rc={r.returncode}",
                      file=sys.stderr)
                return 3
            ystream = out.read_bytes()
            rgb = refdec.decode(ystream, expanded)
            pix.append(int((rgb.astype(np.uint64) * wgt).sum() % (1 << 32)))
            # CRC over the NORMALIZED stream: the reference writes two
            # uninitialized header bytes (normalize_stream docstring)
            crcs.append(zlib.crc32(normalize_stream(ystream)) & 0xFFFFFFFF)
            os.unlink(png)
            os.unlink(out)
            if i % 8 == 0:
                print(f"{i + 1}/{n_img} reference-encoded", flush=True)

    gold = {"n": n_img, "zstd_ref": True, "provenance": "reference",
            "pix": pix, "bytes": crcs}
    gpath = FIX / "bench_encode_golden.json"
    gpath.write_text(json.dumps(gold))
    print(f"wrote {gpath} (provenance=reference, n={n_img})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
