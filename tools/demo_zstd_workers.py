#!/usr/bin/env python3
"""Measure the encoder's entropy-stage (zstd-18 batch flush) wall time vs
YAIK_ZSTD_WORKERS — the multi-core scaling curve of the per-image stream
batch (encoder/context.py:_ZstdBatch).

Like tools/demo_planner_scaling.py this is a harness that produces the
curve on WHATEVER host it runs on: on the 1-core bench rig the curve is
flat/negative (threads cannot add cores), on an N-core production host it
shows the min(N_cores x per-core-zstd, device-scoring) encode model's
entropy term directly. Byte identity across worker counts is asserted on
every configuration (it is also pinned by tests/test_zstd_workers.py).

Usage: python tools/demo_zstd_workers.py [n_images] [reps]
Prints one JSON line: {"streams_per_img": ..., "ms_per_img": {N: ms}}.
"""
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

FIX = pathlib.Path(__file__).parent.parent / "tests" / "fixtures"


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from yaik_tpu.encoder import bank as bankmod
    from yaik_tpu.encoder.context import _ZstdBatch, encode_image

    bank = bankmod.load_bank(str(FIX / "Bank3D"))
    base = np.asarray(Image.open(FIX / "img512.png").convert("RGB"))
    os.environ.pop("YAIK_ZSTD_WORKERS", None)

    # queue the REAL per-image stream batches for n_images distinct images
    # (rolls keep tile alignment; each image contributes its own ~28
    # streams), then time ONLY the flush under each worker count
    zb = _ZstdBatch()
    assemblers = []
    for i in range(n_images):
        img = np.ascontiguousarray(np.roll(base, 8 * (i + 1), axis=1))
        assemblers.append(encode_image(img, bank, _defer=zb))
    print(f"# queued {len(zb.jobs)} streams for {n_images} images "
          f"({sum(len(j[0]) for j in zb.jobs)} raw bytes)", file=sys.stderr)

    results = {}
    golden = None
    for n in (0, 2, 4, 8):
        os.environ["YAIK_ZSTD_WORKERS"] = str(n)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            zb.run()
            times.append(time.perf_counter() - t0)
        if golden is None:
            golden = list(zb.results)
        assert zb.results == golden, f"workers={n}: bytes diverged"
        results[n] = round(float(np.median(times)) / n_images * 1e3, 2)
        print(f"# workers={n}: {results[n]:.2f} ms/img "
              f"(median of {reps})", file=sys.stderr)
    os.environ.pop("YAIK_ZSTD_WORKERS", None)

    print(json.dumps({
        "metric": "zstd_flush_ms_per_img",
        "n_images": n_images,
        "streams_per_img": len(zb.jobs) // n_images,
        "nproc": os.cpu_count(),
        "ms_per_img": results,
    }))


if __name__ == "__main__":
    main()
