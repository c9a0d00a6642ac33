#!/usr/bin/env python3
"""Stage-level profile of the batched device encoder on the live backend.

Breaks one encode_corpus-style batch into upload / device-scoring /
download / host-emission and prints per-stage ms plus the implied MPix/s,
so perf work targets the real bottleneck (VERDICT r1 #3).
"""
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from yaik_tpu.encoder import bank as bankmod  # noqa: E402
from yaik_tpu.encoder import batch as encbatch  # noqa: E402
from yaik_tpu.encoder import device_pipeline as devp  # noqa: E402
from yaik_tpu.encoder.context import EncoderConfig  # noqa: E402

FIX = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"
B = int(os.environ.get("B", "8"))
SIZE = int(os.environ.get("SIZE", "512"))


def make_images(n, size, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    imgs = []
    for i in range(n):
        # mix of gradients (gradient-tile food), quantized blobs (3D-LUT
        # food) and noise (1D leftovers) - roughly game-art-like statistics
        img = np.zeros((size, size, 3), np.float32)
        img[:, :, 0] = (yy / size) * 200 + i * 3
        img[:, :, 1] = (xx / size) * 180
        img[:, :, 2] = ((xx + yy) / (2 * size)) * 160 + 40
        cx, cy = rng.integers(size // 4, 3 * size // 4, 2)
        r = ((yy - cy) ** 2 + (xx - cx) ** 2) ** 0.5
        img[:, :, 1] += np.where(r < size // 4, 40.0, 0.0)
        noise = rng.normal(0, 18, (size // 4, size // 4, 3))
        y0 = (i * 32) % (size // 2)
        img[y0:y0 + size // 4, :size // 4] += noise
        imgs.append(np.clip(img, 0, 255).astype(np.uint8))
    return imgs


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    bank = bankmod.load_bank(str(FIX / "Bank3D"))
    cfg = EncoderConfig()
    tables = devp.bank_device_tables(bank)
    imgs = make_images(B, SIZE)
    mpix = B * SIZE * SIZE / 1e6

    # warm compile
    t0 = time.perf_counter()
    pall = encbatch._dispatch_batch(imgs, None, cfg, tables)
    pall.block_until_ready()
    print(f"compile+first dispatch: {time.perf_counter()-t0:.1f}s", flush=True)
    _ = encbatch._emit_batch(imgs, pall, bank, cfg)

    for rep in range(3):
        t0 = time.perf_counter()
        h1 = encbatch._dispatch_batch(imgs, None, cfg, tables)
        h1.block_until_ready()
        t_disp = time.perf_counter()
        a = np.asarray(h1)
        t_down = time.perf_counter()
        streams = encbatch._emit_batch(imgs, a, bank, cfg)
        t_emit = time.perf_counter()
        total = t_emit - t0
        print(f"rep{rep}: up+device {1e3*(t_disp-t0):7.1f}ms  "
              f"download {1e3*(t_down-t_disp):7.1f}ms "
              f"({a.nbytes/2**20:.2f}MB)  "
              f"emit {1e3*(t_emit-t_down):7.1f}ms  "
              f"total {total:6.2f}s = {mpix/total:5.2f} MPix/s", flush=True)

    # pipelined rate (the corpus scheduler overlaps emit with device work)
    n_im = 24
    corpus = make_images(n_im, SIZE, seed=11)
    t0 = time.perf_counter()
    outs = encbatch.encode_corpus(corpus, bank, cfg, batch_size=B)
    dt = time.perf_counter() - t0
    print(f"encode_corpus {n_im}x{SIZE}^2 warm: {dt:.2f}s = "
          f"{n_im*SIZE*SIZE/1e6/dt:.2f} MPix/s", flush=True)
    sizes = [len(s) for s in streams]
    print("stream bytes:", sizes[:4], "bpp:",
          round(sum(sizes) * 8 / (mpix * 1e6), 2))


if __name__ == "__main__":
    main()
