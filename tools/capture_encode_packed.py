#!/usr/bin/env python3
"""Capture one batched device-scoring output to disk so host emission can
be profiled/optimized OFFLINE (no tunnel, no TPU) — emission is pure host
work on the downloaded blob. Writes /tmp/yaik_encode_capture.npz.
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from yaik_tpu.encoder import bank as bankmod  # noqa: E402
from yaik_tpu.encoder import batch as encbatch  # noqa: E402
from yaik_tpu.encoder import device_pipeline as devp  # noqa: E402
from yaik_tpu.encoder.context import EncoderConfig  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from profile_encode import make_images  # noqa: E402

FIX = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"
B, SIZE = 8, 512


def main():
    import jax
    print("backend:", jax.devices()[0].platform, flush=True)
    bank = bankmod.load_bank(str(FIX / "Bank3D"))
    cfg = EncoderConfig()
    tables = devp.bank_device_tables(bank)
    imgs = make_images(B, SIZE)
    caps = devp.pass_caps(SIZE, SIZE)
    t0 = time.perf_counter()
    pall = encbatch._dispatch_batch(imgs, None, cfg, tables, caps)
    flat = np.asarray(pall)
    print(f"compile+dispatch+download {time.perf_counter()-t0:.1f}s, "
          f"blob {flat.nbytes/2**20:.2f} MB", flush=True)
    # re-dispatch until caps fit (mirror _drain_adaptive) so the offline
    # blob emits without overflow fallbacks
    G = encbatch._grad_packed_len(SIZE, SIZE)
    while True:
        per_pass = devp.unpack_compact(flat[:, G:], SIZE, SIZE, caps)
        fit = devp.caps_fit(per_pass, caps, SIZE, SIZE)
        if fit == caps:
            break
        caps = fit
        pall = encbatch._dispatch_batch(imgs, None, cfg, tables, caps)
        flat = np.asarray(pall)
        print("re-dispatched with caps", caps, flush=True)
    np.savez("/tmp/yaik_encode_capture.npz",
             flat=flat, imgs=np.stack(imgs),
             caps=np.asarray(caps, np.int64))
    # sanity: emission works and matches encode_image
    streams = encbatch._emit_batch(imgs, flat, bank, cfg, caps=tuple(
        map(tuple, caps)))
    print("emitted", len(streams), "streams,",
          [len(s) for s in streams[:3]], flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        encbatch._emit_batch(imgs, flat, bank, cfg, caps=tuple(
            map(tuple, caps)))
    dt = (time.perf_counter() - t0) / 3
    print(f"warm emit: {1e3*dt:.1f} ms/batch = "
          f"{B*SIZE*SIZE/1e6/dt:.2f} MPix/s emission-only", flush=True)


if __name__ == "__main__":
    main()
