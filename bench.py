#!/usr/bin/env python3
"""yaik_tpu benchmark: decode throughput on the local accelerator, with
verified outputs.

Measurement rules (VERDICT r1: a benchmark that can silently report
physically impossible numbers is worse than none):
  - every dispatch consumes MATERIALLY DIFFERENT inputs (two distinct
    reference-encoded 512x512 streams, alternated) so the runtime can
    never coalesce identical calls;
  - every timed path is validated by a position-weighted u32 checksum of
    the decoded pixels against the reference decoder's golden output,
    computed on device and fetched (4 bytes) - decode work is a data
    dependency of the number we time;
  - the device figure is rejected if its implied pixel-write bandwidth
    exceeds 1 TB/s (v5e HBM ceiling), in which case the end-to-end figure
    becomes the headline.

Prints ONE JSON line:
  {"metric": "decode_throughput", "value": N, "unit": "MPix/s",
   "vs_baseline": N/125, ...}
vs_baseline: driver target is >= 1 GPix/s aggregate on a v5e-8
(BASELINE.json) = 125 MPix/s per chip. Reported alongside:
  device_mpix_s   - K decode steps chained on device (one dispatch, a
                    fori_loop with a carried checksum: no step can be
                    elided), one 4-byte fetch
  synced_mpix_s   - per-step dispatch + checksum fetch (includes tunnel
                    round-trip per step; the honest interactive figure)
  e2e_mpix_s      - decode_corpus: host planning + device decode + output
                    download, pipelined (planner-inclusive per VERDICT r1)
"""
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from yaik_tpu.decoder import jax_engine, planner  # noqa: E402
from yaik_tpu.format import lut as lutmod  # noqa: E402

FIX = pathlib.Path(__file__).parent / "tests" / "fixtures"
BATCH = int(os.environ.get("YAIK_BENCH_BATCH", "32"))
STEPS = int(os.environ.get("YAIK_BENCH_STEPS", "64"))
SYNC_STEPS = int(os.environ.get("YAIK_BENCH_SYNC_STEPS", "6"))
E2E_IMAGES = int(os.environ.get("YAIK_BENCH_E2E_IMAGES", "32"))
MAX_WRITE_BYTES_S = 1.0e12     # v5e HBM ceiling: harder than any real rate


def _checksum_weights(h, w):
    flat = np.arange(h * w * 3, dtype=np.uint64)
    return ((flat * 2654435761) % (1 << 32)).astype(np.uint32).reshape(
        h, w, 3)


def main():
    lut_data = (FIX / "LutFile.lut").read_bytes()
    expanded = lutmod.expand_lut(lutmod.parse_lut_file(lut_data))

    names = ("img512", "img512b")
    streams = {n: (FIX / f"{n}.yaik").read_bytes() for n in names}
    want = {n: np.load(FIX / f"{n}.dec.npz")["rgb"] for n in names}

    t0 = time.perf_counter()
    plans = {n: planner.build_plan(streams[n], expanded) for n in names}
    host_plan_ms = (time.perf_counter() - t0) / len(names) * 1e3

    w, h = plans["img512"].width, plans["img512"].height
    pix_batch = BATCH * w * h
    wgt = _checksum_weights(h, w)
    chk_img = {n: int((want[n].astype(np.uint64) * wgt).sum() % (1 << 32))
               for n in names}
    chk_batch = {n: (BATCH * chk_img[n]) % (1 << 32) for n in names}

    shifts = None
    dev_args = {}
    for n in names:
        shifts, tab, args = jax_engine.plan_to_device_args(plans[n], expanded)

        def rep(x):
            x = np.asarray(x)
            return np.broadcast_to(x[None], (BATCH,) + x.shape).copy()

        dev_args[n] = jax.tree.map(rep, args)
    nargs = len(dev_args["img512"])
    stacked = jax.tree.map(lambda a, b: np.stack([a, b]),
                           dev_args["img512"], dev_args["img512b"])

    wgt_dev = jax.device_put(wgt)
    tab = jax.device_put(np.asarray(tab))
    stacked = jax.device_put(stacked)

    vdec = jax.vmap(lambda t, *a: jax_engine.decode_core(shifts, t, *a),
                    in_axes=(None,) + (0,) * nargs)

    def batch_chk(t, *a):
        out = vdec(t, *a)
        return jnp.sum(out.astype(jnp.uint32) * wgt_dev[None],
                       dtype=jnp.uint32)

    # --- device throughput: K steps chained in ONE dispatch -------------
    @jax.jit
    def pipeline(salt, t, stk):
        def body(i, carry):
            args_i = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, i % 2, keepdims=False), stk)
            return carry + batch_chk(t, *args_i)
        return jax.lax.fori_loop(0, STEPS, body, salt)

    def run_pipeline(salt):
        r = pipeline(jnp.uint32(salt), tab, stacked)
        got = int(r)
        expect = (salt + (STEPS + 1) // 2 * chk_batch["img512"]
                  + STEPS // 2 * chk_batch["img512b"]) % (1 << 32)
        return got == expect

    ok_warm = run_pipeline(1)           # compile + correctness
    t0 = time.perf_counter()
    ok_timed = run_pipeline(2)          # different salt: distinct dispatch
    dt_pipe = time.perf_counter() - t0
    checksum_ok = bool(ok_warm and ok_timed)
    device_mpix_s = STEPS * pix_batch / dt_pipe / 1e6
    implied_write = device_mpix_s * 1e6 * 3          # bytes/s of u8 RGB out
    plausible = implied_write <= MAX_WRITE_BYTES_S

    # --- synced per-step dispatches (includes per-call round trip) ------
    step_fn = jax.jit(batch_chk)
    sync_times = []
    sync_ok = True
    seq = [names[i % 2] for i in range(SYNC_STEPS)]
    for n in seq:   # warm both variants first
        int(step_fn(tab, *jax.tree.map(jax.device_put, dev_args[n])))
    dev_batches = {n: jax.device_put(dev_args[n]) for n in names}
    for n in seq:
        t0 = time.perf_counter()
        got = int(step_fn(tab, *dev_batches[n]))
        sync_times.append(time.perf_counter() - t0)
        sync_ok &= got == chk_batch[n]
    synced_mpix_s = pix_batch / float(np.median(sync_times)) / 1e6
    checksum_ok = checksum_ok and sync_ok

    # --- end to end: planning + decode + download, pipelined ------------
    from yaik_tpu.parallel.batch import decode_corpus
    corpus = [streams[names[i % 2]] for i in range(E2E_IMAGES)]
    golden = [want[names[i % 2]] for i in range(E2E_IMAGES)]
    e2e_batch = min(8, E2E_IMAGES)
    decode_corpus(corpus[:e2e_batch], expanded,
                  batch_size=e2e_batch)     # warm the compiled executable
    t0 = time.perf_counter()
    results = decode_corpus(corpus, expanded, batch_size=e2e_batch)
    dt_e2e = time.perf_counter() - t0
    e2e_ok = all(np.array_equal(r, g) for r, g in zip(results, golden))
    checksum_ok = checksum_ok and e2e_ok
    e2e_mpix_s = E2E_IMAGES * w * h / dt_e2e / 1e6

    value = device_mpix_s if plausible else e2e_mpix_s
    info = {
        "metric": "decode_throughput",
        "value": round(value, 2),
        "unit": "MPix/s",
        "vs_baseline": round(value / 125.0, 3),
        "device_mpix_s": round(device_mpix_s, 2),
        "synced_mpix_s": round(synced_mpix_s, 2),
        "e2e_mpix_s": round(e2e_mpix_s, 2),
        "host_plan_ms_per_img": round(host_plan_ms, 2),
        "checksum_ok": checksum_ok,
        "plausible": plausible,
        "batch": BATCH,
        "steps": STEPS,
    }
    if not checksum_ok:
        info["value"] = 0.0
        info["vs_baseline"] = 0.0
        info["error"] = "output checksum mismatch - numbers not trustworthy"
    print(json.dumps(info))
    print(f"# backend={jax.devices()[0].platform} img={w}x{h} "
          f"pipe={dt_pipe*1e3:.1f}ms/{STEPS}steps "
          f"sync_median={np.median(sync_times)*1e3:.1f}ms "
          f"e2e={dt_e2e*1e3:.0f}ms/{E2E_IMAGES}imgs", file=sys.stderr)


if __name__ == "__main__":
    main()
