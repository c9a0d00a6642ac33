#!/usr/bin/env python3
"""yaik_tpu benchmark: device decode throughput on the local accelerator.

Decodes a batch of 512x512 textures (reference-encoded fixture stream) via
the TPU decode engine, steady-state timed. Prints ONE JSON line:
  {"metric": "decode_throughput", "value": MPix/s, "unit": "MPix/s",
   "vs_baseline": value / 125.0}

Baseline: the driver target is >= 1 GPix/s aggregate on a v5e-8
(BASELINE.json), i.e. 125 MPix/s per chip; the C++ reference publishes no
numbers of its own (BASELINE.md).
"""
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

from yaik_tpu.decoder import jax_engine, planner  # noqa: E402
from yaik_tpu.format import lut as lutmod  # noqa: E402

FIX = pathlib.Path(__file__).parent / "tests" / "fixtures"
BATCH = int(os.environ.get("YAIK_BENCH_BATCH", "32"))
STEPS = int(os.environ.get("YAIK_BENCH_STEPS", "20"))


def main():
    stream = (FIX / "img512.yaik").read_bytes()
    lut_data = (FIX / "LutFile.lut").read_bytes()
    expanded = lutmod.expand_lut(lutmod.parse_lut_file(lut_data))

    t_host0 = time.perf_counter()
    plan = planner.build_plan(stream, expanded)
    t_host = time.perf_counter() - t_host0

    shifts, tab, args = jax_engine.plan_to_device_args(plan, expanded)

    def rep(x):
        x = np.asarray(x)
        return np.broadcast_to(x[None], (BATCH,) + x.shape).copy()

    b_args = jax.tree.map(rep, args)

    fn = jax.jit(jax.vmap(lambda t, *a: jax_engine.decode_core(shifts, t, *a),
                 in_axes=(None,) + (0,) * len(b_args)))
    dev_args = jax.device_put(b_args)
    out = fn(tab, *dev_args)       # compile
    out.block_until_ready()

    # steady state
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(tab, *dev_args)
        out.block_until_ready()   # per-call: the axon runtime coalesces
    dt = time.perf_counter() - t0  # identical queued calls otherwise

    pix = BATCH * plan.width * plan.height * STEPS
    mpix_s = pix / dt / 1e6
    info = {
        "metric": "decode_throughput",
        "value": round(mpix_s, 2),
        "unit": "MPix/s",
        "vs_baseline": round(mpix_s / 125.0, 3),
    }
    print(json.dumps(info))
    print(f"# backend={jax.devices()[0].platform} batch={BATCH} steps={STEPS} "
          f"host_plan={t_host*1e3:.1f}ms img={plan.width}x{plan.height}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
