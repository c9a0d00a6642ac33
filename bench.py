#!/usr/bin/env python3
"""yaik_tpu benchmark: decode throughput on the local accelerator, with
verified outputs.

Measurement rules (VERDICT r1: a benchmark that can silently report
physically impossible numbers is worse than none):
  - every step consumes MATERIALLY DIFFERENT inputs: two distinct
    reference-encoded 512x512 streams alternate, AND each step perturbs
    the 1D-pass color0 params by a salt derived from the PREVIOUS step's
    output checksum - a true data dependence that no compiler can hoist
    out of the loop (XLA demonstrably hoists loop-invariant decode bodies);
    the expected checksum chain is simulated on the host from the plan +
    the reference-decoded goldens, so validation stays exact;
  - every timed path is validated by a position-weighted u32 checksum of
    the decoded pixels against the reference decoder's golden output,
    computed on device and fetched (4 bytes) - decode work is a data
    dependency of the number we time;
  - the device figure is rejected if its implied pixel-write bandwidth
    exceeds 1 TB/s (v5e HBM ceiling) OR if the chained dispatch fails to
    scale with the step count (dt(K) < 1.6 * dt(K/2) means the chain was
    collapsed by the compiler/runtime - the round-1 failure mode); either
    way the end-to-end figure becomes the headline.

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
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# Persist TPU compilations across bench runs: the scoring-bundle and
# chained-decode executables take minutes to build and are identical run
# to run (same jaxpr, same chip). First run pays the compiles; driver and
# repeat runs load from the cache.
jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).parent / ".jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from yaik_tpu.decoder import jax_engine, planner  # noqa: E402
from yaik_tpu.format import lut as lutmod  # noqa: E402

FIX = pathlib.Path(__file__).parent / "tests" / "fixtures"
BATCH = int(os.environ.get("YAIK_BENCH_BATCH", "128"))
# Round 2 measured 64 > 32/128 (608 vs 585/592 MPix/s) and pinned 64; the
# round-3/4 fusions (T3 layer merge, merged gradient kernel, composed
# T3+1D blend) changed the per-pass fixed-cost/working-set balance and the
# re-measured chained sweep now scales monotonically: 1192/1449/1537
# MPix/s at B=32/64/128 (same session, salted chain). The old b128
# regression no longer reproduces.
STEPS = int(os.environ.get("YAIK_BENCH_STEPS", "64"))
SYNC_STEPS = int(os.environ.get("YAIK_BENCH_SYNC_STEPS", "6"))
E2E_IMAGES = int(os.environ.get("YAIK_BENCH_E2E_IMAGES", "32"))
ENC_IMAGES = int(os.environ.get("YAIK_BENCH_ENC_IMAGES", "96"))
ENC_BATCH = int(os.environ.get("YAIK_BENCH_ENC_BATCH", "8"))
# resident scoring batch: 8 -> 16 -> 32 measured 29.7 / 33.2 / 35.6
# MPix/s after the round-5 values-stage rewrite (fixed costs amortize;
# the lane is device-resident so no tunnel penalty); 32 pinned
ESC_BATCH = int(os.environ.get("YAIK_BENCH_ESC_BATCH", "32"))
ESC_STEPS = int(os.environ.get("YAIK_BENCH_ESC_STEPS", "12"))
MAX_WRITE_BYTES_S = 1.0e12     # v5e HBM ceiling: harder than any real rate


def _enc_variant(img, i):
    """Deterministic, materially distinct corpus member i: rolls by
    multiples of 8 keep tile alignment (every stream differs; the encoder
    sees fresh tile statistics each image), flips add orientation
    variety."""
    v = np.roll(img, 8 * ((i * 7) % 63 + 1), axis=1)
    v = np.roll(v, 8 * ((i * 5) % 63 + 1), axis=0)
    if i % 3 == 1:
        v = v[::-1]
    elif i % 3 == 2:
        v = v[:, ::-1]
    return np.ascontiguousarray(v)


def run_encode_lane(names, wgt, w, h, gen_golden=False):
    """Encode ENC_IMAGES distinct 512^2 images through the pipelined
    device encoder (the other half of the BASELINE metric). Every produced
    stream is validated: host-decoded pixels must match per-image golden
    checksums (entropy-backend-independent - zstd is lossless), and when
    the bit-exact vendored zstd is loaded the stream BYTES must match
    golden CRCs too. Returns (encode_mpix_s, ok, bytes_checked)."""
    import zlib

    from PIL import Image

    from yaik_tpu.decoder import reference as refdec
    from yaik_tpu.encoder import bank as bankmod
    from yaik_tpu.encoder.batch import encode_corpus
    from yaik_tpu.entropy import zstd_backend
    from yaik_tpu.format import lut as lutmod
    from yaik_tpu.format.headers import normalize_stream

    expanded = lutmod.expand_lut(
        lutmod.parse_lut_file((FIX / "LutFile.lut").read_bytes()))
    bank = bankmod.load_bank(str(FIX / "Bank3D"))
    base = [np.asarray(Image.open(FIX / f"{n}.png").convert("RGB"))
            for n in names]
    corpus = [_enc_variant(base[i % 2], i) for i in range(ENC_IMAGES)]

    encode_corpus(corpus[: 2 * ENC_BATCH], bank,
                  batch_size=ENC_BATCH)                 # compile + warm
    t0 = time.perf_counter()
    streams_out = encode_corpus(corpus, bank, batch_size=ENC_BATCH)
    dt = time.perf_counter() - t0
    encode_mpix_s = ENC_IMAGES * w * h / dt / 1e6

    gpath = FIX / "bench_encode_golden.json"
    if gen_golden:
        # self-anchored fallback (provenance "self" = the lane certifies
        # stability since golden generation). The reference-anchored golden
        # (provenance "reference", tools/gen_ref_encode_golden.py) makes
        # the same CRC check certify byte-parity with the C++ reference
        # encoder on every bench image - prefer it when refbuild exists.
        pix = []
        for st in streams_out:
            rgb = refdec.decode(st, expanded)
            pix.append(int((rgb.astype(np.uint64) * wgt).sum() % (1 << 32)))
        gold = {"n": ENC_IMAGES,
                "zstd_ref": bool(zstd_backend.IS_REFERENCE_ZSTD),
                "provenance": "self",
                "pix": pix,
                "bytes": [zlib.crc32(normalize_stream(st)) & 0xFFFFFFFF
                          for st in streams_out]}
        gpath.write_text(json.dumps(gold))
        print(f"# wrote {gpath}", file=sys.stderr)
        return encode_mpix_s, True, zstd_backend.IS_REFERENCE_ZSTD, "self"

    gold = json.loads(gpath.read_text())
    anchor = gold.get("provenance", "self")
    ok = True
    bytes_checked = bool(zstd_backend.IS_REFERENCE_ZSTD
                         and gold.get("zstd_ref"))
    for i, st in enumerate(streams_out[: gold["n"]]):
        rgb = refdec.decode(st, expanded)
        chk = int((rgb.astype(np.uint64) * wgt).sum() % (1 << 32))
        ok &= chk == gold["pix"][i]
        if bytes_checked:
            crc = zlib.crc32(normalize_stream(st)) & 0xFFFFFFFF
            ok &= crc == gold["bytes"][i]
    return encode_mpix_s, ok, bytes_checked, anchor


def run_encode_scoring_lane(names):
    """Device-resident encode SCORING rate (the production figure the e2e
    encode lane cannot show on this rig: its 96 x 786 KB image uploads ride
    a ~45 MB/s tunnel that does not exist on a real deployment). B art
    images stay resident in HBM; K chained steps each run the full device
    scoring bundle (7 gradient passes + all six 3D passes, compacted
    outputs) on planes salted by the PREVIOUS step's output checksum - a
    data dependence no compiler can hoist - and one 4-byte checksum
    returns. Validated against per-salt checksums fetched individually.
    Returns {"mpix_s", "ok"}."""
    from PIL import Image

    from yaik_tpu.encoder import bank as bankmod
    from yaik_tpu.encoder import batch as encbatch
    from yaik_tpu.encoder import device_pipeline as devp
    from yaik_tpu.encoder.context import EncoderConfig

    B, K, NSALT = ESC_BATCH, ESC_STEPS, 4
    bank = bankmod.load_bank(str(FIX / "Bank3D"))
    cfg = EncoderConfig()
    qpts, pts, factors = devp.bank_device_tables(bank)
    base = [np.asarray(Image.open(FIX / f"{n}.png").convert("RGB"))
            for n in names]
    imgs = [_enc_variant(base[i % 2], i) for i in range(B)]
    h, w = imgs[0].shape[:2]
    caps = devp.pass_caps(w, h)
    core = encbatch._all_batch_compact_fn(cfg.reject_factor, caps).__wrapped__
    perms = encbatch._perms_device(w, h)

    fn = encbatch._all_batch_compact_fn(cfg.reject_factor, caps)
    p8_h = np.ascontiguousarray(np.stack(
        [im.transpose(2, 0, 1) for im in imgs]))
    p8 = jax.device_put(p8_h)
    L = int(fn(p8, qpts, pts, factors, perms).shape[1])
    w8_h = ((np.arange(L, dtype=np.uint64) * 2654435761)
            % (1 << 32)).astype(np.uint32)
    w8 = jnp.asarray(w8_h)
    SALTS = [0, 7, 19, 83]
    salts = jnp.asarray(SALTS, jnp.uint8)

    def step_chk(p, s):
        out = core((p + salts[s]).astype(jnp.uint8), qpts, pts, factors,
                   perms)
        return jnp.sum(out.astype(jnp.uint32) * w8[None], dtype=jnp.uint32)

    # expected per-salt checksums: the plain (already-jitted) bundle runs
    # once per salt and the weighted sum is taken on host - one compile
    # total instead of three
    chk_s = []
    for s in SALTS:
        outs = np.asarray(fn(jax.device_put((p8_h + np.uint8(s))
                                            .astype(np.uint8)),
                             qpts, pts, factors, perms))
        chk_s.append(int((outs.astype(np.uint64)
                          * w8_h[None].astype(np.uint64)).sum() % (1 << 32)))

    @jax.jit
    def chain(carry0, p, nsteps):
        # dynamic step count (lowers to while_loop): ONE compile covers the
        # full run and the half-length elision guard - the scoring bundle
        # takes ~2.5 min to compile and three static variants would
        # dominate bench wall time
        def body(i, carry):
            s = (carry & (NSALT - 1)).astype(jnp.int32)
            return carry + step_chk(p, s)
        return jax.lax.fori_loop(0, nsteps, body, carry0)

    def run(seed, nsteps):
        got = int(chain(jnp.uint32(seed), p8, jnp.int32(nsteps)))
        carry = seed
        for _ in range(nsteps):
            carry = (carry + chk_s[carry & (NSALT - 1)]) % (1 << 32)
        return got == carry

    ok = run(1, K)                                   # compile + correctness
    t0 = time.perf_counter()
    ok &= run(2, K // 2)
    dt_half = time.perf_counter() - t0
    t0 = time.perf_counter()
    ok &= run(3, K)
    dt = time.perf_counter() - t0
    scales = dt >= 1.6 * dt_half
    mpix = K * B * w * h / dt / 1e6
    return {"mpix_s": round(mpix, 2), "ok": bool(ok and scales)}


def _checksum_weights(h, w, c=3):
    flat = np.arange(h * w * c, dtype=np.uint64)
    return ((flat * 2654435761) % (1 << 32)).astype(np.uint32).reshape(
        h, w, c)


# 32 amortizes the per-step dispatch tail like the RGB lane's b128 does
# (t2dl measured 1326 -> 1735 MPix/s going 16 -> 32, round-5 extension)
FAMILY_BATCH = int(os.environ.get("YAIK_BENCH_FAMILY_BATCH", "32"))
FAMILY_STEPS = int(os.environ.get("YAIK_BENCH_FAMILY_STEPS", "6"))


def _salted_checksums(plan, golden, wgt, nsalt):
    """Expected position-weighted checksums when the 1D color0 params are
    salted by s (bench salt-perturbation; YAIK_3DTile.cpp:86 semantics).
    golden/wgt [h, w, C] (alpha channel, if any, is unaffected)."""
    aff = plan.d1.wmask & (plan.d1.indices == 0)
    nty, ntx = plan.height // 8, plan.width // 8
    aff_img = aff.reshape(3, nty, ntx, 8, 8).transpose(
        0, 1, 3, 2, 4).reshape(3, plan.height, plan.width)
    base = int((golden.astype(np.uint64) * wgt).sum() % (1 << 32))
    gold_pl = golden[..., :3].transpose(2, 0, 1).astype(np.uint64)
    wgt_pl = wgt[..., :3].transpose(2, 0, 1).astype(np.uint64)
    gv, wv = gold_pl[aff_img], wgt_pl[aff_img]
    return [int((base + (wv * (((gv + s) & 0xFF) - gv)).sum()) % (1 << 32))
            for s in range(nsalt)]


def run_family_lanes(expanded):
    """VERDICT r3 #5 / r4 #5: checksummed on-chip decode lanes for the
    non-RGB chunk families, with the RGB lane's salted-CHAIN discipline:
    K decode steps of each committed fixture stream chain in one
    dispatch (each step's d1 color0 salted by the previous step's output
    checksum - a data dependence no compiler can hoist), one 4-byte
    fetch, validated against host-modeled per-salt checksums, plus the
    half-length elision guard. These certify device THROUGHPUT; the
    round-4 per-dispatch form bounded latency only (a ~25 ms tunnel
    round trip rode inside every timed step). Returns
    {family: {mpix_s, ok}}."""
    from yaik_tpu.decoder import reference as refdec
    from yaik_tpu.format import lut as l2mod

    fams = [("rgba", "bench_rgba512.yaik", False),
            ("ucol_smap", "bench_ucol512.yaik", False),
            ("t2dl", "bench_2d512.yaik", True)]
    out = {}
    nsalt = 4
    for fam, fname, needs2d in fams:
        path = FIX / fname
        if not path.exists():
            continue
        stream = path.read_bytes()
        exp2d = None
        if needs2d:
            exp2d = l2mod.expand_lut2d(l2mod.parse_lut2d_file(
                (FIX / "LutFile2D.lut").read_bytes()))
        golden = refdec.decode(stream, expanded, exp2d)
        fh, fw, fc = golden.shape
        fwgt = _checksum_weights(fh, fw, fc)
        plan = planner.build_plan(stream, expanded, exp2d)
        shifts, tab, args = jax_engine.plan_to_device_args(
            plan, expanded, exp2d, resident=True)
        chk_s = _salted_checksums(plan, golden, fwgt, nsalt)
        chk_bs = [(FAMILY_BATCH * c) % (1 << 32) for c in chk_s]

        def rep(x):
            x = np.asarray(x)
            return np.broadcast_to(x[None],
                                   (FAMILY_BATCH,) + x.shape).copy()

        b_args = jax.device_put(jax.tree.map(rep, args))
        wgt_dev = jax.device_put(fwgt)
        tab_dev = jax.device_put(np.asarray(tab))
        nargs = len(b_args)
        aspec = jax_engine.alpha_spec_of(plan)
        vdec = jax.vmap(
            lambda t, *a: jax_engine.decode_core(shifts, t, *a, aspec=aspec),
            in_axes=(None,) + (0,) * nargs)

        @partial(jax.jit, static_argnames=("nsteps",))
        def fam_chain(salt, t, a, nsteps):
            def body(i, carry):
                s = (carry & (nsalt - 1)).astype(jnp.int32)
                aa = list(a)
                aa[7] = jax_engine.salt_d1_color0(aa[7], s)
                o = vdec(t, *aa)
                return carry + jnp.sum(
                    o.astype(jnp.uint32) * wgt_dev[None],
                    dtype=jnp.uint32)
            return jax.lax.fori_loop(0, nsteps, body, salt)

        def run_chain(salt, nsteps):
            got = int(fam_chain(jnp.uint32(salt), tab_dev, b_args,
                                nsteps=nsteps))
            carry = salt
            for _ in range(nsteps):
                carry = (carry + chk_bs[carry & (nsalt - 1)]) % (1 << 32)
            return got == carry

        # chain length: the elision guard compares dt(K) vs dt(K/2) and a
        # ~25 ms tunnel round trip rides each run; K must be long enough
        # that real decode work dominates the constant (K=12 measured a
        # false guard failure at 967 MPix/s: 77 vs 51 ms is only 1.5x;
        # K=24 was still marginal at ~1200 MPix/s)
        K = 8 * FAMILY_STEPS
        ok = run_chain(1, K)                     # compile + correctness
        ok &= run_chain(1, K // 2)               # compile the half variant

        def timed(salt, n):
            t0 = time.perf_counter()
            good = run_chain(salt, n)
            return good, time.perf_counter() - t0

        # min of two timings per length: a single tunnel round-trip
        # spike (~25-60 ms) otherwise flips the elision guard on these
        # ~3 ms/step lanes
        oka, ta = timed(2, K // 2)
        okb, tb = timed(3, K // 2)
        okc, tc = timed(4, K)
        okd, td = timed(5, K)
        ok &= oka and okb and okc and okd
        dt_half, dt = min(ta, tb), min(tc, td)
        # family threshold 1.45 (not the RGB lane's 1.6): at ~2.5 ms/step
        # the asymptotic ratio with the ~25 ms tunnel RTT is only ~1.7,
        # and host contention pushed a passing lane under 1.6 once; a
        # collapsed chain measures ~1.0-1.1, so 1.45 still discriminates
        ok &= dt >= 1.45 * dt_half               # elision guard
        mpix = K * FAMILY_BATCH * fh * fw / dt / 1e6
        out[fam] = {"mpix_s": round(mpix, 2), "ok": bool(ok)}

    # 4K 3DTX banded decode (end-to-end wall: plan + banded device decode
    # + pixel download), validated against the host decoder
    path = FIX / "bench_4k.yaik"
    if path.exists():
        from yaik_tpu.parallel.batch import decode_spatial
        stream = path.read_bytes()
        want = refdec.decode(stream, expanded)
        decode_spatial(stream, expanded, n_bands=4)           # warm compile
        t0 = time.perf_counter()
        got = decode_spatial(stream, expanded, n_bands=4)
        dt = time.perf_counter() - t0
        ok4 = np.array_equal(got, want)
        out["t3dx_4k_e2e"] = {
            "mpix_s": round(want.shape[0] * want.shape[1] / dt / 1e6, 2),
            "ok": bool(ok4)}
    return out


def main():
    lut_data = (FIX / "LutFile.lut").read_bytes()
    expanded = lutmod.expand_lut(lutmod.parse_lut_file(lut_data))

    names = ("img512", "img512b")
    streams = {n: (FIX / f"{n}.yaik").read_bytes() for n in names}
    want = {n: np.load(FIX / f"{n}.dec.npz")["rgb"] for n in names}

    plans = {n: planner.build_plan(streams[n], expanded) for n in names}
    # steady-state planning cost (the first plans pay imports/page faults;
    # production planning is warm by definition - it runs per image)
    plan_times = []
    for _ in range(10):
        t0 = time.perf_counter()
        for n in names:
            planner.build_plan(streams[n], expanded)
        plan_times.append((time.perf_counter() - t0) / len(names))
    host_plan_ms = float(np.median(plan_times)) * 1e3

    w, h = plans["img512"].width, plans["img512"].height
    pix_batch = BATCH * w * h
    wgt = _checksum_weights(h, w)
    chk_img = {n: int((want[n].astype(np.uint64) * wgt).sum() % (1 << 32))
               for n in names}
    chk_batch = {n: (BATCH * chk_img[n]) % (1 << 32) for n in names}

    shifts = None
    dev_args = {}
    t3m = jax_engine.combine_t3_modes(
        [jax_engine.t3_pack_mode(plans[n], expanded) for n in names],
        [plans[n] for n in names])
    for n in names:
        shifts, tab, args = jax_engine.plan_to_device_args(
            plans[n], expanded, t3_modes=t3m, resident=True)

        def rep(x):
            x = np.asarray(x)
            return np.broadcast_to(x[None], (BATCH,) + x.shape).copy()

        dev_args[n] = jax.tree.map(rep, args)
    nargs = len(dev_args["img512"])

    wgt_dev = jax.device_put(wgt)
    tab = jax.device_put(np.asarray(tab))

    vdec = jax.vmap(lambda t, *a: jax_engine.decode_core(shifts, t, *a),
                    in_axes=(None,) + (0,) * nargs)

    def batch_chk(t, s, a):
        # perturb the 1D-pass color0 params by the carry-derived salt s:
        # every step's decode INPUT depends on the previous step's OUTPUT,
        # so no compiler/runtime can hoist, collapse, or reorder the chain
        # (plain loop-invariant bodies WERE hoisted by XLA - measured as an
        # impossible 3 GPix/s that the scales_with_steps guard rejected)
        a = list(a)
        a[7] = jax_engine.salt_d1_color0(a[7], s)   # d1 prm (slot 7)
        out = vdec(t, *a)
        return jnp.sum(out.astype(jnp.uint32) * wgt_dev[None],
                       dtype=jnp.uint32)

    # expected checksums for each salt: pixels written by the 1D pass with
    # byte 0 take (color0 + s) & 0xFF (YAIK_3DTile.cpp:86 semantics); the
    # affected coordinate set comes from the plan, the base values from the
    # reference-decoded golden
    NSALT = 4
    chk_img_s = {}
    for n in names:
        p = plans[n]
        aff = p.d1.wmask & (p.d1.indices == 0)          # [3, g, 64]
        nty, ntx = p.height // 8, p.width // 8
        aff_img = aff.reshape(3, nty, ntx, 8, 8).transpose(
            0, 1, 3, 2, 4).reshape(3, p.height, p.width)
        gold_pl = want[n].transpose(2, 0, 1).astype(np.uint64)
        wgt_pl = wgt.transpose(2, 0, 1).astype(np.uint64)
        base = int((gold_pl * wgt_pl).sum() % (1 << 32))
        assert base == chk_img[n]
        gv, wv = gold_pl[aff_img], wgt_pl[aff_img]
        chk_img_s[n] = [
            int((base + (wv * (((gv + s) & 0xFF) - gv)).sum()) % (1 << 32))
            for s in range(NSALT)]
    chk_batch_s = {n: [(BATCH * c) % (1 << 32) for c in chk_img_s[n]]
                   for n in names}

    # --- device throughput: K steps chained in ONE dispatch -------------
    # Two variants unrolled in the loop body as separate operand trees (no
    # per-step dynamic slicing of the arg tree - measured at ~67 ms/step of
    # pure harness overhead, 11x the decode itself).
    args_a = jax.device_put(dev_args["img512"])
    args_b = jax.device_put(dev_args["img512b"])

    @partial(jax.jit, static_argnames=("nsteps",))
    def pipeline(salt, t, a, b, nsteps):
        def body(i, carry):
            s1 = (carry & (NSALT - 1)).astype(jnp.int32)
            c1 = carry + batch_chk(t, s1, a)
            s2 = (c1 & (NSALT - 1)).astype(jnp.int32)
            return c1 + batch_chk(t, s2, b)
        return jax.lax.fori_loop(0, nsteps // 2, body, salt)

    def run_pipeline(salt, nsteps):
        r = pipeline(jnp.uint32(salt), tab, args_a, args_b, nsteps=nsteps)
        got = int(r)
        carry = salt
        for _ in range(nsteps // 2):
            for n in names:
                carry = (carry + chk_batch_s[n][carry & (NSALT - 1)]
                         ) % (1 << 32)
        return got == carry

    def time_pipeline(nsteps):
        ok = run_pipeline(1, nsteps)            # compile + correctness
        t0 = time.perf_counter()
        ok &= run_pipeline(2, nsteps)           # distinct dispatch
        return ok, time.perf_counter() - t0

    # second-line elision guard: a run at half the steps must take
    # materially less time, otherwise the chain was collapsed anyway and
    # the number means nothing
    ok_half, dt_half = time_pipeline(STEPS // 2)
    ok_full, dt_pipe = time_pipeline(STEPS)
    checksum_ok = bool(ok_half and ok_full)
    scales_with_steps = dt_pipe >= 1.6 * dt_half
    device_mpix_s = STEPS * pix_batch / dt_pipe / 1e6
    implied_write = device_mpix_s * 1e6 * 3          # bytes/s of u8 RGB out
    plausible = (implied_write <= MAX_WRITE_BYTES_S) and scales_with_steps

    # --- synced per-step dispatches (includes per-call round trip) ------
    step_fn = jax.jit(lambda t, s, *a: batch_chk(t, s, a))
    sync_times = []
    sync_ok = True
    seq = [names[i % 2] for i in range(SYNC_STEPS)]
    dev_batches = {"img512": args_a, "img512b": args_b}
    for n in seq:   # warm both variants first
        int(step_fn(tab, jnp.int32(0), *dev_batches[n]))
    for k, n in enumerate(seq):
        s = k % NSALT        # distinct input per dispatch here too
        t0 = time.perf_counter()
        got = int(step_fn(tab, jnp.int32(s), *dev_batches[n]))
        sync_times.append(time.perf_counter() - t0)
        sync_ok &= got == chk_batch_s[n][s]
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

    # --- end to end, device-resident consumer ---------------------------
    # plan + pack + upload + decode, pixels STAY on device (the TPU-serving
    # scenario: decoded textures feed an on-device consumer); only a 4-byte
    # checksum returns per batch, and it is validated. This isolates the
    # host->device pipeline from the rig's pixel-download wall.
    step_res = jax.jit(lambda t, *a: batch_chk(t, jnp.int32(0), a))
    int(step_res(tab, *args_a))              # warm

    def plan_pack_batch(k):
        # every image in the batch is planned and packed individually (the
        # honest per-image host cost), then stacked and uploaded
        args = []
        for j in range(BATCH):
            p = planner.build_plan(streams[names[(k + j) % 2]], expanded)
            _, _, a = jax_engine.plan_to_device_args(p, expanded,
                                                     t3_modes=t3m)
            args.append(a)
        stk = jax.tree.map(lambda *xs: np.stack(xs), *args)
        expect = sum(chk_img[names[(k + j) % 2]]
                     for j in range(BATCH)) % (1 << 32)
        return step_res(tab, *jax.device_put(stk)), expect

    nres = 3
    t0 = time.perf_counter()
    res_ok = True
    pendingr = None
    for k in range(nres):
        handle = plan_pack_batch(k)
        if pendingr is not None:
            ph, pe = pendingr
            res_ok &= int(ph) == pe
        pendingr = handle
    ph, pe = pendingr
    res_ok &= int(ph) == pe
    dt_res = time.perf_counter() - t0
    checksum_ok = checksum_ok and res_ok
    e2e_resident_mpix_s = nres * pix_batch / dt_res / 1e6

    # --- encode lane (the other half of the BASELINE metric) ------------
    encode_mpix_s, enc_ok, enc_bytes_checked, enc_anchor = run_encode_lane(
        names, wgt, w, h, gen_golden="--gen-encode-golden" in sys.argv)
    checksum_ok = checksum_ok and enc_ok

    # --- device-resident encode scoring lane ----------------------------
    enc_scoring = run_encode_scoring_lane(names)
    checksum_ok = checksum_ok and enc_scoring["ok"]

    # --- non-RGB chunk-family lanes (VERDICT r3 #5) ---------------------
    families = run_family_lanes(expanded)
    checksum_ok = checksum_ok and all(f["ok"] for f in families.values())

    value = device_mpix_s if plausible else e2e_mpix_s
    info = {
        "metric": "decode_throughput",
        "value": round(value, 2),
        "unit": "MPix/s",
        "vs_baseline": round(value / 125.0, 3),
        "device_mpix_s": round(device_mpix_s, 2),
        "synced_mpix_s": round(synced_mpix_s, 2),
        "e2e_mpix_s": round(e2e_mpix_s, 2),
        "e2e_resident_mpix_s": round(e2e_resident_mpix_s, 2),
        "encode_mpix_s": round(encode_mpix_s, 2),
        "encode_bytes_checked": enc_bytes_checked,
        # "reference": CRCs anchored to C++ ref_encoder output (byte
        # PARITY); "self": stability since our own golden generation
        "encode_anchor": enc_anchor,
        # device scoring rate with resident inputs (tunnel-free: the
        # production-relevant device half of the encode pipeline)
        "encode_scoring_mpix_s": enc_scoring["mpix_s"],
        "encode_scoring_ok": enc_scoring["ok"],
        "families": families,
        "host_plan_ms_per_img": round(host_plan_ms, 2),
        "checksum_ok": checksum_ok,
        "plausible": plausible,
        "scales_with_steps": bool(scales_with_steps),
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
