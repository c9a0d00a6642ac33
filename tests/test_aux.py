"""Auxiliary subsystems (SURVEY section 5): profiler stage timers,
cross-run global statistics (globalStats.bin analog), mining checkpoints,
and the encode CLI's .log.txt dump."""
import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import FIXTURES
from yaik_tpu.utils import profiler
from yaik_tpu.utils.stats import accumulate_global, analyze


def test_profiler_stages():
    with profiler.enable():
        with profiler.stage("a"):
            with profiler.stage("b"):
                sum(range(1000))
        with profiler.stage("a"):
            pass
    rep = profiler.report()
    assert "a" in rep and "b" in rep and "x2" in rep
    # disabled -> no-op, no crash
    with profiler.stage("outside"):
        pass


def test_global_stats_accumulate(tmp_path):
    stream = (FIXTURES / "img128.yaik").read_bytes()
    st = analyze(stream)
    path = str(tmp_path / "gstats.json")
    accumulate_global(path, st)
    acc = accumulate_global(path, st)
    assert acc["images"] == 2
    assert acc["pixels"] == 2 * 128 * 128
    assert acc["bytes"] == 2 * len(stream)
    data = json.loads(pathlib.Path(path).read_text())
    assert data["images"] == 2
    # refuses to clobber an unrelated JSON file
    bad = tmp_path / "other.json"
    bad.write_text('{"unrelated": 1}')
    try:
        accumulate_global(str(bad), st)
        assert False, "should reject a non-stats file"
    except ValueError:
        pass


def test_mining_checkpoint_resume(tmp_path):
    from yaik_tpu.encoder import bank as bankmod, mining
    rng = np.random.default_rng(2)
    base = np.clip(
        np.kron(rng.integers(0, 255, (8, 8, 3)).astype(np.float32),
                np.ones((8, 8, 1))) + rng.normal(0, 2.2, (64, 64, 3)),
        0, 255).astype(np.uint8)
    imgs = [base, base[::-1].copy(), base[:, ::-1].copy()]
    ck = str(tmp_path / "mine.npz")
    mining.mine_bank(imgs[:1], str(tmp_path / "bankA"), checkpoint=ck)
    r_resumed = mining.mine_bank(imgs, str(tmp_path / "bankA"), checkpoint=ck)
    os.remove(ck)
    r_fresh = mining.mine_bank(imgs, str(tmp_path / "bankB"), checkpoint=ck)
    assert r_resumed == r_fresh
    name = bankmod.BANK_FILE_NAMES[0]
    assert (tmp_path / "bankA" / name).read_bytes() == \
        (tmp_path / "bankB" / name).read_bytes()


@pytest.mark.slow
def test_cli_encode_log_and_profile(tmp_path):
    out = tmp_path / "o.yaik"
    gs = tmp_path / "g.json"
    r = subprocess.run(
        [sys.executable, "-m", "yaik_tpu", "encode",
         str(FIXTURES / "img64.png"), str(out),
         "--bank", str(FIXTURES / "Bank3D"),
         "--profile", "--stats", "--global-stats", str(gs)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert out.exists()
    log = pathlib.Path(str(out) + ".log.txt")
    assert log.exists() and "bpp" in log.read_text()
    assert "encode:3d-scoring" in r.stdout
    assert json.loads(gs.read_text())["images"] == 1


def test_dynamic_tile_analyze():
    """DynamicTileAnalyze research analyzer (EncoderContext.cpp:8578-8897):
    format classing, mask dedup, 1-based popcount ranks."""
    import numpy as np
    from yaik_tpu.encoder.analysis import (dynamic_tile_analyze, _bit_index,
                                           _find_mask)
    # 1-based rank semantics: value 0 in mask 0b1 -> rank 1
    assert _bit_index(0b1, 0) == 1
    assert _bit_index(0b1010, 3) == 2
    tables = {}
    assert _find_mask(tables, 3, 0b101) == 0
    assert _find_mask(tables, 3, 0b001) == 0      # superset match hits
    assert _find_mask(tables, 3, 0b110) == 1      # new entry

    rng = np.random.default_rng(7)
    plane = rng.integers(0, 256, (32, 32)).astype(np.int32)
    plane[:16] = 40                               # flat half: 2-bit natural
    rep = dynamic_tile_analyze(plane)
    assert rep.total_pixels == 32 * 32
    assert 0 in rep.tiles_by_format                # flat tiles -> format 0
    assert rep.summary()
    # claims suppress quads
    claims = np.zeros((32, 32), bool)
    claims[:, :16] = True
    rep2 = dynamic_tile_analyze(plane, claims)
    assert rep2.total_pixels == 32 * 16


@pytest.mark.slow
def test_mine_bank2d(tmp_path):
    """2D bank mining (the reference's isCaptureMode2D workflow,
    EncoderContext.cpp:6965-6982): captured pair clouds -> greedy coverage
    -> Bank2D PNGs loadable by both our bank2d loader and, format-wise,
    the reference's Load2DPattern."""
    import sys, pathlib
    import numpy as np
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
    import gen_images
    from yaik_tpu.encoder import mining, bank2d as bank2dmod
    rng = np.random.default_rng(5)
    imgs = [gen_images.make_corr2d(rng, 64)]
    n, total = mining.mine_bank2d(imgs, str(tmp_path), max_tables=4)
    assert n >= 1 and total > 0
    b2 = bank2dmod.load_bank2d(str(tmp_path))
    assert b2.count == n
    data = bank2dmod.write_lut2d_file(b2)
    from yaik_tpu.format import lut as lutmod
    t = lutmod.parse_lut2d_file(data)
    assert t[6].shape == (n, 64, 2)


def test_analyze_color_count():
    import numpy as np
    from yaik_tpu.encoder.analysis import analyze_color_count
    planes = np.zeros((3, 16, 16), np.int32)
    planes[:, 8:, 8:] = np.arange(64*3).reshape(3, 8, 8) % 251
    counts, hist = analyze_color_count(planes)
    assert counts.shape == (2, 2)
    assert counts[0, 0] == 1 and hist["1 (flat)"] == 3
    assert counts[1, 1] >= 16


def test_mining_device_engine_matches_host():
    """Device-engine mining (claims from the fused gradient bundle,
    coverage matrix on the accelerator) == the host numpy loop, exactly:
    same captured clouds, same greedy picks."""
    from PIL import Image

    from yaik_tpu.encoder import mining
    import pathlib
    fixdir = pathlib.Path(__file__).parent / "fixtures"
    img = np.asarray(Image.open(fixdir / "img128.png").convert("RGB"))
    ch = mining.capture_clouds(img)
    cd = mining.capture_clouds(img, engine="device")
    assert len(ch) == len(cd)
    assert all(np.array_equal(a, b) for a, b in zip(ch, cd))
    ph = mining.evaluate_candidates(ch, max_tables=4, max_candidates=32)
    pd = mining.evaluate_candidates(ch, max_tables=4, max_candidates=32,
                                    engine="device")
    assert len(ph) == len(pd)
    assert all(np.array_equal(a, b) for a, b in zip(ph, pd))


def test_mining2d_device_matrix_matches_host():
    from PIL import Image

    from yaik_tpu.encoder import mining
    import pathlib
    fixdir = pathlib.Path(__file__).parent / "fixtures"
    img = np.asarray(Image.open(fixdir / "img128.png").convert("RGB"))
    clouds = mining.capture_clouds_2d(img)
    assert clouds, "fixture produced no 2D captures"
    step = max(1, len(clouds) // 32)
    cands = [clouds[i] for i in range(0, len(clouds), step)]
    host = np.stack([mining._covers_2d(c, clouds) for c in cands])
    dev = mining._covers2d_device(cands, clouds)
    assert np.array_equal(host, dev)
