#!/usr/bin/env python3
"""Generate golden fixtures from the C++ reference build.

Runs the reference encoder + decoder over the synthetic corpus and stores:
  tests/fixtures/
    Bank3D/*.lut        - the synthetic LUT bank (input artifact)
    LutFile.lut         - decoder LUT file written by the reference encoder
    <name>.png          - input image
    <name>.yaik         - golden bitstream (reference encoder, zstd 1.3.4)
    <name>.dec.npz      - golden decode (reference decoder output, compressed)

Everything is deterministic; fixtures are committed so tests run without the
reference mount.
"""
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")
REFBUILD = os.path.join(TOOLS, "refbuild")
FIX = os.path.join(REPO, "tests", "fixtures")

IMAGES = ["img64.png", "img128.png", "img512.png", "quilt128.png"]


def main():
    subprocess.run([os.path.join(TOOLS, "build_reference.sh")], check=True)
    work = os.path.join(REPO, "scratch", "fixtures_work")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    os.makedirs(FIX, exist_ok=True)

    subprocess.run([sys.executable, os.path.join(TOOLS, "gen_images.py"),
                    os.path.join(work, "images")], check=True)
    subprocess.run([sys.executable, os.path.join(TOOLS, "make_bank3d.py"),
                    os.path.join(work, "Bank3D")], check=True)

    # encoder reads Bank3D/ from CWD and writes LutFile.lut there
    for name in IMAGES:
        src = os.path.join(work, "images", name)
        shutil.copy(src, os.path.join(work, name))
        out = subprocess.run(
            [os.path.join(REFBUILD, "ref_encoder"), name, name + ".yaik"],
            cwd=work, capture_output=True, text=True)
        if out.returncode != 0:
            print(out.stdout[-3000:], out.stderr[-3000:])
            raise RuntimeError(f"ref_encoder failed on {name}")
        dec = subprocess.run(
            [os.path.join(REFBUILD, "ref_decoder"), name + ".yaik",
             "LutFile.lut", name + ".raw"],
            cwd=work, capture_output=True, text=True)
        if dec.returncode != 0:
            print(dec.stdout[-3000:], dec.stderr[-3000:])
            raise RuntimeError(f"ref_decoder failed on {name}")
        w, h, ch = map(int, dec.stdout.strip().splitlines()[-1].split())
        raw = np.fromfile(os.path.join(work, name + ".raw"), np.uint8)
        raw = raw.reshape(h, w, ch)
        base = name[:-4]
        shutil.copy(src, os.path.join(FIX, name))
        shutil.copy(os.path.join(work, name + ".yaik"),
                    os.path.join(FIX, base + ".yaik"))
        np.savez_compressed(os.path.join(FIX, base + ".dec.npz"), rgb=raw)
        ysz = os.path.getsize(os.path.join(work, name + ".yaik"))
        print(f"{name}: {w}x{h}x{ch}  yaik={ysz}B  bpp={ysz*8/(w*h):.3f}")

    # UCOL goldens: the disabled SingleColorOut pass via the subclass driver
    # (quilt128 is excluded: its tiny streams hit the reference's
    # zstd-capacity UB, see yaik_tpu/encoder/single_color.py)
    for name in ["img64.png", "img512.png"]:
        base = name[:-4]
        out = subprocess.run(
            [os.path.join(REFBUILD, "ref_encoder_ucol"), name,
             base + ".ucol.yaik"],
            cwd=work, capture_output=True, text=True)
        if out.returncode != 0:
            raise RuntimeError(f"ref_encoder_ucol failed on {name}")
        shutil.copy(os.path.join(work, base + ".ucol.yaik"), FIX)

    # 2DTL goldens: the disabled Correlation2DSearch path via the subclass
    # driver (needs Bank2D: synthetic pattern PNGs)
    subprocess.run([sys.executable, os.path.join(TOOLS, "gen_bank2d.py"),
                    os.path.join(work, "Bank2D")], check=True)
    shutil.copy(os.path.join(work, "images", "corr2d128.png"),
                os.path.join(work, "corr2d128.png"))
    out = subprocess.run(
        [os.path.join(REFBUILD, "ref_encoder_2d"), "corr2d128.png",
         "corr2d128.2d.yaik"],
        cwd=work, capture_output=True, text=True)
    if out.returncode != 0:
        raise RuntimeError("ref_encoder_2d failed")
    shutil.copy(os.path.join(work, "corr2d128.png"), FIX)
    shutil.copy(os.path.join(work, "corr2d128.2d.yaik"), FIX)
    shutil.copy(os.path.join(work, "LutFile2D.lut"), FIX)
    bank2dst = os.path.join(FIX, "Bank2D")
    shutil.rmtree(bank2dst, ignore_errors=True)
    shutil.copytree(os.path.join(work, "Bank2D"), bank2dst)

    # plane-subset gradient goldens (cwd needs Bank3D; decode oracle N/A:
    # the reference's own plane-variant decode garbles these streams)
    shutil.copy(os.path.join(work, "images", "gradpair192.png"),
                os.path.join(work, "gradpair192.png"))
    out = subprocess.run(
        [os.path.join(REFBUILD, "ref_encoder_gradpair"), "gradpair192.png",
         "gradpair192.gp.yaik"],
        cwd=work, capture_output=True, text=True)
    if out.returncode != 0:
        raise RuntimeError("ref_encoder_gradpair failed")
    shutil.copy(os.path.join(work, "gradpair192.png"), FIX)
    shutil.copy(os.path.join(work, "gradpair192.gp.yaik"), FIX)

    # PLNT goldens: the disabled DynamicTileEncode path via its driver
    for name in ["img64.png", "corr2d128.png"]:
        base = name[:-4]
        out = subprocess.run(
            [os.path.join(REFBUILD, "ref_encoder_plnt"), name,
             base + ".plnt.yaik"],
            cwd=work, capture_output=True, text=True)
        if out.returncode != 0:
            raise RuntimeError(f"ref_encoder_plnt failed on {name}")
        shutil.copy(os.path.join(work, base + ".plnt.yaik"), FIX)

    shutil.copy(os.path.join(work, "LutFile.lut"), os.path.join(FIX, "LutFile.lut"))
    bankdst = os.path.join(FIX, "Bank3D")
    shutil.rmtree(bankdst, ignore_errors=True)
    shutil.copytree(os.path.join(work, "Bank3D"), bankdst)
    print("fixtures written to", FIX)


if __name__ == "__main__":
    main()
