"""Subprocess driver for JAX-engine tests: runs on a virtual 8-device CPU
mesh (the axon TPU plugin registers at interpreter start and cannot be
overridden in-process, so CPU mode needs a clean environment - see
tests/test_jax_decoder.py which launches this)."""
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

from yaik_tpu.decoder import api  # noqa: E402

FIX = REPO / "tests" / "fixtures"


def main():
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) == 8, jax.devices()
    lut = api.assign_lut((FIX / "LutFile.lut").read_bytes())
    for name in ("img64", "img128"):
        stream = (FIX / f"{name}.yaik").read_bytes()
        want = np.load(FIX / f"{name}.dec.npz")["rgb"]
        got = api.decode_image(stream, lut, engine="jax")
        assert np.array_equal(got, want), f"{name}: jax decode mismatch"
        print(f"{name}: jax decode bit-exact")

    # device-scored encode == host encode, byte for byte
    from PIL import Image
    from yaik_tpu.encoder import bank as bankmod
    from yaik_tpu.encoder.context import encode_image
    bank = bankmod.load_bank(str(FIX / "Bank3D"))
    img = np.asarray(Image.open(FIX / "img64.png"))
    host_stream = encode_image(img, bank, engine="host")
    dev_stream = encode_image(img, bank, engine="device")
    assert host_stream == dev_stream, "device-scored encode differs"
    print("img64: device-scored encode byte-identical")

    # pipelined corpus encode: mixed sizes + a padded short batch, all
    # byte-identical to per-image host encode, output order preserved
    from yaik_tpu.encoder.batch import encode_corpus
    img128 = np.asarray(Image.open(FIX / "img128.png"))
    corpus = [img, img128, img, img, img128]
    streams_c = encode_corpus(corpus, bank, batch_size=2)
    host128 = encode_image(img128, bank, engine="host")
    assert streams_c[0] == host_stream and streams_c[2] == host_stream
    assert streams_c[3] == host_stream
    assert streams_c[1] == host128 and streams_c[4] == host128
    print("encode_corpus: mixed sizes + padding byte-identical, ordered")

    # batch decode over the 8-device mesh (config 5)
    from yaik_tpu.parallel import batch as par
    mesh = par.data_mesh(8)
    streams = [(FIX / "img128.yaik").read_bytes()] * 8
    want128 = np.load(FIX / "img128.dec.npz")["rgb"]
    out = par.decode_batch(streams, lut, mesh=mesh)
    assert out.shape[0] == 8
    assert all(np.array_equal(out[i], want128) for i in range(8))
    print("decode_batch over 8-device mesh: bit-exact")

    # spatial sharding of one image's tile grid (config 4, scaled down)
    want512 = np.load(FIX / "img512.dec.npz")["rgb"]
    got = par.decode_spatial((FIX / "img512.yaik").read_bytes(), lut,
                             mesh=mesh, n_bands=8)
    assert np.array_equal(got, want512)
    print("decode_spatial (8 bands over mesh): bit-exact")

    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (128, 128, 3)
    print("entry(): compiles and runs")
    g.dryrun_multichip(8)
    print("ALL OK")


if __name__ == "__main__":
    main()
