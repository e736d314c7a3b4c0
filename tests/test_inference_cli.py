"""Inference-CLI roundtrips for every model family.

Verifies the bpp accounting in ``cli/inference.py``: ``total_bpp`` must
equal the sum of the ACTUAL byte lengths of every buffer in the
compressed representation, for each of the four families' distinct
``strings`` layouts (checkerboard/hyres nested pair, ELIC per-slice
lists, cheng2020 single buffered stream). Reference accounting:
/root/reference/src/inference.py:103-120.
"""

import csv
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _flat_nbytes(obj):
    """Independent (non-recursive-helper-under-test) byte counter."""
    total = 0
    stack = [obj]
    while stack:
        o = stack.pop()
        if isinstance(o, (bytes, bytearray)):
            total += len(o)
        else:
            stack.extend(o)
    return total


def _tiny(model_name):
    from hyres_tpu.models.hyres import HyresCodec, ResidualJPEGCompression
    from hyres_tpu.models import (
        CheckerboardCodec, Cheng2020Codec, Cheng2020withCheckerboard,
        ElicCodec, LightWeightCheckerboard, LightWeightELIC,
    )

    if model_name == "hyres":
        model = ResidualJPEGCompression(N=16, M=24, jpeg_quality=10)
        wrap = HyresCodec
    elif model_name == "checkerboard":
        model = LightWeightCheckerboard(N=16, M=24)
        wrap = CheckerboardCodec
    elif model_name == "elic":
        model = LightWeightELIC(N=16, M=24, groups=(4, 4, 8, 8))
        wrap = ElicCodec
    else:
        model = Cheng2020withCheckerboard(N=24)
        wrap = Cheng2020Codec
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.key(0), x0, noisequant=True,
                        rng=jax.random.key(1))
    codec = wrap(model, params)
    codec.update(force=True)
    return codec


@pytest.mark.parametrize("model_name",
                         ["hyres", "checkerboard", "elic", "cheng2020"])
def test_process_image_bpp_matches_real_bytes(model_name, tmp_path, kodim01):
    from hyres_tpu.cli.inference import process_image, strings_nbytes
    from hyres_tpu.train import save_image

    img_path = tmp_path / "img.png"
    save_image(kodim01[:64, :64], img_path)

    codec = _tiny(model_name)
    r = process_image(codec, str(img_path), tmp_path, False)

    # independently recount every buffer in a fresh compress
    comp = codec.compress(jnp.asarray(kodim01[None, :64, :64]))
    want_bytes = (_flat_nbytes(comp["strings"])
                  + _flat_nbytes(comp.get("jpeg_buffers", [])))
    nb = strings_nbytes(comp)
    assert nb["y"] + nb["z"] + nb["jpeg"] == want_bytes
    got_bytes = round(r["total_bpp"] * 64 * 64 / 8)
    assert got_bytes == want_bytes
    assert r["psnr"] > 5 and r["dec_time"] > 0


def test_inference_main_end_to_end(tmp_path, kodim01):
    """Full main(): checkpoint load, directory mode, per-image print, CSV."""
    from hyres_tpu.cli import inference
    from hyres_tpu.models import LightWeightCheckerboard
    from hyres_tpu.train import save_image
    from hyres_tpu.train.checkpoint import save_checkpoint

    model = LightWeightCheckerboard(N=16, M=24)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                        noisequant=True, rng=jax.random.key(1))
    ckpt = tmp_path / "ck.msgpack"
    save_checkpoint(params, str(ckpt))

    indir = tmp_path / "in"
    indir.mkdir()
    save_image(kodim01[:64, :64], indir / "a.png")
    save_image(kodim01[64:128, :64], indir / "b.png")
    outdir = tmp_path / "out"

    inference.main(["--checkpoint", str(ckpt), "--input", str(indir),
                    "--output", str(outdir), "--model", "checkerboard",
                    "--N", "16", "--M", "24"])

    with open(outdir / "metrics.csv") as f:
        rows = list(csv.DictReader(f))
    names = [r["filename"] for r in rows]
    assert names == ["a.png", "b.png", "average", "median"]
    assert (outdir / "a_recon.png").exists() and (outdir / "b_recon.png").exists()
    avg = rows[-2]
    assert abs(float(avg["total_bpp"]) -
               np.mean([float(r["total_bpp"]) for r in rows[:2]])) < 1e-9


def test_inference_main_batched_matches_single(tmp_path, kodim01):
    """--batch 2: one compress/decompress call for both images; per-image
    rate columns must match the per-image mode exactly (frames are
    per-image under the host coder) and quality must agree closely."""
    from hyres_tpu.cli import inference
    from hyres_tpu.models import LightWeightCheckerboard
    from hyres_tpu.train import save_image
    from hyres_tpu.train.checkpoint import save_checkpoint

    model = LightWeightCheckerboard(N=16, M=24)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                        noisequant=True, rng=jax.random.key(1))
    ckpt = tmp_path / "ck.msgpack"
    save_checkpoint(params, str(ckpt))

    indir = tmp_path / "in"
    indir.mkdir()
    save_image(kodim01[:64, :64], indir / "a.png")
    save_image(kodim01[64:128, :64], indir / "b.png")

    common = ["--checkpoint", str(ckpt), "--input", str(indir),
              "--model", "checkerboard", "--N", "16", "--M", "24"]
    inference.main(common + ["--output", str(tmp_path / "single")])
    inference.main(common + ["--output", str(tmp_path / "batched"),
                             "--batch", "2"])

    def read(d):
        with open(tmp_path / d / "metrics.csv") as f:
            return {r["filename"]: r for r in csv.DictReader(f)}

    single, batched = read("single"), read("batched")
    assert set(batched) == {"a.png", "b.png", "average", "median"}
    for name in ("a.png", "b.png"):
        for col in ("total_bpp", "y_bpp", "z_bpp"):
            assert abs(float(batched[name][col]) -
                       float(single[name][col])) < 1e-12, (name, col)
        assert abs(float(batched[name]["psnr"]) -
                   float(single[name]["psnr"])) < 0.1
        assert (tmp_path / "batched" / f"{Path(name).stem}_recon.png").exists()


def test_inference_main_streamed_matches_single(tmp_path, kodim01):
    """--stream 2: pipelined single-image roundtrips; rate columns must
    match per-image mode EXACTLY (the stream path runs the same compiled
    programs on the same inputs — tests/test_stream.py pins bitstream
    equality at the codec level; this pins the CLI surface)."""
    from hyres_tpu.cli import inference
    from hyres_tpu.models import LightWeightCheckerboard
    from hyres_tpu.train import save_image
    from hyres_tpu.train.checkpoint import save_checkpoint

    model = LightWeightCheckerboard(N=16, M=24)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                        noisequant=True, rng=jax.random.key(1))
    ckpt = tmp_path / "ck.msgpack"
    save_checkpoint(params, str(ckpt))

    indir = tmp_path / "in"
    indir.mkdir()
    save_image(kodim01[:64, :64], indir / "a.png")
    save_image(kodim01[64:128, :64], indir / "b.png")

    common = ["--checkpoint", str(ckpt), "--input", str(indir),
              "--model", "checkerboard", "--N", "16", "--M", "24",
              "--coder", "tpu"]
    inference.main(common + ["--output", str(tmp_path / "single")])
    inference.main(common + ["--output", str(tmp_path / "streamed"),
                             "--stream", "2"])

    def read(d):
        with open(tmp_path / d / "metrics.csv") as f:
            return {r["filename"]: r for r in csv.DictReader(f)}

    single, streamed = read("single"), read("streamed")
    assert set(streamed) == {"a.png", "b.png", "average", "median"}
    for name in ("a.png", "b.png"):
        for col in ("total_bpp", "y_bpp", "z_bpp", "mse"):
            assert abs(float(streamed[name][col]) -
                       float(single[name][col])) < 1e-12, (name, col)
        assert float(streamed[name]["enc_time"]) > 0
        assert float(streamed[name]["dec_time"]) > 0
        assert (tmp_path / "streamed" / f"{Path(name).stem}_recon.png").exists()

    # --batch composes with --stream: pipelined 2-image batches; the
    # per-image rate columns stay exact (per-image frames inside the
    # batched payload) and quality matches single-image mode closely
    # (batched JPEG/codec math is the same program at B=2)
    inference.main(common + ["--output", str(tmp_path / "bs"),
                             "--batch", "2", "--stream", "2"])
    bs = read("bs")
    assert set(bs) == {"a.png", "b.png", "average", "median"}
    for name in ("a.png", "b.png"):
        assert abs(float(bs[name]["total_bpp"]) -
                   float(single[name]["total_bpp"])) < 5e-3
        assert abs(float(bs[name]["psnr"]) -
                   float(single[name]["psnr"])) < 0.1
