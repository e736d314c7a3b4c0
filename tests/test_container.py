"""Bitstream container (.hyc): pack/unpack identity + file-codec CLI.

The reference never writes compressed files (its inference is an
in-memory roundtrip, /root/reference/src/inference.py:54-151); the
container + cli/codec.py complete the deployment story. These tests pin
that serializing a compress() output to disk and decoding from the file
reproduces the in-memory decode bit-for-bit, for both the dict-payload
(HyRES) and tuple-call (checkerboard) decoder signatures.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from hyres_tpu.coding.container import (MAGIC, pack_compressed,
                                        unpack_compressed)
from hyres_tpu.models import CheckerboardCodec, LightWeightCheckerboard
from hyres_tpu.models.hyres import HyresCodec, ResidualJPEGCompression


@pytest.fixture(scope="module")
def cb_codec():
    model = LightWeightCheckerboard(N=32, M=48)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                        noisequant=True, rng=jax.random.key(1))
    codec = CheckerboardCodec(model, params)
    codec.update(force=True)
    return codec, params


def _flatten_bytes(obj):
    if isinstance(obj, (bytes, bytearray, memoryview)):
        return [bytes(obj)]
    return [b for v in obj for b in _flatten_bytes(v)]


def test_pack_unpack_identity(cb_codec):
    codec, _ = cb_codec
    x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))
    comp = codec.compress(x)
    blob = pack_compressed(comp, model="checkerboard", N=32, M=48)
    assert blob[:4] == MAGIC

    doc = unpack_compressed(blob)
    assert (doc["model"], doc["N"], doc["M"]) == ("checkerboard", 32, 48)
    payload = doc["payload"]
    assert payload["shape"] == comp["shape"]
    assert _flatten_bytes(payload["strings"]) == _flatten_bytes(comp["strings"])

    # decode from the unpacked payload == decode from the live dict
    want = codec.decompress(comp["strings"], comp["shape"])["x_hat"]
    got = codec.decompress(payload["strings"], payload["shape"],
                           payload.get("size"))["x_hat"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="HYC1"):
        unpack_compressed(b"NOPE" + b"\x00" * 16)


def _write_png(path, key, size=64):
    arr = np.asarray(
        jax.random.uniform(key, (size, size, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def test_codec_cli_checkerboard(tmp_path, cb_codec):
    from hyres_tpu.cli.codec import main
    from hyres_tpu.train.checkpoint import save_checkpoint

    codec, params = cb_codec
    ckpt = tmp_path / "ckpt.msgpack"
    save_checkpoint(params, str(ckpt))
    png = tmp_path / "img.png"
    _write_png(png, jax.random.key(3))

    main(["encode", str(png), "--checkpoint", str(ckpt),
          "--model", "checkerboard", "--N", "32", "--M", "48",
          "--no-refit-quantiles", "-o", str(tmp_path)])
    hyc = tmp_path / "img.hyc"
    assert hyc.is_file() and hyc.read_bytes()[:4] == MAGIC

    main(["decode", str(hyc), "--checkpoint", str(ckpt),
          "--no-refit-quantiles", "-o", str(tmp_path / "out")])
    recon = tmp_path / "out" / "img.png"
    assert recon.is_file()

    # the decoded PNG is exactly the in-memory roundtrip's reconstruction
    x = jnp.asarray(np.asarray(Image.open(png), np.float32)[None] / 255.0)
    comp = codec.compress(x)
    x_hat = codec.decompress(comp["strings"], comp["shape"])["x_hat"]
    want = np.clip(np.asarray(x_hat[0]) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(Image.open(recon)), want)


def test_codec_cli_hyres_self_describing(tmp_path):
    """HyRES blobs carry jpeg_buffers; decode needs NO model flags — the
    container is self-describing (family/N/M/quality/coder)."""
    from hyres_tpu.cli.codec import main
    from hyres_tpu.train.checkpoint import save_checkpoint

    model = ResidualJPEGCompression(N=32, M=48, jpeg_quality=50)
    params = model.init(jax.random.key(4), jnp.zeros((1, 64, 64, 3)),
                        noisequant=True, rng=jax.random.key(5))
    codec = HyresCodec(model, params)
    codec.update(force=True)

    ckpt = tmp_path / "ckpt.msgpack"
    save_checkpoint(params, str(ckpt))
    png = tmp_path / "img.png"
    _write_png(png, jax.random.key(6))

    main(["encode", str(png), "--checkpoint", str(ckpt), "--model", "hyres",
          "--N", "32", "--M", "48", "--jpeg-quality", "50",
          "--no-refit-quantiles", "-o", str(tmp_path)])
    hyc = tmp_path / "img.hyc"
    doc = unpack_compressed(hyc.read_bytes())
    assert doc["jpeg_quality"] == 50
    assert doc["payload"]["jpeg_buffers"]

    main(["decode", str(hyc), "--checkpoint", str(ckpt),
          "--no-refit-quantiles", "-o", str(tmp_path / "out")])
    recon = tmp_path / "out" / "img.png"

    x = jnp.asarray(np.asarray(Image.open(png), np.float32)[None] / 255.0)
    comp = codec.compress(x)
    x_hat = np.clip(np.asarray(codec.decompress(comp)["x_hat"]), 0, 1)
    want = np.clip(x_hat[0] * 255.0 + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(Image.open(recon)), want)
