"""Model roundtrips: shapes, rate consistency, decode == eval forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyres_tpu.models import CheckerboardCodec, LightWeightCheckerboard
from hyres_tpu.models.hyres import HyresCodec, ResidualJPEGCompression


@pytest.fixture(scope="module")
def small_model():
    model = LightWeightCheckerboard(N=32, M=48)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.key(0), x, noisequant=True, rng=jax.random.key(1))
    return model, params


def test_forward_shapes(small_model):
    model, params = small_model
    x = jax.random.uniform(jax.random.key(2), (2, 64, 64, 3))
    out = model.apply(params, x, noisequant=True, rng=jax.random.key(3))
    assert out["x_hat"].shape == x.shape
    assert out["likelihoods"]["y"].shape == (2, 8, 8, 48)
    assert out["likelihoods"]["z"].shape == (2, 2, 2, 32)


def test_compress_decompress_matches_eval_forward(small_model):
    """Real entropy-coded roundtrip reproduces the eval (STE) forward
    reconstruction exactly — the encoder/decoder bit-exactness invariant."""
    model, params = small_model
    x = jax.random.uniform(jax.random.key(4), (1, 64, 64, 3))
    codec = CheckerboardCodec(model, params)
    codec.update(force=True)
    comp = codec.compress(x)
    dec = codec.decompress(comp["strings"], comp["shape"])

    fwd = model.apply(params, x, noisequant=False)
    want = np.clip(np.asarray(fwd["x_hat"]), 0, 1)
    np.testing.assert_allclose(np.asarray(dec["x_hat"]), want, atol=1e-6)


def test_real_rate_tracks_likelihood_estimate(small_model):
    model, params = small_model
    x = jax.random.uniform(jax.random.key(5), (1, 64, 64, 3))
    codec = CheckerboardCodec(model, params)
    codec.update(force=True)
    comp = codec.compress(x)
    nbytes = sum(len(s) for part in comp["strings"][0] for s in part)
    nbytes += sum(len(s) for s in comp["strings"][1])
    out = model.apply(params, x, noisequant=False)
    est_bits = float(sum(-jnp.sum(jnp.log2(l)) for l in out["likelihoods"].values()))
    assert nbytes * 8 < est_bits * 1.15 + 256  # real rate within ~15% + headers


def test_decode_deterministic(small_model):
    model, params = small_model
    x = jax.random.uniform(jax.random.key(6), (1, 64, 64, 3))
    codec = CheckerboardCodec(model, params)
    codec.update(force=True)
    comp = codec.compress(x)
    a = np.asarray(codec.decompress(comp["strings"], comp["shape"])["x_hat"])
    b = np.asarray(codec.decompress(comp["strings"], comp["shape"])["x_hat"])
    assert np.array_equal(a, b)


@pytest.fixture(scope="module")
def hyres_small():
    model = ResidualJPEGCompression(N=32, M=48, jpeg_quality=10)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.key(0), x, noisequant=True, rng=jax.random.key(1))
    return model, params


def test_hyres_forward_contract(hyres_small):
    model, params = hyres_small
    x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))
    out = model.apply(params, x, noisequant=True, rng=jax.random.key(3))
    for key in ("x_hat", "likelihoods", "jpeg_bpp_loss", "jpeg_decoded",
                "residual", "residual_hat"):
        assert key in out
    assert out["x_hat"].shape == x.shape
    assert float(out["jpeg_bpp_loss"]) > 0
    assert float(jnp.min(out["x_hat"])) >= 0 and float(jnp.max(out["x_hat"])) <= 1
    # residual identity: x = jpeg_decoded + residual
    np.testing.assert_allclose(
        np.asarray(out["jpeg_decoded"] + out["residual"]), np.asarray(x), atol=1e-6)


def test_hyres_compress_decompress(hyres_small):
    model, params = hyres_small
    x = jax.random.uniform(jax.random.key(4), (1, 64, 64, 3))
    codec = HyresCodec(model, params)
    codec.update(force=True)
    comp = codec.compress(x)
    assert "jpeg_buffers" in comp and len(comp["jpeg_buffers"]) == 1
    dec = codec.decompress(comp)
    assert dec["x_hat"].shape == x.shape
    # deterministic decode
    dec2 = codec.decompress(comp)
    assert np.array_equal(np.asarray(dec["x_hat"]), np.asarray(dec2["x_hat"]))


def test_odd_size_roundtrip(small_model):
    """Non-/64 inputs: codec pads to /64 and crops the reconstruction."""
    model, params = small_model
    x = jax.random.uniform(jax.random.key(7), (1, 70, 90, 3))
    codec = CheckerboardCodec(model, params)
    codec.update(force=True)
    comp = codec.compress(x)
    assert comp["size"] == (70, 90)
    dec = codec.decompress(comp["strings"], comp["shape"], comp["size"])
    assert dec["x_hat"].shape == x.shape


def test_tiled_inference(small_model):
    """Large image split into a tile batch, coded, reassembled."""
    from hyres_tpu.models.tiled import tiled_compress, tiled_decompress

    model, params = small_model
    codec = CheckerboardCodec(model, params)
    codec.update(force=True)
    x = jax.random.uniform(jax.random.key(8), (1, 150, 200, 3))
    comp = tiled_compress(codec, x, tile=128)
    assert comp["tile_grid"] == (2, 2, 128)
    dec = tiled_decompress(codec, comp)
    assert dec["x_hat"].shape == x.shape
    # interior of each tile matches the untiled decode of that tile
    t = codec.compress(x[:, :128, :128, :])
    d = codec.decompress(t["strings"], t["shape"], t["size"])
    np.testing.assert_allclose(np.asarray(dec["x_hat"][0, :128, :128]),
                               np.asarray(d["x_hat"][0]), atol=1e-6)
