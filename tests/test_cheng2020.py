"""Cheng2020+checkerboard: forward paths, single-stream coder roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyres_tpu.models import Cheng2020Codec, Cheng2020withCheckerboard


@pytest.fixture(scope="module")
def cheng_small():
    model = Cheng2020withCheckerboard(N=24)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.key(0), x, noisequant=True,
                        rng=jax.random.key(1))
    return model, params


def test_forward_train_shapes(cheng_small):
    model, params = cheng_small
    x = jax.random.uniform(jax.random.key(2), (2, 64, 64, 3))
    out = model.apply(params, x, noisequant=True, rng=jax.random.key(3))
    assert out["x_hat"].shape == x.shape
    assert out["likelihoods"]["y"].shape == (2, 4, 4, 24)
    assert out["likelihoods"]["z"].shape == (2, 1, 1, 24)


def test_validate_path(cheng_small):
    model, params = cheng_small
    x = jax.random.uniform(jax.random.key(4), (1, 64, 64, 3))
    out = model.apply(params, x, noisequant=False)
    assert np.isfinite(float(jnp.sum(out["x_hat"])))
    assert bool(jnp.all(out["likelihoods"]["y"] > 0))


def test_codec_roundtrip_matches_validate(cheng_small):
    model, params = cheng_small
    x = jax.random.uniform(jax.random.key(5), (1, 64, 64, 3))
    codec = Cheng2020Codec(model, params)
    codec.update(force=True)
    comp = codec.compress(x)
    assert len(comp["strings"][0]) == 1  # single y stream per image
    dec = codec.decompress(comp["strings"], comp["shape"])
    fwd = model.apply(params, x, noisequant=False)
    # decode and validate run through differently-fused XLA programs, so
    # agreement is to float noise, not bit-exact (encoder/decoder agreement
    # IS bit-exact — see test_codec_deterministic)
    want = np.clip(np.asarray(fwd["x_hat"]), 0, 1)
    np.testing.assert_allclose(np.asarray(dec["x_hat"]), want, atol=5e-5)


def test_codec_deterministic(cheng_small):
    model, params = cheng_small
    x = jax.random.uniform(jax.random.key(6), (1, 64, 64, 3))
    codec = Cheng2020Codec(model, params)
    codec.update(force=True)
    comp = codec.compress(x)
    a = np.asarray(codec.decompress(comp["strings"], comp["shape"])["x_hat"])
    b = np.asarray(codec.decompress(comp["strings"], comp["shape"])["x_hat"])
    assert np.array_equal(a, b)


def test_tpu_coder_roundtrip_matches_host(cheng_small):
    model, params = cheng_small
    x = jax.random.uniform(jax.random.key(7), (1, 64, 64, 3))
    host = Cheng2020Codec(model, params, coder="host")
    host.update(force=True)
    tpu = Cheng2020Codec(model, params, coder="tpu")
    tpu.update(force=True)
    ch = host.compress(x)
    ct = tpu.compress(x)
    a = np.asarray(host.decompress(ch["strings"], ch["shape"])["x_hat"])
    b = np.asarray(tpu.decompress(ct["strings"], ct["shape"])["x_hat"])
    np.testing.assert_array_equal(a, b)
    # tpu mode uses per-pass frame lists; host mode one flushed stream
    assert isinstance(ch["strings"][0][0], bytes)
    assert not isinstance(ct["strings"][0][0], bytes) or \
        ct["strings"][0] == ch["strings"][0]  # (host fallback case)
    # second call rides the speculative hwm-sliced pull; same frames
    ct2 = tpu.compress(x)
    assert ct2["strings"] == ct["strings"]
