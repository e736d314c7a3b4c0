"""LightWeightELIC: forward contract, slice machinery, coder roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyres_tpu.models import ElicCodec, LightWeightELIC


@pytest.fixture(scope="module")
def elic_small():
    # scaled-down config: groups must sum to M (reference uses
    # [16,16,32,64,192] summing to 320, elic.py:36)
    model = LightWeightELIC(N=16, M=24, groups=(4, 4, 8, 8))
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.key(0), x, noisequant=True,
                        rng=jax.random.key(1))
    return model, params


def test_forward_shapes(elic_small):
    model, params = elic_small
    x = jax.random.uniform(jax.random.key(2), (2, 64, 64, 3))
    out = model.apply(params, x, noisequant=True, rng=jax.random.key(3))
    assert out["x_hat"].shape == x.shape
    assert out["likelihoods"]["y"].shape == (2, 8, 8, 24)
    assert out["likelihoods"]["z"].shape == (2, 2, 2, 16)
    assert bool(jnp.all(out["likelihoods"]["y"] > 0))


def test_ste_forward_no_rng(elic_small):
    model, params = elic_small
    x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))
    out = model.apply(params, x, noisequant=False)
    assert np.isfinite(float(jnp.sum(out["x_hat"])))


def test_codec_roundtrip_matches_eval_forward(elic_small):
    model, params = elic_small
    x = jax.random.uniform(jax.random.key(4), (1, 64, 64, 3))
    codec = ElicCodec(model, params)
    codec.update(force=True)
    comp = codec.compress(x)
    # interleaved per-slice anchor/non-anchor strings
    assert len(comp["strings"][0]) == 2 * len(model.groups)
    dec = codec.decompress(comp["strings"], comp["shape"])
    fwd = model.apply(params, x, noisequant=False)
    want = np.clip(np.asarray(fwd["x_hat"]), 0, 1)
    np.testing.assert_allclose(np.asarray(dec["x_hat"]), want, atol=1e-6)


def test_codec_deterministic(elic_small):
    model, params = elic_small
    x = jax.random.uniform(jax.random.key(5), (1, 64, 64, 3))
    codec = ElicCodec(model, params)
    codec.update(force=True)
    comp = codec.compress(x)
    a = np.asarray(codec.decompress(comp["strings"], comp["shape"])["x_hat"])
    b = np.asarray(codec.decompress(comp["strings"], comp["shape"])["x_hat"])
    assert np.array_equal(a, b)


def test_tpu_coder_roundtrip_matches_host(elic_small):
    """coder="tpu": the 22 host codings collapse to device scans; the
    reconstruction must equal the host coder's exactly."""
    model, params = elic_small
    x = jax.random.uniform(jax.random.key(6), (1, 64, 64, 3))
    host = ElicCodec(model, params, coder="host")
    host.update(force=True)
    tpu = ElicCodec(model, params, coder="tpu")
    tpu.update(force=True)
    ch = host.compress(x)
    ct = tpu.compress(x)
    a = np.asarray(host.decompress(ch["strings"], ch["shape"])["x_hat"])
    b = np.asarray(tpu.decompress(ct["strings"], ct["shape"])["x_hat"])
    np.testing.assert_array_equal(a, b)
    # cross-decode: tpu codec detects host-framed payloads and falls back
    c = np.asarray(tpu.decompress(ch["strings"], ch["shape"])["x_hat"])
    np.testing.assert_array_equal(a, c)
    # second call rides the speculative hwm-sliced pull (ELIC's 11-plane
    # layout); frames must be byte-identical to the first exact pull
    ct2 = tpu.compress(x)
    assert ct2["strings"] == ct["strings"]
