"""Sharded batched inference over the virtual 8-device mesh (VERDICT r1
item 9: multi-chip inference path)."""

import jax
import jax.numpy as jnp
import numpy as np

from hyres_tpu.models.hyres import ResidualJPEGCompression
from hyres_tpu.parallel import data_parallel_mesh, make_sharded_eval


def test_sharded_eval_matches_single_device():
    assert len(jax.devices()) >= 8  # conftest forces 8 virtual CPU devices
    model = ResidualJPEGCompression(N=16, M=24, jpeg_quality=10)
    batch = jax.random.uniform(jax.random.key(0), (8, 64, 64, 3))
    params = model.init(jax.random.key(1), batch[:1], noisequant=True,
                        rng=jax.random.key(2))

    mesh8 = data_parallel_mesh(jax.devices()[:8])
    mesh1 = data_parallel_mesh(jax.devices()[:1])
    out8 = make_sharded_eval(model, mesh8)(params, batch)
    out1 = make_sharded_eval(model, mesh1)(params, batch)

    assert out8["x_hat"].shape == batch.shape
    assert bool(jnp.all(jnp.isfinite(out8["psnr"])))
    # batch-sharded eval is the same math: agreement to float noise
    np.testing.assert_allclose(np.asarray(out8["psnr"]),
                               np.asarray(out1["psnr"]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out8["bpp_est"]),
                               np.asarray(out1["bpp_est"]), rtol=1e-4)


def test_spatial_sharded_single_image_eval():
    """Halo'd spatial sharding: one image's rows split over the 8-device
    mesh reproduce the unsharded eval forward (interior exactly, strip
    boundaries within float/entropy-edge tolerance)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyres_tpu.models import LightWeightCheckerboard
    from hyres_tpu.parallel import data_parallel_mesh
    from hyres_tpu.parallel.spatial import make_spatial_eval

    model = LightWeightCheckerboard(N=16, M=24)
    H = 64 * 8  # one 64-cell per device
    x = jax.random.uniform(jax.random.key(0), (1, H, 64, 3))
    params = model.init(jax.random.key(1), x[:, :64], noisequant=True,
                        rng=jax.random.key(2))

    mesh = data_parallel_mesh()
    assert mesh.devices.size == 8
    eval_fn = make_spatial_eval(model, mesh, halo=128)
    x_hat, bits = eval_fn(params, x)
    assert x_hat.shape == x.shape
    want = model.apply(params, x, noisequant=False)["x_hat"]
    # the transforms are local, but latent ROUNDING can flip at isolated
    # near-.5 values when a strip's context differs by float noise — so
    # the criterion is distributional, not pointwise-exact
    err = np.abs(np.asarray(x_hat) - np.asarray(want))
    assert np.mean(err) < 1e-3, np.mean(err)
    assert np.mean(err > 1e-2) < 0.02, np.mean(err > 1e-2)
    assert np.isfinite(float(bits)) and float(bits) > 0
