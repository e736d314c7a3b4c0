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
