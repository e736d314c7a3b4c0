"""Multi-chip inference: sharded batched evaluation over a device mesh.

The reference has no distributed inference (its only parallelism is
single-process DataParallel training, SURVEY §2.5); serving many images
on a TPU slice is pure headroom. This module evaluates a BATCH of images
with the batch axis sharded over the 'data' axis of a
``jax.sharding.Mesh``: XLA partitions the whole eval forward (JPEG base
layer included for HyRES) across chips, with no collectives needed until
the scalar metrics are averaged.

Used by ``__graft_entry__.dryrun_multichip`` (driver-validated on a
virtual 8-device mesh) and tests/test_parallel_inference.py.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sharded_eval(model, mesh: Mesh) -> Callable:
    """Batched eval-forward with the batch sharded over mesh axis 'data'.

    Returns eval_fn(params, batch) -> {x_hat, psnr, bpp_est} where psnr
    and bpp_est are per-image vectors (bpp_est is the likelihood
    estimate; real byte-exact rates come from the codec wrappers).
    """
    batch_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    @jax.jit
    def eval_fn(params, batch) -> Dict[str, jax.Array]:
        out = model.apply(params, batch, noisequant=False)
        x_hat = jnp.clip(out["x_hat"], 0.0, 1.0)
        mse = jnp.mean((x_hat - batch) ** 2, axis=(1, 2, 3))
        num_px = batch.shape[1] * batch.shape[2]
        bpp = sum(
            -jnp.sum(jnp.log2(l), axis=(1, 2, 3)) / num_px
            for l in out["likelihoods"].values())
        if "jpeg_bpp_loss" in out:
            bpp = bpp + out["jpeg_bpp_loss"]
        return {
            "x_hat": x_hat,
            "psnr": -10.0 * jnp.log10(mse),
            "bpp_est": bpp,
        }

    def run(params, batch):
        params = jax.device_put(params, replicated)
        batch = jax.device_put(jnp.asarray(batch), batch_sharding)
        return eval_fn(params, batch)

    return run
