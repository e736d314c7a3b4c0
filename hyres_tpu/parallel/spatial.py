"""Single-image spatially-sharded inference over a device mesh.

The reference has no multi-device inference at all (its DataParallel is
training-only, /root/reference/src/utils/dataset_utils.py:76-82). The
TPU-native way to cut single-image latency across chips is to shard the
IMAGE: each device evaluates a horizontal strip extended by a halo that
covers the receptive field, and the strips concatenate back into the
full reconstruction (SURVEY §5.7's "spatial tiling over a device mesh"
extension; NOTES roadmap #6).

This is a shard_map program: the input is replicated (one image is a few
MB — far cheaper than the activations it avoids), each device slices its
strip + halo by its mesh coordinate, runs the full eval forward, and
crops the valid rows.

CONTRACT (precise): this is a RECONSTRUCTION-SERVING path, not a codec
path — strips do not produce (or consume) the single-image bitstream,
and the returned bits are telemetry (valid-row likelihood bits), not a
byte count. The output approximates the unsharded eval forward: the conv
transforms are exact given the halo, but each strip quantizes its
latents against ITS OWN entropy-model estimates, whose receptive field
near strip boundaries differs from the full image's, so individual
latent roundings may flip within ~halo of a boundary. Guarantee tested
(tests/test_parallel_inference.py): interior rows bit-match a haloed
single-strip forward; the full image differs from the unsharded forward
by <1e-3 mean abs err with flips confined to boundary bands.

Coding (compress/decompress) over strips is the tiled path
(models/tiled.py) — strips there are independent codec units.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_spatial_eval(model, mesh: Mesh, halo: int = 64):
    """Build eval_fn(params, x) -> x_hat, sharding one image's rows.

    x: (1, H, W, 3) with H divisible by 64 * mesh devices. halo rows are
    added on each side of every strip (64 = one full hyper-lattice cell,
    covering the conv stacks' receptive field to within float noise).
    """
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]

    def strip_forward(params, x):
        i = jax.lax.axis_index(axis)
        H = x.shape[1]
        strip = H // n_dev
        # clamped slice: interior strips get a symmetric halo; boundary
        # strips slide inward so the tile still has static shape AND the
        # image edge is the true edge (same padding behavior as the
        # unsharded forward at rows 0 and H-1)
        start = jnp.clip(i * strip - halo, 0, H - (strip + 2 * halo))
        tile = jax.lax.dynamic_slice_in_dim(x, start, strip + 2 * halo, axis=1)
        out = model.apply(params, tile, noisequant=False)
        off = i * strip - start
        x_hat = jax.lax.dynamic_slice_in_dim(out["x_hat"], off, strip, axis=1)
        # rate telemetry: likelihood bits of this strip's VALID latent rows
        # only — halo rows are evaluated on 2-3 devices, so summing the
        # full tile would overcount the rate as halo/strip grows. off and
        # strip are multiples of 64, which every latent stride divides.
        tile_h = strip + 2 * halo

        def _valid_bits(l):
            stride = tile_h // l.shape[1]
            v = jax.lax.dynamic_slice_in_dim(
                l, off // stride, strip // stride, axis=1)
            return -jnp.sum(jnp.log2(v))

        bits = sum(_valid_bits(l) for l in out["likelihoods"].values())
        return x_hat, jax.lax.psum(bits, axis)

    @functools.partial(jax.jit, static_argnums=())
    def eval_fn(params, x):
        fn = jax.shard_map(
            strip_forward, mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(None, axis, None, None), P()),
            check_vma=False,
        )
        return fn(params, x)

    return eval_fn
