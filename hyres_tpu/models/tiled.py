"""Spatially-tiled inference for very large images.

The reference is fully convolutional and simply eats whole images
(SURVEY §5.7a); on TPU the natural large-input mechanism is spatial
tiling (§5.7 closing note): split the image into fixed-size tiles,
process them as ONE batch (so the NN passes are large batched MXU work
and the per-tile rANS streams code in parallel host threads), and
reassemble. Each tile is an independent codec unit — decode needs only
its own streams, which also enables region-of-interest decode.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _grid(size: int, tile: int) -> int:
    return -(-size // tile)


def tiled_compress(codec, x: jax.Array, tile: int = 512) -> Dict:
    """x: (1, H, W, 3) -> tile batch compressed as one codec call."""
    assert x.shape[0] == 1, "tiled mode takes a single image"
    H, W = int(x.shape[1]), int(x.shape[2])
    th, tw = _grid(H, tile), _grid(W, tile)
    pad_h, pad_w = th * tile - H, tw * tile - W
    xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge")
    tiles = xp.reshape(1, th, tile, tw, tile, 3)
    tiles = tiles.transpose(0, 1, 3, 2, 4, 5).reshape(th * tw, tile, tile, 3)
    comp = codec.compress(tiles)
    comp["tile_grid"] = (th, tw, tile)
    comp["image_size"] = (H, W)
    return comp


def tiled_decompress(codec, comp: Dict) -> Dict:
    th, tw, tile = comp["tile_grid"]
    H, W = comp["image_size"]
    if "jpeg_buffers" in comp:
        dec = codec.decompress(comp)
    else:
        dec = codec.decompress(comp["strings"], comp["shape"], comp.get("size"))
    tiles = dec["x_hat"].reshape(1, th, tw, tile, tile, 3)
    img = tiles.transpose(0, 1, 3, 2, 4, 5).reshape(1, th * tile, tw * tile, 3)
    dec["x_hat"] = img[:, :H, :W, :]
    return dec
