"""Rate-distortion loss (reference /root/reference/src/losses/rd_loss.py:8-44).

``loss = lambda * MSE * 255^2 + bpp + alpha * VGG * 255^2`` where bpp is
the residual codec rate (-log2 likelihood sums / num_pixels) PLUS the
observed JPEG rate (a constant w.r.t. parameters, SURVEY Q12). Also
reports the y/z bpp split, exactly like the reference output dict.
"""

from __future__ import annotations

import math
from typing import Callable, Dict

import jax
import jax.numpy as jnp


def rate_distortion_loss(output: Dict, target: jax.Array, lmbda: float = 0.004,
                         alpha: float = 0.001,
                         vgg_fn: Callable | None = None) -> Dict:
    B, H, W, _ = target.shape
    num_pixels = B * H * W
    log2 = math.log(2.0)

    y_bpp = -jnp.sum(jnp.log(output["likelihoods"]["y"])) / (log2 * num_pixels)
    z_bpp = -jnp.sum(jnp.log(output["likelihoods"]["z"])) / (log2 * num_pixels)
    residual_bpp = y_bpp + z_bpp
    jpeg_bpp = output.get("jpeg_bpp_loss", jnp.float32(0.0))
    bpp = residual_bpp + jpeg_bpp

    mse = jnp.mean((output["x_hat"] - target) ** 2) * 255.0 ** 2
    vgg = (vgg_fn(output["x_hat"], target) if (vgg_fn is not None and alpha != 0)
           else jnp.float32(0.0)) * 255.0 ** 2

    loss = lmbda * mse + bpp + alpha * vgg
    return {
        "loss": loss,
        "mse_loss": mse,
        "vgg_loss": vgg,
        "bpp_loss": bpp,
        "residual_bpp_loss": residual_bpp,
        "jpeg_bpp_loss": jpeg_bpp,
        "y_bpp_loss": y_bpp,
        "z_bpp_loss": z_bpp,
    }
