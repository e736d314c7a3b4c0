"""Evaluation metrics: PSNR, MS-SSIM (+LPIPS gate).

Capability-parity with the reference's ``CompressionMetrics``
(/root/reference/src/utils/metrics.py:6-54). PSNR uses the CORRECT
formula for [0,1] data (the reference's inference CLI has an off-by
-48.13 dB bug, SURVEY Q1 — fixed here). MS-SSIM is a from-scratch JAX
implementation of the standard Wang et al. multi-scale SSIM with the
usual 11x11 sigma-1.5 Gaussian window and 5-scale weights, matching
pytorch_msssim defaults. LPIPS requires AlexNet weights unavailable in
this image; it is gated behind ``HYRES_LPIPS_WEIGHTS`` and reported as
None otherwise.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(x: jax.Array, y: jax.Array) -> jax.Array:
    """Mean per-image PSNR for [0,1] data."""
    mse = jnp.mean((x - y) ** 2, axis=(1, 2, 3))
    return jnp.mean(-10.0 * jnp.log10(mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    g = np.exp(-0.5 * ((np.arange(size) - (size - 1) / 2.0) / sigma) ** 2)
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def _filter2d(x: jax.Array, win: jax.Array) -> jax.Array:
    """Depthwise valid conv of NHWC with a 2D window.

    Precision.HIGHEST is load-bearing: TPU f32 convs default to bf16
    passes, and the E[x^2] - mu^2 variance cancellation then produces
    sign-random variances on flat regions (measured: MS-SSIM of a flat
    -white Kodak image collapsed to ~0 on TPU while exact on CPU)."""
    C = x.shape[-1]
    k = win[:, :, None, None] * jnp.eye(C)[None, None]
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)


def _ssim_components(x, y, win, data_range=1.0):
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_x = _filter2d(x, win)
    mu_y = _filter2d(y, win)
    sxx = _filter2d(x * x, win) - mu_x * mu_x
    syy = _filter2d(y * y, win) - mu_y * mu_y
    sxy = _filter2d(x * y, win) - mu_x * mu_y
    cs = (2 * sxy + c2) / (sxx + syy + c2)
    ssim = ((2 * mu_x * mu_y + c1) / (mu_x ** 2 + mu_y ** 2 + c1)) * cs
    return ssim.mean(axis=(1, 2, 3)), cs.mean(axis=(1, 2, 3))


@functools.partial(jax.jit, static_argnames=("data_range",))
def ms_ssim(x: jax.Array, y: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Multi-scale SSIM, 5 scales, average over batch."""
    win = _gaussian_window()
    weights = jnp.asarray(_MSSSIM_WEIGHTS)
    vals = []
    for i in range(5):
        ssim, cs = _ssim_components(x, y, win, data_range)
        # clip to [0,1]: the E[x^2]-mu^2 variance form can go slightly
        # negative on near-identical inputs, pushing cs/ssim above 1
        vals.append(jnp.where(i < 4, jnp.clip(cs, 0.0, 1.0),
                              jnp.clip(ssim, 0.0, 1.0)))
        if i < 4:
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
            y = jax.lax.reduce_window(
                y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
    stacked = jnp.stack(vals)  # (5, B)
    out = jnp.prod(stacked ** weights[:, None], axis=0)
    return jnp.mean(out)


class CompressionMetrics:
    """compute_all → {psnr, ms-ssim, lpips} (lpips None unless weights set)."""

    def __init__(self):
        from .lpips import load_lpips
        self.lpips_fn = load_lpips()  # None unless HYRES_LPIPS_WEIGHTS set

    def compute_all(self, x: jax.Array, y: jax.Array) -> Dict:
        return {
            "psnr": float(psnr(x, y)),
            "ms-ssim": float(ms_ssim(x, y)),
            "lpips": None if self.lpips_fn is None else float(self.lpips_fn(x, y)),
        }
