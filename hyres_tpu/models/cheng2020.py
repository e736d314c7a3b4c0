"""Cheng2020-anchor + checkerboard context baseline (TPU-native).

Re-implements the capability of the reference's
``Cheng2020withCheckerboard`` (/root/reference/models/cheng2020.py:21-291),
which extends CompressAI's ``Cheng2020Anchor`` (residual blocks +
sub-pixel upsampling, N=M=192) and swaps the serial MaskedConv context
for the checkerboard one.

Parity note (SURVEY Q8): this model family labels the (i+j) ODD class
"anchor" — the opposite of checkerboard.py/elic.py. Internally we map:
cheng-anchor == nn.checkerboard.NON_ANCHOR, cheng-nonanchor == ANCHOR.
The first-coded (context-free) pass is the odd class, exactly like the
reference's squeeze maps (cheng2020.py:250-272).

Coder behavior mirrored exactly: ONE buffered rANS stream carries both
passes (anchor symbols pushed first, then non-anchor, single flush —
cheng2020.py:112-140), and determinism is guaranteed structurally (the
encoder reuses the decoder's compiled programs) rather than by pinning
cudnn flags (cheng2020.py:108,148).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy import EntropyBottleneck, gaussian_likelihood, quantize_ste
from ..nn import (
    CheckboardMaskedConv,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SubpelConv3x3,
    checkerboard,
    conv1x1,
    conv3x3,
)
from ..nn.checkerboard import ANCHOR, NON_ANCHOR
from ..nn.quantizer import quantize

# cheng-anchor = odd parity class (first coded, no context)
CHENG_ANCHOR = NON_ANCHOR
CHENG_NONANCHOR = ANCHOR


class _GA(nn.Module):
    """Cheng2020 analysis: residual blocks with stride (compressai
    Cheng2020Anchor.g_a)."""

    N: int

    @nn.compact
    def __call__(self, x):
        x = ResidualBlockWithStride(self.N, 2)(x)
        x = ResidualBlock(self.N)(x)
        x = ResidualBlockWithStride(self.N, 2)(x)
        x = ResidualBlock(self.N)(x)
        x = ResidualBlockWithStride(self.N, 2)(x)
        x = ResidualBlock(self.N)(x)
        x = conv3x3(self.N, stride=2)(x)
        return x


class _GS(nn.Module):
    """Cheng2020 synthesis: residual blocks + subpixel upsampling."""

    N: int

    @nn.compact
    def __call__(self, y):
        y = ResidualBlock(self.N)(y)
        y = ResidualBlockUpsample(self.N)(y)
        y = ResidualBlock(self.N)(y)
        y = ResidualBlockUpsample(self.N)(y)
        y = ResidualBlock(self.N)(y)
        y = ResidualBlockUpsample(self.N)(y)
        y = ResidualBlock(self.N)(y)
        y = SubpelConv3x3(3)(y)
        return y


class _HA(nn.Module):
    N: int

    @nn.compact
    def __call__(self, y):
        y = conv3x3(self.N)(y)
        y = nn.leaky_relu(y)
        y = conv3x3(self.N)(y)
        y = nn.leaky_relu(y)
        y = conv3x3(self.N, stride=2)(y)
        y = nn.leaky_relu(y)
        y = conv3x3(self.N)(y)
        y = nn.leaky_relu(y)
        y = conv3x3(self.N, stride=2)(y)
        return y


class _HS(nn.Module):
    N: int

    @nn.compact
    def __call__(self, z):
        z = conv3x3(self.N)(z)
        z = nn.leaky_relu(z)
        z = SubpelConv3x3(self.N)(z)
        z = nn.leaky_relu(z)
        z = conv3x3(self.N * 3 // 2)(z)
        z = nn.leaky_relu(z)
        z = SubpelConv3x3(self.N * 3 // 2)(z)
        z = nn.leaky_relu(z)
        z = conv3x3(self.N * 2)(z)
        return z


class _EntropyParams(nn.Module):
    """conv1x1 stack 4N -> 10N/3 -> 8N/3 -> 2N (Cheng2020Anchor)."""

    N: int

    @nn.compact
    def __call__(self, x):
        x = conv1x1(self.N * 10 // 3)(x)
        x = nn.leaky_relu(x)
        x = conv1x1(self.N * 8 // 3)(x)
        x = nn.leaky_relu(x)
        x = conv1x1(self.N * 2)(x)
        return x


class Cheng2020withCheckerboard(nn.Module):
    N: int = 192
    # bf16 activation policy for the transform stacks (see
    # LightWeightCheckerboard.compute_dtype).
    compute_dtype: Any = None

    def _cd(self, x):
        return x if self.compute_dtype is None else x.astype(self.compute_dtype)

    def setup(self):
        self.g_a = _GA(self.N)
        self.g_s = _GS(self.N)
        self.h_a = _HA(self.N)
        self.h_s = _HS(self.N)
        self.entropy_parameters = _EntropyParams(self.N)
        self.context_prediction = CheckboardMaskedConv(2 * self.N)
        self.entropy_bottleneck = EntropyBottleneck(self.N)

    # ---- pieces ------------------------------------------------------------

    def analysis(self, x):
        y = self.g_a(self._cd(x))
        z = self.h_a(y)
        return y.astype(jnp.float32), z.astype(jnp.float32)

    def synthesis(self, y_hat):
        return self.g_s(self._cd(y_hat)).astype(jnp.float32)

    def hyper_synthesis(self, z_hat):
        return self.h_s(self._cd(z_hat)).astype(jnp.float32)

    def entropy_params(self, ctx, hyper):
        p = self.entropy_parameters(jnp.concatenate([ctx, hyper], axis=-1))
        scales, means = jnp.split(p, 2, axis=-1)
        return scales, means

    def context(self, y_anchor_hat):
        return self.context_prediction(y_anchor_hat)

    def eb_medians(self):
        return self.entropy_bottleneck.medians()

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()

    # ---- forward paths -------------------------------------------------------

    def __call__(self, x, noisequant: bool = False,
                 rng: jax.Array | None = None) -> Dict:
        if noisequant:
            return self._forward_train(x, rng)
        return self._validate(x)

    def _forward_train(self, x, rng):
        """Single-pass noise training forward (cheng2020.py:36-62)."""
        y, z = self.analysis(x)
        rng_z, rng_y = jax.random.split(rng)
        z_hat, z_lik = self.entropy_bottleneck(z, noise=True, rng=rng_z)
        y_hat = quantize(y, "noise", rng=rng_y)

        hyper = self.hyper_synthesis(z_hat)
        ctx = self.context_prediction(y_hat)
        # zero ctx at the (odd) cheng-anchor positions (cheng2020.py:48-50)
        H, W = y.shape[1], y.shape[2]
        ctx = ctx * checkerboard.parity_mask(H, W, CHENG_NONANCHOR, ctx.dtype)
        scales, means = self.entropy_params(ctx, hyper)
        y_lik = gaussian_likelihood(y, scales, means)
        x_hat = self.synthesis(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_lik, "z": z_lik}}

    def _validate(self, x):
        """Two-pass STE eval path (cheng2020.py:64-102) — matches decode."""
        y, z = self.analysis(x)
        _, z_lik = self.entropy_bottleneck(z, noise=False)
        med = self.eb_medians()
        z_hat = quantize_ste(z - med) + med

        hyper = self.hyper_synthesis(z_hat)
        H, W = y.shape[1], y.shape[2]
        zeros_ctx = jnp.zeros(y.shape[:-1] + (2 * y.shape[-1],), y.dtype)
        scales_a, means_a = self.entropy_params(zeros_ctx, hyper)
        mask_anchor = checkerboard.parity_mask(H, W, CHENG_ANCHOR, y.dtype)
        means_a = means_a * mask_anchor
        scales_a = scales_a * mask_anchor

        y_hat_anchor = quantize(y - means_a, "ste") + means_a
        y_hat_anchor = y_hat_anchor * mask_anchor
        ctx = self.context_prediction(y_hat_anchor)
        ctx = ctx * (1.0 - mask_anchor)
        scales, means = self.entropy_params(ctx, hyper)
        # compose: anchor positions keep the context-free params
        scales = mask_anchor * scales_a + (1.0 - mask_anchor) * scales
        means = mask_anchor * means_a + (1.0 - mask_anchor) * means
        y_hat = quantize(y - means, "ste") + means
        y_lik = gaussian_likelihood(y, scales, means)
        x_hat = self.synthesis(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_lik, "z": z_lik}}
