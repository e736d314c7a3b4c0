"""LightWeightELIC: channel-slice + checkerboard codec (TPU-native).

Re-implements the capability of the reference's ELIC-style baseline
(/root/reference/models/elic.py:26-609): N=192, M=320, 5 channel slices
``groups = [16, 16, 32, 64, 192]``. Same g_a/g_s/h_a/h_s topology as the
checkerboard codec; adds per-slice channel-context transforms
(elic.py:89-98), per-slice checkerboard context convs (101-105), and
per-slice parameter-aggregation stacks (108-116).

Forward (elic.py:175-312): each slice runs the two-pass checkerboard
quantization with the dual path the reference uses during noise training
(noise for the rate estimate, STE for what feeds g_s and the next
slice's context; elic.py:209-214, 238-244), with explicit zeroing of
opposite-parity positions. Param order per slice is (means, scales) —
note this is the OPPOSITE chunk order of the checkerboard model.

Coder (elic.py:330-594): per-slice two-pass coding over width-halved
dense packings of each parity class — the packing trick the reference
implements with scatter assignments is nn/checkerboard.pack here.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy import EntropyBottleneck, gaussian_likelihood, quantize_ste
from ..nn import CheckboardMaskedConv, Conv, checkerboard, conv1x1
from ..nn.checkerboard import ANCHOR, NON_ANCHOR
from ..nn.quantizer import quantize
from .checkerboard import (
    AnalysisTransform,
    HyperAnalysis,
    HyperSynthesis,
    SynthesisTransform,
)

GROUPS = (16, 16, 32, 64, 192)


class ChannelContext(nn.Module):
    """cc_transform: three 5x5 stride-1 convs (elic.py:89-98)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = Conv(224, kernel=5, stride=1)(x)
        x = nn.relu(x)
        x = Conv(128, kernel=5, stride=1)(x)
        x = nn.relu(x)
        return Conv(self.out_channels, kernel=5, stride=1)(x)


class SliceParamAggregation(nn.Module):
    """1x1 stack -> 640 -> 512 -> 2g (elic.py:108-116)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = conv1x1(640)(x)
        x = nn.relu(x)
        x = conv1x1(512)(x)
        x = nn.relu(x)
        return conv1x1(self.out_channels)(x)


class LightWeightELIC(nn.Module):
    N: int = 192
    M: int = 320
    groups: Tuple[int, ...] = GROUPS
    # bf16 activation policy for the transform stacks (see
    # LightWeightCheckerboard.compute_dtype); slice context/aggregation and
    # entropy models stay f32.
    compute_dtype: Any = None

    def _cd(self, x):
        return x if self.compute_dtype is None else x.astype(self.compute_dtype)

    def setup(self):
        assert sum(self.groups) == self.M
        self.g_a = AnalysisTransform(self.N, self.M)
        self.g_s = SynthesisTransform(self.N)
        self.h_a = HyperAnalysis(self.N)
        self.h_s = HyperSynthesis(self.N, self.M)
        self.entropy_bottleneck = EntropyBottleneck(self.N)
        # cc_transforms[i-1] produces the (mean, scale) channel context for
        # slice i (2 * groups[i] channels), i = 1..S-1 (elic.py:89-98)
        self.cc_transforms = [
            ChannelContext(2 * self.groups[i], name=f"cc_transforms_{i - 1}")
            for i in range(1, len(self.groups))
        ]
        self.context_prediction = [
            CheckboardMaskedConv(2 * g, name=f"context_prediction_{i}")
            for i, g in enumerate(self.groups)
        ]
        self.param_aggregation = [
            SliceParamAggregation(2 * g, name=f"param_aggregation_{i}")
            for i, g in enumerate(self.groups)
        ]

    # ---- jit-able pieces (also reused by the coder) ----------------------

    def analysis(self, x):
        y = self.g_a(self._cd(x))
        z = self.h_a(y)
        return y.astype(jnp.float32), z.astype(jnp.float32)

    def synthesis(self, y_hat):
        return self.g_s(self._cd(y_hat)).astype(jnp.float32)

    def hyper_synthesis(self, z_hat):
        lp = self.h_s(self._cd(z_hat)).astype(jnp.float32)
        means, scales = jnp.split(lp, 2, axis=-1)
        return means, scales

    def eb_medians(self):
        return self.entropy_bottleneck.medians()

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()

    def slice_support(self, i: int, y_hat_first, y_hat_prev, latent_means,
                      latent_scales):
        """Support tensor for slice i (elic.py:175-192): hyper params plus
        channel context from slice 0 and slice i-1."""
        if i == 0:
            return jnp.concatenate([latent_means, latent_scales], axis=-1)
        if i == 1:
            cc_in = y_hat_first
        else:
            cc_in = jnp.concatenate([y_hat_first, y_hat_prev], axis=-1)
        cc = self.cc_transforms[i - 1](cc_in)
        cc_mean, cc_scale = jnp.split(cc, 2, axis=-1)
        return jnp.concatenate([cc_mean, cc_scale, latent_means, latent_scales],
                               axis=-1)

    def slice_anchor_params(self, i: int, support):
        """(means, scales) for the anchor pass; ctx is zeros (elic.py:383-390)."""
        g = self.groups[i]
        zeros_ctx = jnp.zeros(support.shape[:-1] + (2 * g,), support.dtype)
        p = self.param_aggregation[i](jnp.concatenate([zeros_ctx, support], axis=-1))
        means, scales = jnp.split(p, 2, axis=-1)
        return means, scales

    def slice_nonanchor_params(self, i: int, support, y_anchor_hat):
        ctx = self.context_prediction[i](y_anchor_hat)
        p = self.param_aggregation[i](jnp.concatenate([ctx, support], axis=-1))
        means, scales = jnp.split(p, 2, axis=-1)
        return means, scales

    # ---- training forward -------------------------------------------------

    def _process_slice(self, i, y_slice, support, noisequant, rng):
        H, W = y_slice.shape[1], y_slice.shape[2]
        rng_a, rng_n = (jax.random.split(rng) if rng is not None else (None, None))

        means_a, scales_a = self.slice_anchor_params(i, support)
        y_anchor = checkerboard.split(y_slice, ANCHOR)
        if noisequant:
            y_anchor_q = quantize(y_anchor, "noise", rng=rng_a)
            y_anchor_q_gs = quantize(y_anchor, "ste")
        else:
            y_anchor_q = quantize(y_anchor - means_a, "ste") + means_a
            y_anchor_q_gs = y_anchor_q
        y_anchor_q = checkerboard.split(y_anchor_q, ANCHOR)
        y_anchor_q_gs = checkerboard.split(y_anchor_q_gs, ANCHOR)

        means_n, scales_n = self.slice_nonanchor_params(i, support, y_anchor_q)
        mask_a = checkerboard.parity_mask(H, W, ANCHOR, y_slice.dtype)
        scales_hat = mask_a * scales_a + (1 - mask_a) * scales_n
        means_hat = mask_a * means_a + (1 - mask_a) * means_n
        lik = gaussian_likelihood(y_slice, scales_hat, means_hat)

        y_non = checkerboard.split(y_slice, NON_ANCHOR)
        if noisequant:
            y_non_q = quantize(y_non, "noise", rng=rng_n)
            y_non_q_gs = quantize(y_non, "ste")
        else:
            y_non_q = quantize(y_non - means_n, "ste") + means_n
            y_non_q_gs = y_non_q
        y_non_q = checkerboard.split(y_non_q, NON_ANCHOR)
        y_non_q_gs = checkerboard.split(y_non_q_gs, NON_ANCHOR)

        return y_anchor_q + y_non_q, y_anchor_q_gs + y_non_q_gs, lik

    def __call__(self, x, noisequant: bool = False,
                 rng: jax.Array | None = None) -> Dict:
        y, z = self.analysis(x)

        rng_z = rng_s = None
        if rng is not None:
            rng_z, rng_s = jax.random.split(rng)
        z_hat, z_lik = self.entropy_bottleneck(z, noise=rng is not None, rng=rng_z)
        if not noisequant:
            med = self.eb_medians()
            z_hat = quantize_ste(z - med) + med

        latent_means, latent_scales = self.hyper_synthesis(z_hat)

        bounds = []
        acc = 0
        for g in self.groups[:-1]:
            acc += g
            bounds.append(acc)
        splits = list(jnp.split(y, bounds, axis=-1))
        y_hat_slices: List[jax.Array] = []
        y_hat_gs: List[jax.Array] = []
        liks: List[jax.Array] = []
        for i, y_slice in enumerate(splits):
            sub = (jax.random.fold_in(rng_s, i) if rng_s is not None else None)
            support = self.slice_support(
                i,
                y_hat_slices[0] if y_hat_slices else None,
                y_hat_slices[-1] if y_hat_slices else None,
                latent_means, latent_scales)
            y_hat, y_hat_for_gs, lik = self._process_slice(
                i, y_slice, support, noisequant, sub)
            y_hat_slices.append(y_hat)
            y_hat_gs.append(y_hat_for_gs)
            liks.append(lik)

        y_hat_full = jnp.concatenate(y_hat_gs, axis=-1)
        x_hat = self.synthesis(y_hat_full)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": jnp.concatenate(liks, axis=-1), "z": z_lik},
        }
