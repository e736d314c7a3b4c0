"""LPIPS perceptual distance (AlexNet backbone), JAX/flax.

Capability-parity rebuild of the reference's LPIPS usage
(/root/reference/src/utils/metrics.py:34-41, which calls
``lpips.LPIPS(net='alex')``). The architecture is the public LPIPS
construction (Zhang et al. 2018): AlexNet conv features tapped after
each of the five relus, channel-unit-normalized, squared difference,
learned non-negative 1x1 linear weighting per tap, spatial average,
summed over taps. Inputs in [0,1] are mapped to the LPIPS input space
([-1,1] then shift/scale whitening).

Weights: this environment has no egress, so the pretrained AlexNet
trunk + LPIPS linear heads load from ``HYRES_LPIPS_WEIGHTS`` (a .npz
produced by scripts/egress_fixtures.py from the pip ``lpips`` package)
when available; otherwise LPIPS is reported as None (reference behavior
gates the same way on lpips being installed).

npz layout (torch tensor layouts, converted at load):
  net.conv{0..4}.weight  (O, I, kH, kW)     AlexNet features convs
  net.conv{0..4}.bias    (O,)
  lin{0..4}.weight       (1, C, 1, 1)       non-negative head weights
"""

from __future__ import annotations

import os
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# AlexNet features geometry: (out_ch, kernel, stride, pad), pool after
# the first two relus (torchvision alexnet.features)
_ALEX_CFG = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool 3x3 s2 after these conv indices

# LPIPS input whitening (public lpips ScalingLayer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class AlexFeatures(nn.Module):
    """AlexNet feature trunk; returns the 5 post-relu activations."""

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        outs = []
        for i, (ch, k, s, p) in enumerate(_ALEX_CFG):
            x = nn.Conv(ch, (k, k), strides=(s, s),
                        padding=((p, p), (p, p)), name=f"conv_{i}")(x)
            x = nn.relu(x)
            outs.append(x)
            if i in _POOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return outs


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS:
    """Frozen LPIPS distance; callable is jit-friendly (pure fn of x, y).

    Construct only when weights exist (see ``load_lpips``); raises
    FileNotFoundError otherwise so callers gate explicitly.
    """

    def __init__(self, weights_path: str):
        if not weights_path or not os.path.exists(weights_path):
            raise FileNotFoundError(weights_path)
        raw = np.load(weights_path)
        self.module = AlexFeatures()
        params = {}
        self.lins = []
        for i in range(5):
            w = raw[f"net.conv{i}.weight"]  # (O, I, kH, kW)
            b = raw[f"net.conv{i}.bias"]
            params[f"conv_{i}"] = {
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "bias": jnp.asarray(b),
            }
            lw = raw[f"lin{i}.weight"]  # (1, C, 1, 1)
            self.lins.append(jnp.asarray(lw.reshape(-1).astype(np.float32)))
        self.params = {"params": params}

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """Mean LPIPS distance over the batch; x, y NHWC in [0,1]."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)

        def prep(v):
            v = 2.0 * v - 1.0
            return (v - shift) / scale

        params = jax.lax.stop_gradient(self.params)
        fx = self.module.apply(params, prep(x))
        fy = self.module.apply(params, prep(y))
        total = 0.0
        for a, b, lw in zip(fx, fy, self.lins):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            # non-negative 1x1 linear head, then spatial mean
            total = total + jnp.mean(jnp.sum(d * lw, axis=-1), axis=(1, 2))
        return jnp.mean(total)


def load_lpips() -> LPIPS | None:
    """LPIPS instance if HYRES_LPIPS_WEIGHTS points at a weights npz."""
    path = os.environ.get("HYRES_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    return LPIPS(path)
