"""VGG16 perceptual loss (JAX/flax).

Capability-parity rebuild of the reference's ``VGGLoss``
(/root/reference/src/losses/vgg16.py:7-61): frozen VGG16 feature
extractor, ImageNet normalization, sum of mean-L1 feature distances at
the slices ending at torchvision feature indices [2, 7, 14, 21, 28]
(i.e. after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 — the conv+relu
pairs before each downsampling boundary).

Pretrained weights: this environment has no torchvision weights and no
network egress, so the loss loads ImageNet weights from
``HYRES_VGG16_WEIGHTS`` (a .npz of torch-layout conv kernels) when
available and otherwise falls back to fixed random features (still a
valid perceptual-style metric; clearly flagged). The production training
recipe uses alpha=0 anyway (reference train.sh:9 sets --alpha 0), so the
VGG term is off by default in the headline configs.
"""

from __future__ import annotations

import os
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# conv output channels per torchvision vgg16.features conv layer, with
# 'M' marking maxpools: the standard VGG-16 configuration "D"
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]

# feature-map indices after which the reference slices end ([2,7,14,21,28])
# expressed as "number of (conv+relu) units consumed per slice":
_SLICE_CONVS = [2, 2, 3, 3, 3]  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG16Features(nn.Module):
    """VGG16 feature trunk; returns the 5 slice activations."""

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        outs = []
        conv_count = 0
        slice_idx = 0
        consumed = 0
        for item in _VGG16_CFG:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(item, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"conv_{conv_count}")(x)
            x = nn.relu(x)
            conv_count += 1
            consumed += 1
            if slice_idx < len(_SLICE_CONVS) and consumed == _SLICE_CONVS[slice_idx]:
                outs.append(x)
                slice_idx += 1
                consumed = 0
        return outs


def load_vgg16_params(rng: jax.Array) -> tuple[dict, bool]:
    """Returns (params, pretrained). Loads HYRES_VGG16_WEIGHTS if set."""
    module = VGG16Features()
    params = module.init(rng, jnp.zeros((1, 64, 64, 3)))
    path = os.environ.get("HYRES_VGG16_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return params, False
    raw = np.load(path)
    new = dict(params["params"])
    for i in range(13):
        w = raw[f"features.{_torch_conv_index(i)}.weight"]  # (O, I, kH, kW)
        b = raw[f"features.{_torch_conv_index(i)}.bias"]
        new[f"conv_{i}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(b),
        }
    return {"params": new}, True


def _torch_conv_index(i: int) -> int:
    """i-th conv layer index inside torchvision vgg16.features."""
    idxs = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    return idxs[i]


class VGGLoss:
    """Frozen perceptual loss; callable is jit-friendly (pure fn of x, y)."""

    def __init__(self, rng: jax.Array | None = None):
        self.module = VGG16Features()
        self.params, self.pretrained = load_vgg16_params(
            rng if rng is not None else jax.random.key(0))

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        mean = jnp.asarray(_MEAN)
        std = jnp.asarray(_STD)
        xn = (x - mean) / std
        yn = (y - mean) / std
        params = jax.lax.stop_gradient(self.params)  # frozen extractor
        fx = self.module.apply(params, xn)
        fy = self.module.apply(params, yn)
        loss = 0.0
        for a, b in zip(fx, fy):
            loss = loss + jnp.mean(jnp.abs(a - b))
        return loss
