"""Quantization modes (reference models/utils/quantization.py:4-13).

``noise``: additive U(-.5, .5); ``ste``: straight-through round;
default: hard round.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize(x: jax.Array, mode: str = "noise", *, rng: jax.Array | None = None) -> jax.Array:
    if mode == "noise":
        if rng is None:
            raise ValueError("noise quantization needs an rng key")
        return x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)
    if mode == "ste":
        return x + jax.lax.stop_gradient(jnp.round(x) - x)
    return jnp.round(x)
