"""Conditional Gaussian entropy model.

TPU-first re-implementation of the capability of CompressAI 1.2.6's
``GaussianConditional`` (reference import at
/root/reference/models/checkerboard.py:31): likelihood
``Phi((x - mu + .5)/sigma) - Phi((x - mu - .5)/sigma)`` with a
lower-bounded sigma, a 64-entry log-spaced scale table
(/root/reference/models/checkerboard.py:17-21), ``build_indexes`` mapping
each sigma to its table row, and host-side quantized-CDF table baking for
the rANS coder.

Everything in this module that runs per-step is pure jnp (jit/fuse-able);
table baking is numpy on host (cold path, runs once at deployment — the
reference's ``updata`` step, /root/reference/src/updata.py:36-78).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special

from .bound import LIKELIHOOD_BOUND, lower_bound
from .bottleneck import CdfTables

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64


def get_scale_table(smin: float = SCALES_MIN, smax: float = SCALES_MAX,
                    levels: int = SCALES_LEVELS) -> np.ndarray:
    """64 log-spaced sigmas, 0.11 → 256 (reference checkerboard.py:20-21)."""
    return np.exp(np.linspace(math.log(smin), math.log(smax), levels)).astype(np.float32)


def _std_cumulative(x: jax.Array) -> jax.Array:
    """Standard normal CDF via erfc (stable in both tails)."""
    return 0.5 * jax.lax.erfc(-x * (2 ** -0.5))


def gaussian_likelihood(x: jax.Array, scales: jax.Array, means: jax.Array | None = None,
                        scale_bound: float = SCALES_MIN) -> jax.Array:
    """P(round(x) | mu, sigma) under the relaxed box integral; bounded below.

    Always evaluated in f32 — erfc in bf16 collapses the rate signal, so
    under a bf16 compute policy only this tail stays full-precision.
    """
    x = x.astype(jnp.float32)
    scales = scales.astype(jnp.float32)
    if means is not None:
        x = x - means.astype(jnp.float32)
    scales = lower_bound(scales, scale_bound)
    v = jnp.abs(x)
    upper = _std_cumulative((0.5 - v) / scales)
    lower = _std_cumulative((-0.5 - v) / scales)
    return lower_bound(upper - lower, LIKELIHOOD_BOUND)


def quantize_noise(x: jax.Array, rng: jax.Array) -> jax.Array:
    return x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)


def quantize_ste(x: jax.Array) -> jax.Array:
    """Straight-through round (reference compressai.ops.quantize_ste,
    import at /root/reference/models/checkerboard.py:11)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quantize_symbols(x: jax.Array, means: jax.Array | None = None) -> jax.Array:
    """Hard integer symbols for the entropy coder."""
    if means is not None:
        x = x - means
    return jnp.round(x).astype(jnp.int32)


# symbols cross the host hop as int16; the bound leaves headroom below
# int16 max and round-trips exactly through the coder's bypass escape.
# Encoder clips BEFORE coding, so both sides always agree on the integer.
SYMBOL_BOUND = 32000


def quantize_symbols_i16(x: jax.Array, means: jax.Array | None = None) -> jax.Array:
    """Clipped int16 symbols for the host hop (device side)."""
    if means is not None:
        x = x - means
    return jnp.clip(jnp.round(x), -SYMBOL_BOUND, SYMBOL_BOUND).astype(jnp.int16)


def narrow_symbols_i16(sym) -> "np.ndarray":
    """Host-side narrowing of decoded int32 symbols: clamp (never wrap) so
    corrupt-bitstream garbage stays detectable rather than aliasing."""
    return np.clip(sym, -SYMBOL_BOUND, SYMBOL_BOUND).astype(np.int16)


def dequantize(symbols: jax.Array, means: jax.Array | None = None,
               dtype=jnp.float32) -> jax.Array:
    out = symbols.astype(dtype)
    if means is not None:
        out = out + means
    return out


def build_indexes(scales: jax.Array, scale_table: np.ndarray | jax.Array) -> jax.Array:
    """Map each sigma to the smallest table entry >= sigma.

    Same semantics as CompressAI's ``build_indexes`` (used at
    /root/reference/models/checkerboard.py:160): start at the last index
    and decrement once per table entry that is >= the value.
    """
    table = jnp.asarray(scale_table)
    scales = lower_bound(scales, table[0])
    # index = number of strict lower entries among table[:-1]
    return jnp.sum(scales[..., None] > table[:-1], axis=-1).astype(jnp.int32)


def build_gaussian_tables(scale_table: np.ndarray, tail_mass: float = 1e-9) -> CdfTables:
    """Bake per-scale quantized CDF tables (host, cold path)."""
    from ..coding.cdf import pmf_to_quantized_cdf

    scale_table = np.asarray(scale_table, np.float64)
    multiplier = -scipy.special.ndtri(tail_mass / 2.0)
    pmf_center = np.ceil(scale_table * multiplier).astype(np.int32)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())

    samples = np.abs(np.arange(max_length, dtype=np.int64)[None, :] - pmf_center[:, None])
    samples_scale = scale_table[:, None]
    upper = scipy.special.ndtr((0.5 - samples) / samples_scale)
    lower = scipy.special.ndtr((-0.5 - samples) / samples_scale)
    pmf = upper - lower
    tail = 2.0 * lower[:, :1]

    n_scales = len(scale_table)
    cdfs = np.zeros((n_scales, max_length + 2), np.int32)
    for i in range(n_scales):
        n = int(pmf_length[i])
        row = pmf_to_quantized_cdf(
            np.concatenate([pmf[i, :n], tail[i]]).astype(np.float32))
        cdfs[i, : len(row)] = row
    return CdfTables(
        quantized_cdf=cdfs,
        cdf_length=pmf_length + 2,
        offset=-pmf_center,
    )
