"""Checkerboard lattice helpers (NHWC).

The reference's codecs split latents into "anchor" and "non-anchor" halves
of a checkerboard lattice via dense scatter assignments
(/root/reference/models/checkerboard.py:106-112, elic.py:168-171). On TPU
we express the same thing as:

- parity masks (one elementwise multiply, fused into neighbors by XLA),
- *width-halved packing*: each parity class of an (H, W) lattice is a dense
  (H, W/2) tensor; the pack/unpack is a pure elementwise select on a
  (H, W/2, 2) view — no gathers, no dynamic shapes. This generalizes the
  packing trick the reference uses only inside ELIC's coder
  (/root/reference/models/elic.py:341-351) and makes the entropy coder
  operate on dense tensors.

Parity convention (documented once, per SURVEY Q8): ``ANCHOR`` is the
(i + j) even class, i.e. positions (0::2, 0::2) and (1::2, 1::2), matching
checkerboard.py/elic.py in the reference (cheng2020.py swaps the labels;
its model code accounts for that locally).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ANCHOR = 0       # (i + j) % 2 == 0
NON_ANCHOR = 1   # (i + j) % 2 == 1


def parity_mask(h: int, w: int, parity: int, dtype=jnp.float32) -> jax.Array:
    """(1, H, W, 1) mask: 1 where (i + j) % 2 == parity."""
    ii = jnp.arange(h)[:, None]
    jj = jnp.arange(w)[None, :]
    return (((ii + jj) % 2) == parity).astype(dtype)[None, :, :, None]


def split(x: jax.Array, parity: int) -> jax.Array:
    """Zero out the opposite parity class (reference ``_split_tensor``,
    checkerboard.py:149-157)."""
    return x * parity_mask(x.shape[1], x.shape[2], parity, x.dtype)


def pack(x: jax.Array, parity: int) -> jax.Array:
    """(B, H, W, C) → (B, H, W/2, C): dense view of one parity class.

    Row i of the output holds x[i, j] for all j with (i + j) % 2 == parity.
    """
    B, H, W, C = x.shape
    xp = x.reshape(B, H, W // 2, 2, C)
    row_odd = (jnp.arange(H) % 2 == 1)[None, :, None, None]
    take_second = row_odd ^ (parity == 1)
    return jnp.where(take_second, xp[:, :, :, 1, :], xp[:, :, :, 0, :])


def unpack(x_half: jax.Array, parity: int) -> jax.Array:
    """(B, H, W/2, C) → (B, H, W, C) with zeros at the opposite parity."""
    B, H, Wh, C = x_half.shape
    row_odd = (jnp.arange(H) % 2 == 1)[None, :, None, None]
    take_second = row_odd ^ (parity == 1)
    zero = jnp.zeros_like(x_half)
    first = jnp.where(take_second, zero, x_half)
    second = jnp.where(take_second, x_half, zero)
    out = jnp.stack([first, second], axis=3)  # (B, H, W/2, 2, C)
    return out.reshape(B, H, Wh * 2, C)
