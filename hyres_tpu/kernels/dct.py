"""Pallas TPU kernels: fused blockwise DCT+quantize / dequant+IDCT.

The JPEG transform path's hot op is the 8x8 DCT over every block of every
plane. Instead of many tiny 8x8 matmuls (which underutilize the 128x128
MXU), both directions are expressed as ONE dense matmul per block batch
using the Kronecker identity

    vec(D X D^T) = (D (x) D) vec(X)

so a tile of T blocks is a (T, 64) @ (64, 64) MXU contraction, with the
level shift, quantizer divide, round-away-from-zero, and clip fused into
the same kernel (one HBM round trip per tile instead of five elementwise
passes). Replaces the libjpeg C DCT the reference uses via
/root/reference/models/utils/turbo_jpeg_compression.py.

Falls back to the plain-XLA path (jpeg/core.py) off-TPU; correctness is
tested in interpret mode against the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 512  # blocks per grid step: (512, 64) x (64, 64) MXU work


def _kron_dct_matrix() -> np.ndarray:
    x = np.arange(8)
    u = np.arange(8)[:, None]
    d = np.cos((2 * x + 1) * u * np.pi / 16) * 0.5
    d[0, :] *= 1 / np.sqrt(2)
    return np.kron(d, d).astype(np.float32)  # (64, 64): row uv, col xy


_KRON = _kron_dct_matrix()


def _fdct_kernel(x_ref, m_ref, invq_ref, out_ref):
    # x: (TILE, 64) pixel blocks; m: (64, 64) kron DCT^T; invq: (1, 64)
    shifted = x_ref[:] - 128.0
    coef = jnp.dot(shifted, m_ref[:], preferred_element_type=jnp.float32)
    q = coef * invq_ref[:]
    rounded = jnp.sign(q) * jnp.floor(jnp.abs(q) + 0.5)
    out_ref[:] = jnp.clip(rounded, -1023.0, 1023.0).astype(jnp.int32)


def _idct_kernel(c_ref, m_ref, q_ref, out_ref):
    # c: (TILE, 64) quantized coefficients; m: (64, 64) kron DCT; q: (1, 64)
    deq = c_ref[:].astype(jnp.float32) * q_ref[:]
    pix = jnp.dot(deq, m_ref[:], preferred_element_type=jnp.float32) + 128.0
    out_ref[:] = jnp.clip(pix, 0.0, 255.0)


def _pad_rows(x: jax.Array, mult: int) -> jax.Array:
    n = x.shape[0]
    pad = (-n) % mult
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x


@functools.partial(jax.jit, static_argnames=("interpret",))
def fdct_quant_blocks(blocks: jax.Array, qtbl: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """(N, 64) pixel blocks in [0,255] -> (N, 64) quantized coefficients.

    Coefficient order: natural row-major (matches jpeg/core layout).
    """
    n = blocks.shape[0]
    x = _pad_rows(blocks.astype(jnp.float32), _TILE)
    m = jnp.asarray(_KRON.T)  # right-multiply form
    invq = (1.0 / qtbl.astype(jnp.float32)).reshape(1, 64)
    grid = x.shape[0] // _TILE
    out = pl.pallas_call(
        _fdct_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, 64), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        interpret=interpret,
    )(x, m, invq)
    return out[:n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def dequant_idct_blocks(coef: jax.Array, qtbl: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """(N, 64) quantized coefficients -> (N, 64) pixels in [0,255]."""
    n = coef.shape[0]
    c = _pad_rows(coef.astype(jnp.int32), _TILE)
    m = jnp.asarray(_KRON)  # inverse: pix = coef_flat @ KRON (since KRON^-1 = KRON^T)
    q = qtbl.astype(jnp.float32).reshape(1, 64)
    grid = c.shape[0] // _TILE
    out = pl.pallas_call(
        _idct_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, 64), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(c.shape, jnp.float32),
        interpret=interpret,
    )(c, m, q)
    return out[:n]
