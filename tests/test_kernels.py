"""Pallas DCT kernels vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyres_tpu.jpeg import core, tables
from hyres_tpu.kernels.dct import dequant_idct_blocks, fdct_quant_blocks


def _xla_fdct(blocks_flat, qtbl):
    d = np.asarray(core.dct_matrix())
    x = blocks_flat.reshape(-1, 8, 8) - 128.0
    coef = np.einsum("ux,nxy,vy->nuv", d, x, d)
    q = coef / qtbl.reshape(8, 8)
    q = np.sign(q) * np.floor(np.abs(q) + 0.5)
    return np.clip(q, -1023, 1023).astype(np.int32).reshape(-1, 64)


def test_fdct_kernel_matches_xla(rng_np):
    qy, _ = tables.quality_to_qtables(50)
    blocks = (rng_np.random((700, 64)) * 255).astype(np.float32)
    want = _xla_fdct(blocks, qy)
    got = np.asarray(fdct_quant_blocks(jnp.asarray(blocks), jnp.asarray(qy),
                                       interpret=True))
    # rounding at exact .5 boundaries can differ by 1 ulp of the divide;
    # allow a tiny fraction of off-by-one coefficients
    mismatch = np.sum(got != want)
    assert mismatch <= blocks.size * 0.001, f"{mismatch} mismatches"
    assert np.max(np.abs(got - want)) <= 1


def test_idct_kernel_matches_xla(rng_np):
    qy, _ = tables.quality_to_qtables(50)
    coef = rng_np.integers(-40, 40, (700, 64)).astype(np.int32)
    d = np.asarray(core.dct_matrix())
    deq = coef.reshape(-1, 8, 8).astype(np.float32) * qy.reshape(8, 8)
    want = np.einsum("xu,nuv,yv->nxy", d.T, deq, d.T) + 128.0
    want = np.clip(want, 0, 255).reshape(-1, 64)
    got = np.asarray(dequant_idct_blocks(jnp.asarray(coef), jnp.asarray(qy),
                                         interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_roundtrip_through_kernels(rng_np):
    """fdct -> idct through the kernels stays close to the input."""
    qy = np.ones(64, np.int32)  # quality-100-like: near-lossless
    blocks = (rng_np.random((260, 64)) * 255).astype(np.float32)
    coef = fdct_quant_blocks(jnp.asarray(blocks), jnp.asarray(qy), interpret=True)
    rec = dequant_idct_blocks(coef, jnp.asarray(qy), interpret=True)
    assert float(jnp.max(jnp.abs(rec - blocks))) < 2.0
