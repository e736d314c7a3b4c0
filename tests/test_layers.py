"""Layer kit: torch numerical parity (geometry/conversion), lattice helpers.

torch (CPU) is available in this image, so conv/deconv/GDN geometry is
verified against freshly-built torch modules with converted weights —
this is the same conversion the .pth checkpoint importer uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from hyres_tpu.nn import (
    AttentionBlock,
    CheckboardMaskedConv,
    Conv,
    Deconv,
    GDN,
    MultiScaleRefine,
    ResidualBottleneckBlock,
    SEBlock,
    SpatialAttention,
    checkerboard,
    pixel_shuffle,
)
from hyres_tpu.nn.checkerboard import ANCHOR, NON_ANCHOR


def _t2j_conv(w):  # torch (O,I,kh,kw) -> jax HWIO
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 1, 0)))


def _t2j_deconv(w):  # torch (I,O,kh,kw) -> flipped HWIO
    w = w.detach().numpy().transpose(2, 3, 0, 1)  # (kh,kw,I,O)
    return jnp.asarray(w[::-1, ::-1].copy())


def test_conv_stride2_matches_torch(rng_np):
    x = rng_np.random((2, 16, 16, 5)).astype(np.float32)
    tconv = tnn.Conv2d(5, 7, 5, stride=2, padding=2)
    want = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()

    m = Conv(7, kernel=5, stride=2)
    params = m.init(jax.random.key(0), jnp.asarray(x))
    params = jax.tree.map(lambda a: a, params)
    params["params"]["Conv_0"]["kernel"] = _t2j_conv(tconv.weight)
    params["params"]["Conv_0"]["bias"] = jnp.asarray(tconv.bias.detach().numpy())
    got = np.asarray(m.apply(params, jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_deconv_matches_torch(rng_np):
    x = rng_np.random((2, 8, 8, 6)).astype(np.float32)
    tdeconv = tnn.ConvTranspose2d(6, 4, 5, stride=2, padding=2, output_padding=1)
    want = tdeconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    assert want.shape == (2, 4, 16, 16)

    m = Deconv(4)
    params = m.init(jax.random.key(0), jnp.asarray(x))
    params["params"]["kernel"] = _t2j_deconv(tdeconv.weight)
    params["params"]["bias"] = jnp.asarray(tdeconv.bias.detach().numpy())
    got = np.asarray(m.apply(params, jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gdn_matches_reference_formula(rng_np):
    """GDN vs direct torch computation of x / sqrt(beta + x^2 @ gamma)."""
    x = rng_np.random((1, 4, 4, 8)).astype(np.float32) + 0.1
    m = GDN()
    params = m.init(jax.random.key(0), jnp.asarray(x))
    # reparameterized storage -> effective beta/gamma
    off = 2.0 ** -18
    beta_stored = np.asarray(params["params"]["beta"])
    gamma_stored = np.asarray(params["params"]["gamma"])
    beta = np.maximum(beta_stored, (1e-6 + off ** 2) ** 0.5) ** 2 - off ** 2
    gamma = np.maximum(gamma_stored, off) ** 2 - off ** 2
    want = x / np.sqrt(beta + np.einsum("bhwc,dc->bhwd", x * x, gamma))
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # IGDN formula: x * sqrt(beta + gamma @ x^2)
    mi = GDN(inverse=True)
    inv = np.asarray(mi.apply(params, jnp.asarray(x)))
    want_inv = x * np.sqrt(beta + np.einsum("bhwc,dc->bhwd", x * x, gamma))
    np.testing.assert_allclose(inv, want_inv, rtol=1e-5)


def test_checkerboard_masked_conv_only_sees_opposite_parity(rng_np):
    """Output at any position must not depend on same-parity-center taps:
    zeroing non-anchor inputs changes nothing when input is anchor-only."""
    m = CheckboardMaskedConv(4, kernel=5)
    x = rng_np.random((1, 8, 8, 3)).astype(np.float32)
    params = m.init(jax.random.key(0), jnp.asarray(x))
    xa = np.asarray(checkerboard.split(jnp.asarray(x), ANCHOR))
    full = m.apply(params, jnp.asarray(x))
    anchor_only = m.apply(params, jnp.asarray(xa))
    # at non-anchor positions, context from anchor-only equals full-input
    # context restricted to anchor taps
    mask_na = np.asarray(checkerboard.parity_mask(8, 8, NON_ANCHOR))
    got = np.asarray(anchor_only) * mask_na
    # mask pattern check: kernel taps at (i+j) odd only
    ii, jj = np.meshgrid(np.arange(5), np.arange(5), indexing="ij")
    taps = (ii + jj) % 2 == 1
    # brute-force conv with masked kernel on anchor-only input
    k = np.asarray(params["params"]["kernel"]) * taps[:, :, None, None]
    b = np.asarray(params["params"]["bias"])
    pad = np.pad(xa[0], ((2, 2), (2, 2), (0, 0)))
    want = np.zeros((8, 8, 4), np.float32)
    for i in range(8):
        for j in range(8):
            want[i, j] = np.einsum("xyc,xyco->o", pad[i:i + 5, j:j + 5], k) + b
    np.testing.assert_allclose(got[0], want * mask_na[0, :, :, :1], atol=1e-4)


def test_pack_unpack_roundtrip(rng_np):
    x = jnp.asarray(rng_np.random((2, 6, 8, 3)).astype(np.float32))
    for parity in (ANCHOR, NON_ANCHOR):
        packed = checkerboard.pack(x, parity)
        assert packed.shape == (2, 6, 4, 3)
        restored = checkerboard.unpack(packed, parity)
        np.testing.assert_allclose(
            np.asarray(restored), np.asarray(checkerboard.split(x, parity)))
    # the two parities partition the lattice
    total = checkerboard.split(x, ANCHOR) + checkerboard.split(x, NON_ANCHOR)
    np.testing.assert_allclose(np.asarray(total), np.asarray(x))


def test_parity_convention_matches_reference():
    """ANCHOR must be (0::2,0::2)+(1::2,1::2) (checkerboard.py:109-112)."""
    m = np.asarray(checkerboard.parity_mask(4, 4, ANCHOR))[0, :, :, 0]
    want = np.zeros((4, 4))
    want[0::2, 0::2] = 1
    want[1::2, 1::2] = 1
    assert np.array_equal(m, want)


def test_pixel_shuffle_matches_torch(rng_np):
    x = rng_np.random((2, 4, 4, 12)).astype(np.float32)
    want = tnn.PixelShuffle(2)(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 2)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want)


def test_block_shapes(rng_np):
    x = jnp.asarray(rng_np.random((1, 16, 16, 32)).astype(np.float32))
    for mod in (AttentionBlock(), ResidualBottleneckBlock(), SEBlock()):
        p = mod.init(jax.random.key(0), x)
        assert mod.apply(p, x).shape == x.shape
    sa = SpatialAttention()
    p = sa.init(jax.random.key(0), x)
    assert sa.apply(p, x).shape == (1, 16, 16, 1)
    img = jnp.asarray(rng_np.random((1, 32, 32, 3)).astype(np.float32))
    mr = MultiScaleRefine()
    p = mr.init(jax.random.key(0), img)
    assert mr.apply(p, img).shape == img.shape
