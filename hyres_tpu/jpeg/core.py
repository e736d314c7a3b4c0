"""On-device JPEG transform path (XLA; DCT as MXU matmuls).

The reference runs its JPEG base layer on CPU through libturbojpeg inside
a per-image Python loop (/root/reference/models/utils/
turbo_jpeg_compression.py:17-77), forcing a host roundtrip every training
step (/root/reference/models/hyres.py:44-53). Here the whole transform
path — color convert, 4:2:0 subsample, 8x8 DCT, quantization, and their
inverses — is batched jnp running under jit, and the *exact* baseline
Huffman bit count is computed on device (code-length lookups + a cummax
run-length trick), so training never leaves the chip. The host C++
bitstream assembler (coding/csrc/jpeg_bitstream.cpp) is only invoked when
real bytes are needed.

Everything is fully vectorized over batch and blocks: the 8x8 DCT is two
einsum contractions, which XLA tiles onto the MXU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import tables as T


def dct_matrix(dtype=jnp.float32) -> jax.Array:
    """Orthonormal 8x8 DCT-II matrix scaled per JPEG: D[u, x]."""
    x = np.arange(8)
    u = np.arange(8)[:, None]
    d = np.cos((2 * x + 1) * u * np.pi / 16) * 0.5
    d[0, :] *= 1 / np.sqrt(2)
    return jnp.asarray(d, dtype)


def rgb_to_ycbcr(x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """NHWC RGB in [0,1] → integer-rounded Y, Cb, Cr planes in [0,255]."""
    r, g, b = x[..., 0] * 255.0, x[..., 1] * 255.0, x[..., 2] * 255.0
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    clip = lambda p: jnp.clip(jnp.round(p), 0.0, 255.0)
    return clip(y), clip(cb), clip(cr)


def ycbcr_to_rgb(y: jax.Array, cb: jax.Array, cr: jax.Array) -> jax.Array:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0) / 255.0


def downsample_420(p: jax.Array) -> jax.Array:
    """(B, H, W) → (B, H/2, W/2): 2x2 mean, rounded (libjpeg h2v2 box)."""
    B, H, W = p.shape
    q = p.reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    return jnp.round(q)


def upsample_420(p: jax.Array) -> jax.Array:
    """(B, h, w) → (B, 2h, 2w) triangle ("fancy") upsampling: 3:1 stencil
    along each axis with edge clamp — matches libjpeg's default decoder
    filter closely and is a fixed elementwise stencil on TPU."""

    def up1d(a):  # doubles last axis
        left = jnp.concatenate([a[..., :1], a[..., :-1]], axis=-1)
        right = jnp.concatenate([a[..., 1:], a[..., -1:]], axis=-1)
        even = (3.0 * a + left) * 0.25
        odd = (3.0 * a + right) * 0.25
        return jnp.stack([even, odd], axis=-1).reshape(*a.shape[:-1], -1)

    p = up1d(p)                      # width
    p = up1d(p.swapaxes(-1, -2)).swapaxes(-1, -2)  # height
    return p


def _blockify(p: jax.Array) -> jax.Array:
    """(B, H, W) → (B, H/8, W/8, 8, 8)."""
    B, H, W = p.shape
    return p.reshape(B, H // 8, 8, W // 8, 8).transpose(0, 1, 3, 2, 4)


def _unblockify(b: jax.Array) -> jax.Array:
    B, nh, nw, _, _ = b.shape
    return b.transpose(0, 1, 3, 2, 4).reshape(B, nh * 8, nw * 8)


def _round_away(x: jax.Array) -> jax.Array:
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def _use_pallas() -> bool:
    import os

    mode = os.environ.get("HYRES_DCT_KERNEL", "auto")
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    return jax.default_backend() == "tpu"


def fdct_quant(plane: jax.Array, qtbl: jax.Array) -> jax.Array:
    """Plane [0,255] → quantized coefficients (B, nh, nw, 8, 8) int32.

    On TPU: fused Pallas kernel (kernels/dct.py) — one (T,64)x(64,64) MXU
    matmul per tile with quantization fused. Elsewhere: XLA einsum.
    """
    blocks = _blockify(plane)
    B, nh, nw = blocks.shape[:3]
    if _use_pallas():
        from ..kernels.dct import fdct_quant_blocks

        flat = blocks.reshape(B * nh * nw, 64)
        return fdct_quant_blocks(flat, qtbl).reshape(B, nh, nw, 8, 8)
    d = dct_matrix(plane.dtype)
    coef = jnp.einsum("ux,bijxy,vy->bijuv", d, blocks - 128.0, d)
    q = _round_away(coef / qtbl.reshape(8, 8).astype(coef.dtype))
    return jnp.clip(q, -1023, 1023).astype(jnp.int32)


def dequant_idct(coef: jax.Array, qtbl: jax.Array) -> jax.Array:
    """Quantized coefficients → plane in [0,255]."""
    B, nh, nw = coef.shape[:3]
    if _use_pallas():
        from ..kernels.dct import dequant_idct_blocks

        flat = coef.reshape(B * nh * nw, 64)
        pix = dequant_idct_blocks(flat, qtbl).reshape(B, nh, nw, 8, 8)
        return _unblockify(pix)
    d = dct_matrix(jnp.float32)
    c = coef.astype(jnp.float32) * qtbl.reshape(8, 8).astype(jnp.float32)
    blocks = jnp.einsum("xu,bijuv,yv->bijxy", d.T, c, d.T) + 128.0
    return jnp.clip(_unblockify(blocks), 0.0, 255.0)


# ---------------------------------------------------------------------------
# exact on-device Huffman rate accounting
# ---------------------------------------------------------------------------


def _nbits(v: jax.Array) -> jax.Array:
    """JPEG magnitude category: number of bits of |v| (int32 in)."""
    a = jnp.abs(v)
    return (32 - jax.lax.clz(a)) * (a > 0)


def _dc_bits(dc_seq: jax.Array, dc_len: jax.Array) -> jax.Array:
    """dc_seq: (B, N) DC values in scan order → total DC bits per image."""
    prev = jnp.concatenate([jnp.zeros_like(dc_seq[:, :1]), dc_seq[:, :-1]], axis=1)
    s = _nbits(dc_seq - prev)
    return jnp.sum(dc_len[s] + s, axis=1)


def _ac_bits(zz: jax.Array, ac_len: jax.Array) -> jax.Array:
    """zz: (B, N, 64) zigzag-ordered quantized coefficients → AC bits/image.

    Run-lengths between nonzeros computed with a cummax over positions —
    no sequential scan, fully parallel across blocks.
    """
    v = zz[..., 1:]                       # (B, N, 63)
    nz = v != 0
    idx = jnp.arange(1, 64, dtype=jnp.int32)
    marked = jnp.where(nz, idx, 0)
    last_incl = jax.lax.cummax(marked, axis=marked.ndim - 1)
    last_excl = jnp.concatenate(
        [jnp.zeros_like(last_incl[..., :1]), last_incl[..., :-1]], axis=-1)
    run = idx - last_excl - 1             # zeros preceding each position
    s = _nbits(v)
    zrl_len = ac_len[0xF0]
    code = ac_len[(run % 16) * 16 + s] + s + (run // 16) * zrl_len
    bits = jnp.sum(jnp.where(nz, code, 0), axis=-1)
    eob = jnp.where(last_incl[..., -1] < 63, ac_len[0], 0)
    return jnp.sum(bits + eob, axis=1)


class JpegCoefficients(NamedTuple):
    """Quantized coefficient planes + rate, all on device."""

    y: jax.Array        # (B, nh_y, nw_y, 8, 8) int32
    cb: jax.Array       # (B, nh_c, nw_c, 8, 8)
    cr: jax.Array
    scan_bits: jax.Array  # (B,) exact entropy-coded bit count
    height: int         # original image dims (pre-padding)
    width: int


def _pad_to(x: jax.Array, mult: int) -> jax.Array:
    B, H, W, C = x.shape
    ph = (-H) % mult
    pw = (-W) % mult
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return x


@functools.partial(jax.jit, static_argnums=(1,))
def encode_to_coefficients(x: jax.Array, quality: int) -> JpegCoefficients:
    """NHWC [0,1] → quantized 4:2:0 coefficient planes + exact scan bits."""
    H, W = x.shape[1], x.shape[2]
    x = _pad_to(x, 16)
    qy, qc = (jnp.asarray(t) for t in T.quality_to_qtables(quality))
    y, cb, cr = rgb_to_ycbcr(x)
    cb = downsample_420(cb)
    cr = downsample_420(cr)
    cy = fdct_quant(y, qy)
    ccb = fdct_quant(cb, qc)
    ccr = fdct_quant(cr, qc)

    zz = jnp.asarray(T.ZIGZAG)
    B = cy.shape[0]
    mh, mw = ccb.shape[1], ccb.shape[2]

    # luma blocks in MCU scan order: (my, mx, by, bx)
    y_mcu = cy.reshape(B, mh, 2, mw, 2, 8, 8).transpose(0, 1, 3, 2, 4, 5, 6)
    y_seq = y_mcu.reshape(B, mh * mw * 4, 64)
    cb_seq = ccb.reshape(B, mh * mw, 64)
    cr_seq = ccr.reshape(B, mh * mw, 64)

    y_zz = y_seq[..., zz]
    cb_zz = cb_seq[..., zz]
    cr_zz = cr_seq[..., zz]

    dcl = jnp.asarray(T.DC_LUMA_LEN)
    dcc = jnp.asarray(T.DC_CHROMA_LEN)
    acl = jnp.asarray(T.AC_LUMA_LEN)
    acc = jnp.asarray(T.AC_CHROMA_LEN)
    bits = (
        _dc_bits(y_seq[..., 0], dcl)
        + _dc_bits(cb_seq[..., 0], dcc)
        + _dc_bits(cr_seq[..., 0], dcc)
        + _ac_bits(y_zz, acl)
        + _ac_bits(cb_zz, acc)
        + _ac_bits(cr_zz, acc)
    )
    return JpegCoefficients(cy, ccb, ccr, bits, H, W)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def decode_from_coefficients(cy: jax.Array, ccb: jax.Array, ccr: jax.Array,
                             quality: int, height: int, width: int) -> jax.Array:
    """Quantized 4:2:0 coefficient planes → NHWC [0,1] reconstruction."""
    qy, qc = (jnp.asarray(t) for t in T.quality_to_qtables(quality))
    y = dequant_idct(cy, qy)
    cb = upsample_420(dequant_idct(ccb, qc))
    cr = upsample_420(dequant_idct(ccr, qc))
    rgb = ycbcr_to_rgb(y, cb, cr)
    return rgb[:, :height, :width, :]


@functools.partial(jax.jit, static_argnums=(5, 6))
def decode_with_qtables(cy, ccb, ccr, qy, qc, height: int, width: int) -> jax.Array:
    """Decode with explicit quant tables (for foreign/libjpeg streams).

    jit'd: unjitted this is ~100 op-by-op dispatches, which costs ~150 ms
    of host time over the TPU tunnel (measured) — it sat on the decode
    critical path of every HyRES decompress."""
    y = dequant_idct(cy, jnp.asarray(qy))
    cb = upsample_420(dequant_idct(ccb, jnp.asarray(qc)))
    cr = upsample_420(dequant_idct(ccr, jnp.asarray(qc)))
    rgb = ycbcr_to_rgb(y, cb, cr)
    return rgb[:, :height, :width, :]


@functools.partial(jax.jit, static_argnums=(1,))
def jpeg_roundtrip(x: jax.Array, quality: int) -> Tuple[jax.Array, jax.Array]:
    """One fused on-device JPEG encode+decode.

    Returns (decoded NHWC [0,1], bpp (B,)) where bpp counts the exact scan
    bits plus the fixed JFIF header — the same accounting the reference
    reads off real buffers (/root/reference/models/utils/
    turbo_jpeg_compression.py:70-76) without ever leaving the device.
    """
    H, W = x.shape[1], x.shape[2]
    c = encode_to_coefficients(x, quality)
    dec = decode_from_coefficients(c.y, c.cb, c.cr, quality, H, W)
    # scan is padded to a byte boundary; headers are fixed-size
    total_bits = 8.0 * jnp.ceil(c.scan_bits / 8.0) + 8.0 * T.HEADER_BYTES
    bpp = total_bits / (H * W)
    return dec, bpp
