"""Core NN layer kit (flax.linen, NHWC).

TPU-first re-implementations of every layer the reference's models use
(/root/reference/models/layers/*.py plus the CompressAI layers imported at
/root/reference/models/checkerboard.py:6-11):

- ``conv`` / ``deconv``: 5x5 stride-2 down/upsamplers with torch-compatible
  geometry (explicit (2,2) padding; the transposed conv is expressed as an
  input-dilated conv so XLA lowers it straight onto the MXU),
- ``GDN`` / inverse GDN with CompressAI's non-negative reparameterization,
- ``ResidualBottleneckBlock`` (ELIC-style),
- ``AttentionBlock`` (Cheng2020 non-local attention,
  /root/reference/models/layers/attention.py:7-47),
- ``CheckboardMaskedConv`` (fixed checkerboard kernel mask,
  /root/reference/models/layers/checkerboard.py:26-49),
- Cheng2020 residual blocks + sub-pixel upsamplers,
- enhancement stack: ``SEBlock``, ``SpatialAttention``, ``MultiScaleRefine``
  (/root/reference/models/layers/enhancement.py).

All activations/convs stay in the parameter dtype; under a bf16 policy the
matmul-heavy convs hit the MXU in bfloat16 while GDN's rsqrt stays f32-safe
via explicit casts at the callsite.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy.bound import lower_bound

# ---------------------------------------------------------------------------
# conv helpers (torch-compatible geometry: explicit symmetric padding)
# ---------------------------------------------------------------------------


class Conv(nn.Module):
    """k×k conv, stride s, padding k//2 each side (reference conv/conv3x3/conv1x1)."""

    features: int
    kernel: int = 5
    stride: int = 2
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        # compute in the INPUT's dtype: a bf16 activation entering a conv
        # keeps the matmul on the MXU in bf16 (params are cast at use; the
        # f32 master copy is untouched). With f32 inputs this is identical
        # to the default promotion.
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=self.use_bias,
            dtype=x.dtype,
        )(x)


def conv1x1(features: int) -> Conv:
    return Conv(features, kernel=1, stride=1)


def conv3x3(features: int, stride: int = 1) -> Conv:
    return Conv(features, kernel=3, stride=stride)


class Deconv(nn.Module):
    """Transposed conv with torch ``ConvTranspose2d(k, s, padding=k//2,
    output_padding=s-1)`` geometry (reference compressai ``deconv``, import
    at /root/reference/models/checkerboard.py:10): output is exactly
    ``s * H``. Implemented as an input-dilated conv so it compiles to a
    single MXU-friendly convolution.
    """

    features: int
    kernel: int = 5
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k, s = self.kernel, self.stride
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, in_ch, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        pad_lo = k - 1 - k // 2
        pad_hi = pad_lo + (s - 1)
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(1, 1),
            padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(x.dtype)


# ---------------------------------------------------------------------------
# GDN
# ---------------------------------------------------------------------------

_REPARAM_OFFSET = 2.0 ** -18


def _nonneg_init(value: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(value + _REPARAM_OFFSET ** 2, _REPARAM_OFFSET ** 2))


def _nonneg(stored: jnp.ndarray, minimum: float = 0.0) -> jnp.ndarray:
    bound = (minimum + _REPARAM_OFFSET ** 2) ** 0.5
    return lower_bound(stored, bound) ** 2 - _REPARAM_OFFSET ** 2


class GDN(nn.Module):
    """Generalized divisive normalization (Ballé et al.):
    ``y_i = x_i / sqrt(beta_i + sum_j gamma_ij x_j^2)`` — the activation of
    every analysis/synthesis stage in the reference codecs
    (/root/reference/models/checkerboard.py:36-56). ``inverse=True``
    multiplies instead (IGDN). The channel mix is a (C,C) matmul — MXU work.
    """

    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        beta = self.param(
            "beta", lambda rng, c: _nonneg_init(jnp.ones((c,), jnp.float32)), C
        )
        gamma = self.param(
            "gamma",
            lambda rng, c: _nonneg_init(self.gamma_init * jnp.eye(c, dtype=jnp.float32)),
            C,
        )
        beta = _nonneg(beta, self.beta_min)
        gamma = _nonneg(gamma)
        # norm_d = beta_d + sum_c gamma[d, c] * x_c^2  (1x1 conv as einsum).
        # The norm is always computed in f32: squaring + rsqrt in bf16 is
        # the numerically fragile part of GDN (SURVEY §7 hard-part 5), and
        # the (C,C) mix is negligible next to the surrounding 5x5 convs.
        xf = x.astype(jnp.float32)
        norm = jnp.einsum("...c,dc->...d", xf * xf, gamma) + beta
        if self.inverse:
            return (xf * jnp.sqrt(norm)).astype(x.dtype)
        return (xf * jax.lax.rsqrt(norm)).astype(x.dtype)


# ---------------------------------------------------------------------------
# residual / attention blocks
# ---------------------------------------------------------------------------


class ResidualBottleneckBlock(nn.Module):
    """1x1(C→C/2) → ReLU → 3x3 → ReLU → 1x1(C/2→C) + identity (ELIC-style;
    reference import compressai.models.sensetime.ResidualBottleneckBlock)."""

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = conv1x1(C // 2)(x)
        h = nn.relu(h)
        h = conv3x3(C // 2)(h)
        h = nn.relu(h)
        h = conv1x1(C)(h)
        return x + h


class _ResidualUnit(nn.Module):
    """Inner unit of AttentionBlock (attention.py:11-30)."""

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = conv1x1(C // 2)(x)
        h = nn.relu(h)
        h = conv3x3(C // 2)(h)
        h = nn.relu(h)
        h = conv1x1(C)(h)
        return nn.relu(x + h)


class AttentionBlock(nn.Module):
    """Cheng2020 non-local attention: trunk a, gate b, ``x + a*sigmoid(b)``
    (reference attention.py:32-47)."""

    @nn.compact
    def __call__(self, x):
        a = x
        for _ in range(3):
            a = _ResidualUnit()(a)
        b = x
        for _ in range(3):
            b = _ResidualUnit()(b)
        b = conv1x1(x.shape[-1])(b)
        return x + a * jax.nn.sigmoid(b)


class CheckboardMaskedConv(nn.Module):
    """5x5 conv whose kernel is zeroed at non-anchor-parity taps
    (reference checkerboard.py:26-49): mask=1 at (0::2,1::2) and
    (1::2,0::2). A fixed elementwise mask on the kernel — XLA folds it into
    the conv weights at compile time, so this costs nothing at runtime.
    """

    features: int
    kernel: int = 5

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, in_ch, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        ii = jnp.arange(k)[:, None]
        jj = jnp.arange(k)[None, :]
        mask = ((ii + jj) % 2 == 1).astype(w.dtype)[:, :, None, None]
        p = k // 2
        y = jax.lax.conv_general_dilated(
            x,
            (w * mask).astype(x.dtype),
            window_strides=(1, 1),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(x.dtype)


# ---------------------------------------------------------------------------
# Cheng2020 building blocks (compressai.layers equivalents)
# ---------------------------------------------------------------------------


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC depth-to-space, torch PixelShuffle channel ordering
    (C = C_out * r * r, index = ((c_out * r + dy) * r + dx))."""
    B, H, W, C = x.shape
    c_out = C // (r * r)
    x = x.reshape(B, H, W, c_out, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(B, H * r, W * r, c_out)


class SubpelConv3x3(nn.Module):
    """3x3 conv to C*r^2 then pixel shuffle (compressai subpel_conv3x3)."""

    features: int
    r: int = 2

    @nn.compact
    def __call__(self, x):
        y = conv3x3(self.features * self.r * self.r)(x)
        return pixel_shuffle(y, self.r)


class ResidualBlock(nn.Module):
    """conv3x3 → LeakyReLU → conv3x3 → LeakyReLU + skip."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = conv3x3(self.features)(x)
        h = nn.leaky_relu(h)
        h = conv3x3(self.features)(h)
        h = nn.leaky_relu(h)
        if x.shape[-1] != self.features:
            x = conv1x1(self.features)(x)
        return x + h


class ResidualBlockWithStride(nn.Module):
    """conv3x3(s) → LeakyReLU → conv3x3 → GDN + strided 1x1 skip."""

    features: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        h = conv3x3(self.features, stride=self.stride)(x)
        h = nn.leaky_relu(h)
        h = conv3x3(self.features)(h)
        h = GDN()(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = Conv(self.features, kernel=1, stride=self.stride)(x)
        return x + h


class ResidualBlockUpsample(nn.Module):
    """subpel up → LeakyReLU → conv3x3 → IGDN + subpel skip."""

    features: int
    r: int = 2

    @nn.compact
    def __call__(self, x):
        h = SubpelConv3x3(self.features, self.r)(x)
        h = nn.leaky_relu(h)
        h = conv3x3(self.features)(h)
        h = GDN(inverse=True)(h)
        skip = SubpelConv3x3(self.features, self.r)(x)
        return skip + h


# ---------------------------------------------------------------------------
# enhancement stack (reference enhancement.py)
# ---------------------------------------------------------------------------


class SEBlock(nn.Module):
    """Squeeze-and-excitation channel gate (enhancement.py:25-40)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(C // self.reduction, use_bias=False, dtype=x.dtype)(y)
        y = nn.relu(y)
        y = nn.Dense(C, use_bias=False, dtype=x.dtype)(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class SpatialAttention(nn.Module):
    """CBAM spatial attention: 7x7 conv over [avg,max] channel pools
    (enhancement.py:7-21)."""

    kernel: int = 7

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        a = jnp.concatenate([avg, mx], axis=-1)
        p = (self.kernel - 1) // 2
        a = nn.Conv(1, (self.kernel, self.kernel), padding=((p, p), (p, p)),
                    use_bias=False, dtype=x.dtype)(a)
        return jax.nn.sigmoid(a)


class PReLU(nn.Module):
    """Single-parameter PReLU, torch default init 0.25."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", lambda rng: jnp.float32(self.init))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class _DilatedBlock(nn.Module):
    """conv3x3(d=1) → PReLU → conv3x3(d=2) → PReLU (enhancement.py:65-71)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=x.dtype)(x)
        x = PReLU()(x)
        x = nn.Conv(self.features, (3, 3), padding=((2, 2), (2, 2)),
                    kernel_dilation=(2, 2), dtype=x.dtype)(x)
        return PReLU()(x)


def _resize_bilinear(x: jax.Array, h: int, w: int) -> jax.Array:
    # antialias=False matches torch F.interpolate(align_corners=False)
    # semantics for both down- and upsampling (reference enhancement.py:96-103)
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]),
                            method="bilinear", antialias=False)


class MultiScaleRefine(nn.Module):
    """Post-processing artifact remover (reference enhancement.py:55-113):
    SE-gated features, three dilated-conv branches at 1/1, 1/2, 1/4 scale,
    CBAM spatial attention, 1x1+3x3 fusion to an RGB residual. Caller adds
    the output residually and clamps (reference hyres.py:65-67).
    """

    mid_channels: int = 64
    out_channels: int = 3

    @nn.compact
    def __call__(self, x):
        feat = nn.Conv(self.mid_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=x.dtype)(x)
        feat = PReLU()(feat)
        feat = SEBlock(reduction=16)(feat)

        H, W = feat.shape[1], feat.shape[2]
        f1 = _DilatedBlock(self.mid_channels)(feat)
        f2 = _resize_bilinear(feat, H // 2, W // 2)
        f2 = _DilatedBlock(self.mid_channels)(f2)
        f2 = _resize_bilinear(f2, H, W)
        f3 = _resize_bilinear(feat, H // 4, W // 4)
        f3 = _DilatedBlock(self.mid_channels)(f3)
        f3 = _resize_bilinear(f3, H, W)

        multi = jnp.concatenate([f1, f2, f3], axis=-1)
        multi = multi * SpatialAttention()(multi)

        out = nn.Conv(self.mid_channels, (1, 1), dtype=x.dtype)(multi)
        out = PReLU()(out)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=x.dtype)(out)
