"""TPU-native JPEG engine: on-device transforms + host bitstream.

High-level interface mirroring the reference's ``TurboJPEGCompression``
capability (/root/reference/models/utils/turbo_jpeg_compression.py:8-77):
``JpegCodec(quality)(x)`` → (decoded, bpp) for training (one jit'd graph,
no host roundtrip), ``compress``/``decompress`` for real byte buffers.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import core, tables
from .bitstream import ParsedJpeg, assemble_jfif
from .core import (
    JpegCoefficients,
    decode_from_coefficients,
    decode_with_qtables,
    encode_to_coefficients,
    jpeg_roundtrip,
)


class JpegCodec:
    """Batched JPEG base layer.

    forward: ``(x NHWC [0,1]) -> (decoded, bpp_mean)`` fully on device —
    replaces the reference's per-image CPU loop returning
    ``(decoded_batch, jpeg_bpp)`` (turbo_jpeg_compression.py:62-77).
    """

    def __init__(self, quality: int = 1):
        self.quality = int(quality)

    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        decoded, bpp = jpeg_roundtrip(x, self.quality)
        return decoded, jnp.mean(bpp)

    def compress(self, x: jax.Array) -> List[bytes]:
        """NHWC [0,1] → list of real JFIF byte buffers (one per image)."""
        c = encode_to_coefficients(x, self.quality)
        y, cb, cr = (np.asarray(a) for a in (c.y, c.cb, c.cr))
        return [
            assemble_jfif(y[i], cb[i], cr[i], c.width, c.height, self.quality)
            for i in range(y.shape[0])
        ]

    def decompress(self, buffers: List[bytes]) -> jax.Array:
        """JFIF byte buffers → NHWC [0,1] batch (all same size)."""
        outs = []
        for buf in buffers:
            p = ParsedJpeg(buf)
            if p.ncomp != 3 or p.sampling[0] != (2, 2):
                raise ValueError("only 3-component 4:2:0 streams supported")
            dec = decode_with_qtables(
                jnp.asarray(p.coeffs[0])[None], jnp.asarray(p.coeffs[1])[None],
                jnp.asarray(p.coeffs[2])[None], p.qtables[0], p.qtables[1],
                p.height, p.width)
            outs.append(dec[0])
        return jnp.stack(outs)


__all__ = [
    "JpegCodec",
    "JpegCoefficients",
    "ParsedJpeg",
    "assemble_jfif",
    "core",
    "decode_from_coefficients",
    "decode_with_qtables",
    "encode_to_coefficients",
    "jpeg_roundtrip",
    "tables",
]
