"""PIL/libjpeg-backed JPEG adapter (capability parity).

The reference ships two JPEG backends: libturbojpeg (used by HyRES) and
a slower PIL path (/root/reference/models/utils/jpeg_compression.py:8-66).
This is the PIL-equivalent for the TPU build: real libjpeg bytes on the
host, decode through PIL. Useful as a golden reference and as an
alternative base layer whose bytes are produced by libjpeg itself.

Interface matches JpegCodec (forward -> (decoded, bpp), compress ->
buffers, decompress -> batch).
"""

from __future__ import annotations

import io
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image


class PilJpegCodec:
    def __init__(self, quality: int = 1):
        self.quality = int(quality)

    def compress(self, x) -> List[bytes]:
        arr = np.clip(np.asarray(x) * 255.0 + 0.5, 0, 255).astype(np.uint8)
        out = []
        for img in arr:
            bio = io.BytesIO()
            Image.fromarray(img).save(bio, "JPEG", quality=self.quality)
            out.append(bio.getvalue())
        return out

    def decompress(self, buffers: List[bytes]) -> jax.Array:
        imgs = [np.asarray(Image.open(io.BytesIO(b)).convert("RGB"), np.float32)
                / 255.0 for b in buffers]
        return jnp.asarray(np.stack(imgs))

    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        buffers = self.compress(x)
        decoded = self.decompress(buffers)
        num_px = x.shape[0] * x.shape[1] * x.shape[2]
        bpp = sum(len(b) for b in buffers) * 8.0 / num_px
        return decoded, jnp.float32(bpp)
