"""Benchmark: HyRES encode+decode wall time per 768x512 Kodak image on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = mean encode+decode seconds per image (real entropy-coded
roundtrip, block_until_ready). vs_baseline = reference_total / ours,
i.e. the speedup over the reference's published HyRES total of 0.762 s
(0.476 enc + 0.286 dec, /root/reference/README.md:120); >1 is faster.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_TOTAL_S = 0.762  # README.md:120 (encode 0.476 + decode 0.286)
KODAK = sorted(Path("/root/reference/data/test").glob("kodim*.png"))


def main():
    from PIL import Image

    from hyres_tpu.models.hyres import HyresCodec, ResidualJPEGCompression

    model = ResidualJPEGCompression(N=128, M=192, jpeg_quality=1)
    params = model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
                        noisequant=True, rng=jax.random.key(1))
    codec = HyresCodec(model, params)
    codec.update(force=True)

    paths = KODAK[:6] if KODAK else []
    if not paths:
        raise SystemExit("kodak images not found")
    imgs = [jnp.asarray(np.asarray(Image.open(p).convert("RGB"),
                                   np.float32)[None] / 255.0) for p in paths]

    # warm-up: compile every stage
    r = codec.inference(imgs[0])
    jax.block_until_ready(r["x_hat"])

    times = []
    for x in imgs:
        t0 = time.time()
        r = codec.inference(x)
        jax.block_until_ready(r["x_hat"])
        times.append(time.time() - t0)

    value = float(np.mean(times))
    print(json.dumps({
        "metric": "hyres_encode_decode_total_per_kodak_image",
        "value": round(value, 4),
        "unit": "s (ref total 0.762s; vs_baseline = ref/ours, >1 faster)",
        "vs_baseline": round(REFERENCE_TOTAL_S / value, 3),
    }))


if __name__ == "__main__":
    main()
