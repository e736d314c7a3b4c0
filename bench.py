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


def _load_params(model):
    """Prefer a trained checkpoint (checkpoints/checkpoint_best_* or
    artifacts/hyres_*.msgpack); random init otherwise (timing-only mode —
    random-init latents are high-entropy, so coder time is pessimistic)."""
    import sys

    import jax
    import jax.numpy as jnp

    candidates = sorted(Path("artifacts").glob("hyres*.msgpack")) + \
        sorted(Path("checkpoints").glob("checkpoint_best_*.msgpack"))
    if candidates:
        from hyres_tpu.train import load_checkpoint, restore_into
        from hyres_tpu.train.checkpoint import extract_variables

        template = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                              noisequant=True, rng=jax.random.key(1))
        params = restore_into(
            template, extract_variables(load_checkpoint(str(candidates[0]))))
        print(f"bench: loaded trained params from {candidates[0]}",
              file=sys.stderr)
        return params
    print("bench: no trained checkpoint found, using random init",
          file=sys.stderr)
    return model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
                      noisequant=True, rng=jax.random.key(1))


def main():
    from PIL import Image

    from hyres_tpu.models.hyres import HyresCodec, ResidualJPEGCompression

    model = ResidualJPEGCompression(N=128, M=192, jpeg_quality=1)
    params = _load_params(model)
    codec = HyresCodec(model, params)
    codec.update(force=True)

    paths = KODAK[:6] if KODAK else []
    if not paths:
        raise SystemExit("kodak images not found")
    imgs = [jnp.asarray(np.asarray(Image.open(p).convert("RGB"),
                                   np.float32)[None] / 255.0) for p in paths]

    # warm-up: compile every stage for each distinct image shape
    # (Kodak mixes 768x512 and 512x768)
    for shape in {im.shape for im in imgs}:
        warm = next(im for im in imgs if im.shape == shape)
        jax.block_until_ready(codec.inference(warm)["x_hat"])

    import sys

    times = []
    bpps = []
    psnrs = []
    for x in imgs:
        t0 = time.time()
        r = codec.inference(x)
        jax.block_until_ready(r["x_hat"])
        times.append(time.time() - t0)
        comp = r["compressed"]
        nbytes = sum(len(s) for part in comp["strings"][0] for s in part)
        nbytes += sum(len(s) for s in comp["strings"][1])
        nbytes += sum(len(b) for b in comp["jpeg_buffers"])
        num_px = x.shape[1] * x.shape[2]
        bpps.append(nbytes * 8 / num_px)
        mse = float(jnp.mean((r["x_hat"] - x) ** 2))
        psnrs.append(-10 * np.log10(mse))
    print(f"bench side-info: bpp={np.mean(bpps):.4f} psnr={np.mean(psnrs):.2f} "
          f"per-image times={['%.3f' % t for t in times]}", file=sys.stderr)

    value = float(np.mean(times))
    print(json.dumps({
        "metric": "hyres_encode_decode_total_per_kodak_image",
        "value": round(value, 4),
        "unit": "s (ref total 0.762s; vs_baseline = ref/ours, >1 faster)",
        "vs_baseline": round(REFERENCE_TOTAL_S / value, 3),
    }))


if __name__ == "__main__":
    main()
