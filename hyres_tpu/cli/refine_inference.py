"""Refine-inference CLI — single image through codec (+optional refine).

Mirrors the reference (/root/reference/src/refine_inference.py:10-91):
load codec checkpoint, optionally overlay a refine-only checkpoint,
``--skip-postprocessing`` bypasses the refinement stage.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="HyRES-TPU refine inference")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--post-checkpoint", type=str, default=None,
                   help="refine-only checkpoint overlay")
    p.add_argument("--input", type=str, required=True)
    p.add_argument("--output", type=str, default="./refined.png")
    p.add_argument("--N", type=int, default=128)
    p.add_argument("--M", type=int, default=192)
    p.add_argument("--jpeg-quality", type=int, default=1)
    p.add_argument("--skip-postprocessing", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ..models.hyres import ResidualJPEGCompression
    from ..train import load_checkpoint, load_image, restore_into, save_image
    from ..train.checkpoint import extract_variables

    model = ResidualJPEGCompression(N=args.N, M=args.M,
                                    jpeg_quality=args.jpeg_quality)
    x = jnp.asarray(load_image(args.input))
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                        noisequant=False)
    params = restore_into(params, extract_variables(load_checkpoint(args.checkpoint)))
    if args.post_checkpoint:
        refine_tree = extract_variables(load_checkpoint(args.post_checkpoint))["params"]
        merged = dict(params["params"])
        merged["refine"] = refine_tree.get("refine", refine_tree)
        params = {"params": merged}

    out = jax.jit(lambda p, x: model.apply(p, x, noisequant=False))(params, x)
    if args.skip_postprocessing:
        # pre-refine reconstruction (reference monkey-patches forward,
        # refine_inference.py:61-71)
        x_hat = jnp.clip(out["jpeg_decoded"] + out["residual_hat"], 0, 1)
    else:
        x_hat = out["x_hat"]

    save_image(np.asarray(x_hat), args.output)
    mse = float(jnp.mean((x - x_hat) ** 2))
    print(f"saved {args.output} psnr={-10*np.log10(mse):.2f} "
          f"jpeg_bpp={float(out['jpeg_bpp_loss']):.4f}")


if __name__ == "__main__":
    main()
