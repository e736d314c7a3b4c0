"""CDF-export CLI ("updata") — bake entropy-coder tables for deployment.

Mirrors the reference (/root/reference/src/updata.py:12-82): load a
training checkpoint, build the CDF tables (``update(force=True)``), and
re-save a weights-only artifact that inference consumes. Unlike the
reference (which rebuilds the model with default hyperparameters, SURVEY
Q11), --N/--M/--jpeg-quality are honored.

In the TPU build the tables are stored WITH the artifact (the reference
keeps them as registered torch buffers inside the state dict), so
inference can skip the bake.
"""

from __future__ import annotations

import argparse
from pathlib import Path



def parse_args(argv=None):
    p = argparse.ArgumentParser(description="bake CDF tables into a deployable artifact")
    p.add_argument("--filepath", type=str, required=True, help="training checkpoint")
    p.add_argument("--name", type=str, default="model")
    p.add_argument("--dir", type=str, default=".")
    p.add_argument("--N", type=int, default=128)
    p.add_argument("--M", type=int, default=192)
    p.add_argument("--jpeg-quality", type=int, default=1)
    p.add_argument("--no-refit-quantiles", dest="refit_quantiles",
                   action="store_false", default=True,
                   help="skip the closed-form quantile refit before baking "
                        "(refit makes the CDF integer support exact even "
                        "when the aux optimizer hasn't converged)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ..entropy import build_bottleneck_tables, build_gaussian_tables, get_scale_table
    from ..train import load_checkpoint, save_checkpoint
    from ..train.checkpoint import extract_variables

    variables = extract_variables(load_checkpoint(args.filepath))
    if args.refit_quantiles:
        from ..entropy import refit_model_quantiles
        variables = refit_model_quantiles(variables)
    tree = variables["params"]
    eb = (tree.get("residual_model", tree).get("entropy_bottleneck")
          if isinstance(tree, dict) else None)
    if eb is None:
        raise SystemExit("checkpoint has no entropy_bottleneck parameters")

    gauss = build_gaussian_tables(get_scale_table())
    ebt = build_bottleneck_tables(eb)

    out = {
        "params": tree,
        "tables": {
            "gaussian": {"quantized_cdf": gauss.quantized_cdf,
                         "cdf_length": gauss.cdf_length, "offset": gauss.offset},
            "bottleneck": {"quantized_cdf": ebt.quantized_cdf,
                           "cdf_length": ebt.cdf_length, "offset": ebt.offset},
        },
        "config": {"N": args.N, "M": args.M, "jpeg_quality": args.jpeg_quality},
    }
    path = Path(args.dir) / f"{args.name}.msgpack"
    Path(args.dir).mkdir(parents=True, exist_ok=True)
    save_checkpoint(out, path)
    print(f"saved deployable artifact with baked CDFs to {path}")


if __name__ == "__main__":
    main()
