"""Codec CLI — encode images to .hyc bitstream files and decode them back.

The reference has no way to SAVE a compressed image: its inference script
does an in-memory roundtrip for metrics only (/root/reference/src/
inference.py:54-151). This CLI completes the deployment story with a real
on-disk format (coding/container.py): ``encode`` writes one
self-describing .hyc per input image; ``decode`` needs only the .hyc and
the weights checkpoint — the container carries the model identity
(family, N/M, jpeg quality, coder).

    python -m hyres_tpu.cli.codec encode --checkpoint ckpt.msgpack \
        --model hyres --coder tpu input.png -o out_dir/
    python -m hyres_tpu.cli.codec decode --checkpoint ckpt.msgpack \
        out_dir/input.hyc -o out_dir/

bpp printed by ``encode`` counts the REAL file bytes (container framing
included), so it is the honest end-to-end rate of the deployable format.
"""

from __future__ import annotations

import argparse
import types
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="HyRES-TPU file codec")
    sub = p.add_subparsers(dest="cmd", required=True)

    enc = sub.add_parser("encode", help="image(s) -> .hyc bitstream file(s)")
    enc.add_argument("inputs", nargs="+", help="image files or a directory")
    enc.add_argument("--checkpoint", type=str, required=True)
    enc.add_argument("-o", "--output", type=str, default=".",
                     help="output directory for .hyc files")
    enc.add_argument("--model", type=str, default="hyres",
                     choices=["hyres", "checkerboard", "elic", "cheng2020"])
    enc.add_argument("--N", type=int, default=128)
    enc.add_argument("--M", type=int, default=192)
    enc.add_argument("--jpeg-quality", type=int, default=1)
    enc.add_argument("--coder", type=str, default="host",
                     choices=["host", "tpu"])
    enc.add_argument("--no-refit-quantiles", dest="refit_quantiles",
                     action="store_false", default=True)

    dec = sub.add_parser("decode", help=".hyc file(s) -> reconstructed PNGs")
    dec.add_argument("inputs", nargs="+", help=".hyc files or a directory")
    dec.add_argument("--checkpoint", type=str, required=True,
                     help="weights for the model named in the container")
    dec.add_argument("-o", "--output", type=str, default=".",
                     help="output directory for reconstructed PNGs")
    dec.add_argument("--no-refit-quantiles", dest="refit_quantiles",
                     action="store_false", default=True)
    return p.parse_args(argv)


def _load_params(args):
    from ..train import load_checkpoint
    from ..train.checkpoint import extract_variables

    raw = load_checkpoint(args.checkpoint)
    params = extract_variables(raw)
    baked = isinstance(raw, dict) and "tables" in raw
    if args.refit_quantiles and not baked:
        from ..entropy import refit_model_quantiles
        params = refit_model_quantiles(params)
    return raw, params, baked


def _build(args_like, raw, params, baked):
    from .inference import build_codec

    model, codec = build_codec(args_like, params)
    if baked:
        codec.install_tables(raw["tables"])
    else:
        codec.update(force=True)
    return model, codec


def _expand(inputs, exts):
    files = []
    for item in inputs:
        p = Path(item)
        if p.is_dir():
            files += sorted(q for q in p.iterdir()
                            if q.suffix.lower() in exts)
        else:
            files.append(p)
    return files


def _encode(args):
    import jax.numpy as jnp

    from ..coding.container import pack_compressed
    from ..train import load_image

    raw, params, baked = _load_params(args)
    model, codec = _build(args, raw, params, baked)

    outdir = Path(args.output)
    outdir.mkdir(parents=True, exist_ok=True)
    files = _expand(args.inputs, {".png", ".jpg", ".jpeg", ".bmp"})
    if not files:
        raise SystemExit("no input images")

    for f in files:
        x = jnp.asarray(load_image(str(f)))
        comp = codec.compress(x)
        blob = pack_compressed(comp, model=args.model, N=args.N, M=args.M,
                               jpeg_quality=(args.jpeg_quality
                                             if args.model == "hyres" else None),
                               coder=args.coder)
        out = outdir / (f.stem + ".hyc")
        out.write_bytes(blob)
        bpp = len(blob) * 8 / (x.shape[1] * x.shape[2])
        print(f"{f.name} -> {out} ({len(blob)} B, {bpp:.4f} bpp "
              f"incl. container framing)", flush=True)


def _decode(args):
    from ..coding.container import unpack_compressed
    from ..train import save_image

    raw, params, baked = _load_params(args)

    outdir = Path(args.output)
    outdir.mkdir(parents=True, exist_ok=True)
    files = _expand(args.inputs, {".hyc"})
    if not files:
        raise SystemExit("no input .hyc files")

    codecs = {}  # one codec per (model, N, M, q, coder) in the batch
    for f in files:
        doc = unpack_compressed(f.read_bytes())
        key = (doc["model"], doc["N"], doc["M"], doc["jpeg_quality"],
               doc["coder"])
        if key not in codecs:
            args_like = types.SimpleNamespace(
                model=doc["model"], N=doc["N"], M=doc["M"],
                jpeg_quality=doc["jpeg_quality"] or 1, coder=doc["coder"])
            codecs[key] = _build(args_like, raw, params, baked)[1]
        codec = codecs[key]
        payload = doc["payload"]
        dec = (codec.decompress(payload) if "jpeg_buffers" in payload
               else codec.decompress(payload["strings"], payload["shape"],
                                     payload.get("size")))
        x_hat = np.clip(np.asarray(dec["x_hat"]), 0, 1)
        out = outdir / (f.stem + ".png")
        save_image(x_hat, out)
        print(f"{f.name} ({doc['model']} N={doc['N']} M={doc['M']} "
              f"coder={doc['coder']}) -> {out}", flush=True)


def main(argv=None):
    args = parse_args(argv)
    if args.cmd == "encode":
        _encode(args)
    else:
        _decode(args)


if __name__ == "__main__":
    main()
