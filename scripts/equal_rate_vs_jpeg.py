"""Equal-rate PSNR gap of ONE trained model vs classical libjpeg.

The single-lambda analog of scripts/jpeg_anchor.py's BD-rate (which
needs >= 3 RD points): sweep libjpeg quality on the same held-out
images, linearly interpolate the JPEG PSNR at OUR average bpp, and
report the gap. Answers VERDICT r4 #3's question — do the found-data
images move the learned codec against the classical anchor — with the
one operating point a single-lambda run produces.

Usage:
    python scripts/equal_rate_vs_jpeg.py \
        --metrics matched_r5/eval/hyres_found_tpu/metrics.csv \
        --images data/ds/test

Pure host work (PIL + numpy).
"""

from __future__ import annotations

import argparse
import csv
import io
from pathlib import Path

import numpy as np
from PIL import Image

QUALITIES = [2, 3, 5, 8, 12, 18, 25, 35, 50, 65, 80]


def jpeg_point(img_paths, q: int) -> tuple[float, float]:
    bpps, psnrs = [], []
    for p in img_paths:
        im = Image.open(p).convert("RGB")
        buf = io.BytesIO()
        im.save(buf, format="JPEG", quality=q)
        dec = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"),
                         np.float64) / 255.0
        ref = np.asarray(im, np.float64) / 255.0
        mse = float(np.mean((dec - ref) ** 2))
        bpps.append(len(buf.getvalue()) * 8 / (im.size[0] * im.size[1]))
        psnrs.append(-10 * np.log10(mse))
    return float(np.mean(bpps)), float(np.mean(psnrs))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics", required=True,
                    help="metrics.csv of the model eval (average row used)")
    ap.add_argument("--images", required=True,
                    help="the held-out image dir the eval ran on")
    args = ap.parse_args()

    with open(args.metrics) as f:
        rows = list(csv.DictReader(f))
    avg = next(r for r in rows if r["filename"] == "average")
    our_bpp, our_psnr = float(avg["total_bpp"]), float(avg["psnr"])

    imgs = sorted(Path(args.images).glob("*.png"))
    curve = [jpeg_point(imgs, q) for q in QUALITIES]
    print(f"model: {our_bpp:.4f} bpp  {our_psnr:.2f} dB  "
          f"({args.metrics}, {len(imgs)} held-out images)")
    print("libjpeg sweep on the same images:")
    for q, (b, p) in zip(QUALITIES, curve):
        print(f"  q={q:3d}  {b:.4f} bpp  {p:.2f} dB")

    bs = np.array([b for b, _ in curve])
    ps = np.array([p for _, p in curve])
    if our_bpp < bs[0] or our_bpp > bs[-1]:
        print(f"model bpp {our_bpp:.4f} outside the JPEG sweep "
              f"[{bs[0]:.4f}, {bs[-1]:.4f}] — extend QUALITIES")
        return
    jpeg_psnr = float(np.interp(our_bpp, bs, ps))
    print(f"JPEG PSNR at our rate ({our_bpp:.4f} bpp): {jpeg_psnr:.2f} dB")
    print(f"equal-rate PSNR gap (model - JPEG): "
          f"{our_psnr - jpeg_psnr:+.2f} dB")


if __name__ == "__main__":
    main()
