"""Classical-JPEG RD anchor + BD-rate of the HyRES curve against it.

The reference frames HyRES as "JPEG base + learned residual" but never
quantifies what the residual layer buys over the base codec alone
(/root/reference/README.md:110-126 compares only against learned
baselines). This script measures libjpeg (PIL) on the held-out split
(kodim19-24) across a quality sweep spanning the HyRES lambda-chain's
PSNR range, then reports BD-rate / BD-PSNR of HyRES vs that anchor
using scripts/bd_rate.py — i.e. the average rate saved by the learned
residual stack at equal quality.

Usage:
    python scripts/jpeg_anchor.py [--rd-glob 'rd_eval/phase*/metrics.csv']

Pure host work (PIL + numpy): runs with the TPU tunnel down.
"""

from __future__ import annotations

import argparse
import csv
import glob
import io
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).parent))
from bd_rate import bd_psnr, bd_rate  # noqa: E402

HELD_OUT = [f"kodim{i}.png" for i in range(19, 25)]
QUALITIES = [5, 8, 12, 18, 25, 35, 50, 65]


def jpeg_curve(test_dir: Path) -> list[tuple[float, float]]:
    points = []
    for q in QUALITIES:
        bpps, psnrs = [], []
        for name in HELD_OUT:
            img = Image.open(test_dir / name).convert("RGB")
            buf = io.BytesIO()
            img.save(buf, format="JPEG", quality=q)
            n_bytes = buf.tell()
            buf.seek(0)
            dec = np.asarray(Image.open(buf), dtype=np.float64)
            orig = np.asarray(img, dtype=np.float64)
            mse = ((orig - dec) ** 2).mean()
            bpps.append(8 * n_bytes / (img.height * img.width))
            psnrs.append(10 * np.log10(255.0**2 / mse))
        points.append((float(np.mean(bpps)), float(np.mean(psnrs))))
    return points


def hyres_curve(pattern: str) -> list[tuple[float, float]]:
    points = []
    for path in sorted(glob.glob(pattern)):
        with open(path) as f:
            rows = list(csv.DictReader(f))
        avg = next(r for r in rows if r["filename"] == "average")
        points.append((float(avg["total_bpp"]), float(avg["psnr"])))
    return points


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--test-dir", default="/root/reference/data/test")
    ap.add_argument("--rd-glob", default="rd_eval/phase*/metrics.csv")
    args = ap.parse_args()

    anchor = jpeg_curve(Path(args.test_dir))
    test = hyres_curve(args.rd_glob)
    if len(test) < 3:
        raise SystemExit(f"need >=3 HyRES points, got {len(test)} "
                         f"from {args.rd_glob}")

    print("JPEG (libjpeg/PIL) anchor, held-out kodim19-24 averages:")
    for q, (bpp, psnr) in zip(QUALITIES, anchor):
        print(f"  q={q:3d}  {bpp:.4f} bpp  {psnr:.2f} dB")
    print("HyRES lambda-chain (from", args.rd_glob + "):")
    for bpp, psnr in test:
        print(f"         {bpp:.4f} bpp  {psnr:.2f} dB")

    a, t = np.array(anchor), np.array(test)
    print(f"BD-rate (HyRES vs JPEG): {bd_rate(a, t):+.1f} % "
          "(negative = HyRES needs less rate at equal PSNR)")
    print(f"BD-PSNR (HyRES vs JPEG): {bd_psnr(a, t):+.2f} dB")


if __name__ == "__main__":
    main()
