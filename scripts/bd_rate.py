"""Bjøntegaard-delta comparison of two RD curves (BD-rate / BD-PSNR).

Standard codec-evaluation metric (ITU-T VCEG-M33): fit each curve with a
cubic polynomial — log-rate as a function of PSNR (BD-rate) or PSNR as a
function of log-rate (BD-PSNR) — integrate both fits over the OVERLAPPING
range, and report the average gap. BD-rate is the average rate change of
the test curve at equal quality (negative = test codec saves rate);
BD-PSNR is the average quality change at equal rate.

The reference publishes its RD comparison only as a figure
(/root/reference/assets/psnr.png, README.md:124-126); this tool makes the
same comparison quantitative for any two curves produced by
`hyres_tpu.cli.inference` (the per-λ metrics.csv "average" rows) or given
as explicit points.

Usage:
    python scripts/bd_rate.py --anchor rd_eval/phase_*/metrics.csv \
                              --test  other_run/phase_*/metrics.csv
    python scripts/bd_rate.py --anchor-points 0.5:30,1.0:33,1.5:35,2.0:36.5 \
                              --test-points   0.45:30,0.9:33,1.4:35,1.9:36.5
"""

from __future__ import annotations

import argparse
import csv
import glob
import sys
from pathlib import Path

import numpy as np


def bd_rate(anchor: np.ndarray, test: np.ndarray) -> float:
    """BD-rate in percent. anchor/test: (n, 2) arrays of (rate, psnr),
    n >= 3 (cubic fit degree adapts for n == 3). Negative = test needs
    less rate than anchor at the same quality."""
    return _bd(anchor, test, rate_axis=True)


def bd_psnr(anchor: np.ndarray, test: np.ndarray) -> float:
    """BD-PSNR in dB. Positive = test is better at the same rate."""
    return _bd(anchor, test, rate_axis=False)


def _bd(anchor, test, rate_axis: bool) -> float:
    a, t = np.asarray(anchor, float), np.asarray(test, float)
    if a.shape[0] < 3 or t.shape[0] < 3:
        raise ValueError("need >= 3 points per curve for a stable fit")
    deg = min(3, a.shape[0] - 1, t.shape[0] - 1)

    def fit(c):
        lr, q = np.log10(c[:, 0]), c[:, 1]
        x, y = (q, lr) if rate_axis else (lr, q)
        order = np.argsort(x)
        return np.polynomial.Polynomial.fit(x[order], y[order], deg), \
            x.min(), x.max()

    pa, lo_a, hi_a = fit(a)
    pt, lo_t, hi_t = fit(t)
    lo, hi = max(lo_a, lo_t), min(hi_a, hi_t)
    if hi <= lo:
        raise ValueError(
            f"curves do not overlap on the {'PSNR' if rate_axis else 'rate'} "
            f"axis: [{lo_a:.3f},{hi_a:.3f}] vs [{lo_t:.3f},{hi_t:.3f}]")
    ia = pa.integ()(hi) - pa.integ()(lo)
    it = pt.integ()(hi) - pt.integ()(lo)
    avg = (it - ia) / (hi - lo)
    return float((10 ** avg - 1) * 100) if rate_axis else float(avg)


def _points_from_csv(paths) -> np.ndarray:
    pts = []
    for pattern in paths:
        for p in sorted(glob.glob(pattern)):
            with open(p, newline="") as f:
                rows = list(csv.DictReader(f))
            avg = next((r for r in rows if r.get("filename") == "average"),
                       None)
            if avg is None:
                print(f"warning: no 'average' row in {p}, skipping",
                      file=sys.stderr)
                continue
            pts.append((float(avg["total_bpp"]), float(avg["psnr"])))
    return np.asarray(pts)


def _points_from_arg(spec: str) -> np.ndarray:
    return np.asarray([[float(v) for v in pt.split(":")]
                       for pt in spec.split(",")])


def main(argv=None):
    p = argparse.ArgumentParser(description="BD-rate / BD-PSNR")
    p.add_argument("--anchor", nargs="*", default=[],
                   help="metrics.csv paths/globs for the anchor curve")
    p.add_argument("--test", nargs="*", default=[],
                   help="metrics.csv paths/globs for the test curve")
    p.add_argument("--anchor-points", type=str, default=None,
                   help="explicit bpp:psnr,bpp:psnr,... for the anchor")
    p.add_argument("--test-points", type=str, default=None,
                   help="explicit bpp:psnr,... for the test curve")
    args = p.parse_args(argv)

    anchor = (_points_from_arg(args.anchor_points) if args.anchor_points
              else _points_from_csv(args.anchor))
    test = (_points_from_arg(args.test_points) if args.test_points
            else _points_from_csv(args.test))
    if anchor.size == 0 or test.size == 0:
        raise SystemExit("no curve points found")

    for name, pts in (("anchor", anchor), ("test", test)):
        desc = "  ".join(f"{r:.4f}bpp/{q:.2f}dB" for r, q in pts)
        print(f"{name}: {desc}")
    print(f"BD-rate: {bd_rate(anchor, test):+.2f} %  "
          "(negative = test saves rate at equal PSNR)")
    print(f"BD-PSNR: {bd_psnr(anchor, test):+.3f} dB  "
          "(positive = test is better at equal rate)")


if __name__ == "__main__":
    main()
