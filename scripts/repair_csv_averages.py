"""Repair compile-contaminated average rows in committed metrics.csv.

VERDICT r4 weak-4: two committed eval CSVs carry enc/dec_time averages
poisoned by a compile leak into one timed call (kodim19 enc 33.94 s vs
0.30-0.34 s for the other rows). The r4 checkpoints are gone (gitignored
working dirs), so the evals cannot be re-run; this script instead writes
`metrics_repaired.csv` next to each CSV with the same outlier-robust
average the inference CLI now emits (timing averages exclude rows > 2x
the column median; each exclusion is recorded in the repair header) plus
a median row. Rate/PSNR columns were never affected and are re-averaged
over ALL rows.

Usage: python scripts/repair_csv_averages.py matched_r4/eval/*/metrics.csv
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path

import numpy as np

TIME_KEYS = ("enc_time", "dec_time")


def repair(path: Path) -> None:
    with open(path) as f:
        rows = [r for r in csv.DictReader(f)
                if r["filename"] not in ("average", "median")]
    keys = list(rows[0].keys())
    num = [k for k in keys if k != "filename"]
    med = {k: float(np.median([float(r[k]) for r in rows])) for k in num}
    avg = {}
    notes = []
    for k in num:
        vals = np.array([float(r[k]) for r in rows])
        if k in TIME_KEYS and med[k] > 0:
            keep = vals <= 2 * med[k]
            dropped = [rows[i]["filename"] for i in np.nonzero(~keep)[0]]
            if dropped:
                notes.append(f"{k} average excludes {dropped} "
                             f"(> 2x median {med[k]:.3f}s — compile leak)")
            avg[k] = float(vals[keep].mean()) if keep.any() else float("nan")
        else:
            avg[k] = float(vals.mean())
    out = path.with_name("metrics_repaired.csv")
    with open(out, "w", newline="") as f:
        for n in notes:
            f.write(f"# REPAIR: {n}\n")
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
        w.writerow({"filename": "average",
                    **{k: f"{avg[k]:.6f}" for k in num}})
        w.writerow({"filename": "median",
                    **{k: f"{med[k]:.6f}" for k in num}})
    print(f"{path} -> {out}")
    for n in notes:
        print(f"  {n}")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        repair(Path(p))
