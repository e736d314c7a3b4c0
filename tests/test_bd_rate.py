"""BD-rate tool: known-shift synthetic curves give the known answer."""

import csv
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
from bd_rate import bd_psnr, bd_rate, main  # noqa: E402


def _curve(rates, a=25.0, b=5.0):
    # concave PSNR(log-rate) model, typical codec shape
    return np.stack([rates, a + b * np.log10(rates) * 2], axis=1)


def test_identical_curves_zero():
    c = _curve(np.array([0.25, 0.5, 1.0, 2.0]))
    assert abs(bd_rate(c, c)) < 1e-9
    assert abs(bd_psnr(c, c)) < 1e-9


def test_uniform_rate_shift_recovered():
    """Scaling every rate by 1.10 at identical PSNRs = +10 % BD-rate."""
    c = _curve(np.array([0.25, 0.5, 1.0, 2.0]))
    shifted = c.copy()
    shifted[:, 0] *= 1.10
    assert bd_rate(c, shifted) == pytest.approx(10.0, abs=1e-6)
    assert bd_rate(shifted, c) == pytest.approx(1 / 1.10 * 100 - 100, abs=1e-6)


def test_uniform_psnr_shift_recovered():
    c = _curve(np.array([0.25, 0.5, 1.0, 2.0]))
    up = c.copy()
    up[:, 1] += 0.75
    assert bd_psnr(c, up) == pytest.approx(0.75, abs=1e-9)
    # better quality at equal rate ⇒ rate savings at equal quality
    assert bd_rate(c, up) < 0


def test_non_overlapping_raises():
    lo = _curve(np.array([0.1, 0.15, 0.2]))
    hi = _curve(np.array([2.0, 3.0, 4.0]))
    with pytest.raises(ValueError, match="overlap"):
        bd_rate(lo, hi)


def test_cli_csv_mode(tmp_path, capsys):
    for i, (bpp, psnr) in enumerate([(0.5, 30.0), (1.0, 33.0), (2.0, 36.0)]):
        d = tmp_path / f"phase_{i}"
        d.mkdir()
        with open(d / "metrics.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["filename", "total_bpp", "psnr"])
            w.writeheader()
            w.writerow({"filename": "kodim19.png", "total_bpp": 9, "psnr": 9})
            w.writerow({"filename": "average", "total_bpp": bpp, "psnr": psnr})
    main(["--anchor", str(tmp_path / "phase_*" / "metrics.csv"),
          "--test-points", "0.55:30,1.1:33,2.2:36"])
    out = capsys.readouterr().out
    assert "BD-rate: +10.00 %" in out
