"""Data prep CLI: flatten class-directory datasets into a flat train dir.

Capability-parity with the reference's data/reorganize.py:1-29 (which
flattens mini-ImageNet class subdirectories into ``data/train/`` with
collision-renaming). The Kaggle download step of the reference's
setup.sh:34-60 is out of scope in a zero-egress environment — point
--source at an already-downloaded dataset.
"""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path

_EXTS = {".png", ".jpg", ".jpeg", ".bmp"}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="flatten class dirs into a flat train dir")
    p.add_argument("--source", type=str, required=True,
                   help="root containing class subdirectories of images")
    p.add_argument("--dest", type=str, required=True, help="flat output dir")
    p.add_argument("--move", action="store_true", help="move instead of copy")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    src = Path(args.source)
    dst = Path(args.dest)
    dst.mkdir(parents=True, exist_ok=True)
    n = 0
    for f in sorted(src.rglob("*")):
        if not f.is_file() or f.suffix.lower() not in _EXTS:
            continue
        out = dst / f.name
        if out.exists():  # collision-rename with the class dir prefix
            out = dst / f"{f.parent.name}_{f.name}"
            k = 0
            while out.exists():
                k += 1
                out = dst / f"{f.parent.name}_{k}_{f.name}"
        (shutil.move if args.move else shutil.copy2)(f, out)
        n += 1
    print(f"{'moved' if args.move else 'copied'} {n} images to {dst}")


if __name__ == "__main__":
    main()
