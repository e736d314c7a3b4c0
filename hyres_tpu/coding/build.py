"""On-demand native build for the coding extension.

Compiles ``csrc/*.cpp`` into ``libhyres_coding.so`` next to this file the
first time the package is imported (and whenever the sources change, keyed
by a content hash). Uses plain g++ — no pybind11 / cmake needed for two
translation units.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
from pathlib import Path

_CSRC = Path(__file__).parent / "csrc"
_LIB = Path(__file__).parent / "libhyres_coding.so"
_STAMP = Path(__file__).parent / ".build_hash"


def _source_hash() -> str:
    h = hashlib.sha256()
    for src in sorted(_CSRC.glob("*.cpp")):
        h.update(src.read_bytes())
    return h.hexdigest()


def ensure_built() -> Path:
    digest = _source_hash()
    if _LIB.exists() and _STAMP.exists() and _STAMP.read_text().strip() == digest:
        return _LIB
    srcs = sorted(str(p) for p in _CSRC.glob("*.cpp"))
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-std=c++17", "-fPIC", "-shared", "-Wall",
        "-o", str(_LIB), *srcs,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    _STAMP.write_text(digest)
    return _LIB


if __name__ == "__main__":
    print(ensure_built())
