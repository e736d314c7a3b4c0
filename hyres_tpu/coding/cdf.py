"""PMF → quantized-CDF conversion (ctypes binding).

Same construction the reference relies on via CompressAI's
``_CXX.pmf_to_quantized_cdf`` (triggered by ``update()`` at
/root/reference/models/checkerboard.py:261-267, src/updata.py:53):
16-bit-total integer CDFs with zero-width bins repaired by stealing mass
from the lowest-frequency bin.
"""

from __future__ import annotations

import ctypes

import numpy as np

from .build import ensure_built

_lib = ctypes.CDLL(str(ensure_built()))
_lib.hyc_pmf_to_quantized_cdf.argtypes = [
    ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32),
]
_lib.hyc_pmf_to_quantized_cdf.restype = ctypes.c_int32


def pmf_to_quantized_cdf(pmf: np.ndarray, precision: int = 16) -> np.ndarray:
    pmf = np.ascontiguousarray(pmf, dtype=np.float32)
    out = np.empty(pmf.size + 1, np.int32)
    rc = _lib.hyc_pmf_to_quantized_cdf(
        pmf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pmf.size, precision,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise ValueError("pmf cannot be normalized to a valid CDF")
    return out
