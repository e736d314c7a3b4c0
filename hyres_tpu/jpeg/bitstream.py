"""Host JFIF bitstream assembly/parsing (ctypes over coding C++ ext).

Only the serial Huffman bit-twiddling runs here; all transform math stays
on device (see jpeg/core.py). Replaces the reference's libturbojpeg
dependency (/root/reference/models/utils/turbo_jpeg_compression.py).
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..coding.build import ensure_built
from . import tables as T

_lib = ctypes.CDLL(str(ensure_built()))

_lib.hyj_encode_420.argtypes = [
    ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int16),
    ctypes.POINTER(ctypes.c_int16),
    ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
]
_lib.hyj_encode_420.restype = ctypes.c_int64
_lib.hyj_buf_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
_lib.hyj_dec_new.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
_lib.hyj_dec_new.restype = ctypes.c_void_p
_lib.hyj_dec_free.argtypes = [ctypes.c_void_p]
_lib.hyj_dec_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
_lib.hyj_dec_coeffs.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                ctypes.POINTER(ctypes.c_int16)]
_lib.hyj_dec_qtable.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                ctypes.POINTER(ctypes.c_int32)]


def _i16p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def assemble_jfif(y_coef: np.ndarray, cb_coef: np.ndarray, cr_coef: np.ndarray,
                  width: int, height: int, quality: int) -> bytes:
    """Coefficient planes (nh, nw, 8, 8) int → baseline JFIF bytes."""
    mh, mw = cb_coef.shape[0], cb_coef.shape[1]
    qy, qc = T.quality_to_qtables(quality)
    y = np.ascontiguousarray(y_coef.reshape(mh * 2, mw * 2, 64), np.int16)
    cb = np.ascontiguousarray(cb_coef.reshape(mh, mw, 64), np.int16)
    cr = np.ascontiguousarray(cr_coef.reshape(mh, mw, 64), np.int16)
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _lib.hyj_encode_420(
        _i16p(y), _i16p(cb), _i16p(cr), width, height, mw, mh,
        _i32p(np.ascontiguousarray(qy)), _i32p(np.ascontiguousarray(qc)),
        ctypes.byref(out))
    data = ctypes.string_at(out, n)
    _lib.hyj_buf_free(out)
    return data


class ParsedJpeg:
    """Coefficient-level parse of a baseline JFIF stream (ours or libjpeg's)."""

    def __init__(self, data: bytes):
        buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        h = _lib.hyj_dec_new(buf, len(data))
        if not h:
            raise ValueError("unsupported or corrupt JPEG stream")
        try:
            info = np.zeros(11, np.int32)
            _lib.hyj_dec_info(h, _i32p(info))
            self.width, self.height, self.ncomp = int(info[0]), int(info[1]), int(info[2])
            self.mcu_w, self.mcu_h = int(info[3]), int(info[4])
            self.sampling = [(int(info[5 + 2 * c]), int(info[6 + 2 * c]))
                             for c in range(self.ncomp)]
            self.coeffs = []
            self.qtables = []
            for c in range(self.ncomp):
                hh, vv = self.sampling[c]
                bw, bh = self.mcu_w * hh, self.mcu_h * vv
                out = np.zeros((bh, bw, 64), np.int16)
                _lib.hyj_dec_coeffs(h, c, _i16p(out))
                self.coeffs.append(out.reshape(bh, bw, 8, 8).astype(np.int32))
                q = np.zeros(64, np.int32)
                _lib.hyj_dec_qtable(h, c, _i32p(q))
                self.qtables.append(q)
        finally:
            _lib.hyj_dec_free(h)
