"""ctypes bindings for the C++ rANS coder.

Python surface mirrors the coder classes the reference drives directly at
/root/reference/models/cheng2020.py:5,114,158-159 (``BufferedRansEncoder``
``encode_with_indexes``/``flush``, ``RansDecoder`` ``set_stream``/
``decode_stream``) and indirectly behind every entropy-model
compress/decompress call.
"""

from __future__ import annotations

import ctypes

import numpy as np

from .build import ensure_built

_lib = ctypes.CDLL(str(ensure_built()))

_lib.hyc_enc_new.restype = ctypes.c_void_p
_lib.hyc_enc_free.argtypes = [ctypes.c_void_p]
_lib.hyc_enc_push.argtypes = [
    ctypes.c_void_p,
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
]
_lib.hyc_enc_flush.argtypes = [ctypes.c_void_p]
_lib.hyc_enc_flush.restype = ctypes.c_int64
_lib.hyc_enc_data.argtypes = [ctypes.c_void_p]
_lib.hyc_enc_data.restype = ctypes.POINTER(ctypes.c_uint8)
_lib.hyc_dec_new.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
_lib.hyc_dec_new.restype = ctypes.c_void_p
_lib.hyc_dec_free.argtypes = [ctypes.c_void_p]
_lib.hyc_dec_stream.argtypes = [
    ctypes.c_void_p,
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int32),
]
_lib.hyc_lut_new.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
]
_lib.hyc_lut_new.restype = ctypes.c_void_p
_lib.hyc_lut_free.argtypes = [ctypes.c_void_p]
_lib.hyc_dec_stream_lut.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p,
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int32),
]


def _i32(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int32)


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class BufferedRansEncoder:
    """Accumulates symbols; ``flush`` emits them LIFO as one rANS stream."""

    def __init__(self):
        self._h = _lib.hyc_enc_new()

    def __del__(self):
        if getattr(self, "_h", None):
            _lib.hyc_enc_free(self._h)
            self._h = None

    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths, offsets):
        symbols = _i32(symbols).ravel()
        indexes = _i32(indexes).ravel()
        cdfs = _i32(cdfs)
        assert cdfs.ndim == 2
        _lib.hyc_enc_push(
            self._h, _ptr(symbols), _ptr(indexes), symbols.size,
            _ptr(cdfs), cdfs.shape[1], _ptr(_i32(cdf_lengths)), _ptr(_i32(offsets)),
        )

    def flush(self) -> bytes:
        n = _lib.hyc_enc_flush(self._h)
        data = _lib.hyc_enc_data(self._h)
        return ctypes.string_at(data, n)


class RansEncoder:
    """One-shot encode (CompressAI ``RansEncoder.encode_with_indexes``)."""

    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths, offsets) -> bytes:
        enc = BufferedRansEncoder()
        enc.encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets)
        return enc.flush()


class RansLut:
    """Per-table O(1) symbol lookup (2^16 uint16 entries per CDF row).

    Build once per baked table set; reuse across every decode. Keeps the
    owning arrays alive so the C side can read the CDF rows.
    """

    def __init__(self, cdfs, cdf_lengths):
        self.cdfs = _i32(cdfs)
        self.cdf_lengths = _i32(cdf_lengths)
        self._h = _lib.hyc_lut_new(_ptr(self.cdfs), self.cdfs.shape[1],
                                   _ptr(self.cdf_lengths), self.cdfs.shape[0])

    def __del__(self):
        if getattr(self, "_h", None):
            _lib.hyc_lut_free(self._h)
            self._h = None


class RansDecoder:
    def __init__(self, data: bytes | None = None):
        self._h = None
        if data is not None:
            self.set_stream(data)

    def __del__(self):
        if getattr(self, "_h", None):
            _lib.hyc_dec_free(self._h)
            self._h = None

    def set_stream(self, data: bytes):
        if self._h:
            _lib.hyc_dec_free(self._h)
        buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        self._h = _lib.hyc_dec_new(buf, len(data))

    def decode_stream(self, indexes, cdfs, cdf_lengths, offsets,
                      lut: "RansLut | None" = None) -> np.ndarray:
        indexes = _i32(indexes)
        flat = indexes.ravel()
        cdfs = _i32(cdfs)
        out = np.empty(flat.size, np.int32)
        if lut is not None:
            _lib.hyc_dec_stream_lut(
                self._h, lut._h, _ptr(flat), flat.size,
                _ptr(cdfs), cdfs.shape[1], _ptr(_i32(cdf_lengths)),
                _ptr(_i32(offsets)), _ptr(out),
            )
        else:
            _lib.hyc_dec_stream(
                self._h, _ptr(flat), flat.size,
                _ptr(cdfs), cdfs.shape[1], _ptr(_i32(cdf_lengths)),
                _ptr(_i32(offsets)), _ptr(out),
            )
        return out.reshape(indexes.shape)

    def decode_with_indexes(self, data: bytes, indexes, cdfs, cdf_lengths, offsets):
        self.set_stream(data)
        return self.decode_stream(indexes, cdfs, cdf_lengths, offsets)
