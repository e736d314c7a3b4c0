"""Self-describing bitstream container (.hyc) for compressed images.

The reference never serializes its compressed representation to disk —
its inference script computes metrics straight from the in-memory dicts
(/root/reference/src/inference.py:103-120) and throws the streams away.
A deployable codec needs an actual file format, so this module defines
HYC1: a 4-byte magic followed by one msgpack map wrapping any family's
``compress()`` output together with the model identity needed to decode
it later (family, N/M, jpeg quality, coder).

The families' ``strings`` nests differ (checkerboard/hyres:
``[[anchor_chunks, non_anchor_chunks], z_chunks]``; ELIC: interleaved
per-slice lists; cheng2020: a single flushed stream; TPU-coder payloads:
single framed ``bytes`` per plane) — msgpack represents any of them
verbatim, so pack/unpack is family- and coder-agnostic.

Container overhead is the magic + msgpack framing + the small meta map:
~100 bytes per image, counted honestly by the codec CLI's bpp (it uses
the real file size).
"""

from __future__ import annotations

from typing import Any, Dict

import msgpack

MAGIC = b"HYC1"

#: compress() keys that belong in the container (timers and telemetry
#: such as per-stage "time_*" fields are measurement artifacts, not rate)
_PAYLOAD_KEYS = ("strings", "shape", "size", "jpeg_buffers")


def _normalize(obj):
    """Recursively coerce the compress() nest into msgpack-native types:
    tuples -> lists, bytearray/memoryview -> bytes, numpy ints -> int."""
    if isinstance(obj, (bytes,)):
        return obj
    if isinstance(obj, (bytearray, memoryview)):
        return bytes(obj)
    if isinstance(obj, (list, tuple)):
        return [_normalize(v) for v in obj]
    if hasattr(obj, "item") and not hasattr(obj, "__len__"):  # numpy scalar
        return obj.item()
    return obj


def pack_compressed(comp: Dict[str, Any], *, model: str, N: int, M: int,
                    jpeg_quality: int | None = None,
                    coder: str = "host") -> bytes:
    """Serialize one image's compress() output into a HYC1 blob."""
    payload = {k: _normalize(comp[k]) for k in _PAYLOAD_KEYS if k in comp}
    blob = msgpack.packb({
        "version": 1,
        "model": model,
        "N": int(N),
        "M": int(M),
        "jpeg_quality": None if jpeg_quality is None else int(jpeg_quality),
        "coder": coder,
        "payload": payload,
    }, use_bin_type=True)
    return MAGIC + blob


def unpack_compressed(blob: bytes) -> Dict[str, Any]:
    """Parse a HYC1 blob -> meta dict with ``payload`` holding the
    compress() dict (shape/size restored to tuples for the decoders,
    which hash them into jit program caches)."""
    if blob[:4] != MAGIC:
        raise ValueError(f"not a HYC1 container (magic {blob[:4]!r})")
    doc = msgpack.unpackb(blob[4:], raw=False)
    if doc.get("version") != 1:
        raise ValueError(f"unsupported HYC version {doc.get('version')!r}")
    payload = doc["payload"]
    for key in ("shape", "size"):
        if key in payload and payload[key] is not None:
            payload[key] = tuple(int(v) for v in payload[key])
    return doc
