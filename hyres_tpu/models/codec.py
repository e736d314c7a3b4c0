"""Deployment codec wrappers: real entropy-coded compress/decompress.

Host choreography around the jit-compiled model pieces. Mirrors the
reference's API contract (/root/reference/models/checkerboard.py:167-259):

  compress(x)  -> {"strings": [[anchor, non_anchor], z_strings],
                   "shape": (zh, zw), "time": s}
  decompress(strings, shape) -> {"x_hat", "time"}
  inference(x) -> roundtrip with {"time": {compression, decompression,
                   total}}
  update(force) -> bake CDF tables (reference checkerboard.py:261-267)

TPU-first structure: the only host work is the rANS coder itself; every
tensor that feeds it is produced by a jit'd function using the dense
width-halved checkerboard packing (each parity class is a (H, W/2) dense
plane), so shapes are static and the two "passes" of the checkerboard
decode are two compiled XLA calls.
"""

from __future__ import annotations

import concurrent.futures
import functools
import time
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..coding import BufferedRansEncoder, RansDecoder
from ..coding import tpu_rans
from ..coding.rans import RansLut
from ..entropy import (
    CdfTables,
    narrow_symbols_i16,
    quantize_symbols_i16,
    build_bottleneck_tables,
    build_gaussian_tables,
    build_indexes,
    get_scale_table,
)
from ..nn import checkerboard
from ..nn.checkerboard import ANCHOR, NON_ANCHOR
from .base import CodecBase


def pad_to_multiple(x: jax.Array, mult: int) -> jax.Array:
    """Edge-pad H, W up to multiples of ``mult`` (fully-convolutional
    models need /64-divisible inputs; the reference only handles such
    inputs, SURVEY §5.7a)."""
    ph = (-x.shape[1]) % mult
    pw = (-x.shape[2]) % mult
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return x


def _lut_for(t: CdfTables) -> RansLut:
    """O(1)-decode symbol LUT, built once per baked table set."""
    lut = getattr(t, "_lut", None)
    if lut is None:
        lut = RansLut(t.quantized_cdf, t.cdf_length)
        t._lut = lut
    return lut


_CODER_POOL = concurrent.futures.ThreadPoolExecutor(8)

# symbols per sub-stream chunk; planes larger than this are split into
# independently-coded chunks so a SINGLE image codes on multiple cores.
# On single-core hosts chunking only adds overhead, so cap by cpu count.
import os

_CHUNK_SYMS = 131072
_MAX_CHUNKS = max(1, min(8, os.cpu_count() or 1))


def _n_chunks(n: int) -> int:
    return max(1, min(_MAX_CHUNKS, n // _CHUNK_SYMS))


def _frame(chunks: List[bytes]) -> bytes:
    """[u8 n][u32le len]*n + payloads — our per-image stream framing."""
    head = bytes([len(chunks)]) + b"".join(
        len(c).to_bytes(4, "little") for c in chunks)
    return head + b"".join(chunks)


def _unframe(data: bytes) -> List[bytes]:
    n = data[0]
    lens = [int.from_bytes(data[1 + 4 * i: 5 + 4 * i], "little") for i in range(n)]
    out = []
    off = 1 + 4 * n
    for ln in lens:
        out.append(data[off: off + ln])
        off += ln
    return out


def _encode_one(symbols: np.ndarray, indexes: np.ndarray, t: CdfTables) -> bytes:
    sym = symbols.ravel()
    idx = indexes.ravel()
    k = _n_chunks(sym.size)
    bounds = np.linspace(0, sym.size, k + 1, dtype=np.int64)

    def enc_chunk(j):
        enc = BufferedRansEncoder()
        enc.encode_with_indexes(sym[bounds[j]:bounds[j + 1]],
                                idx[bounds[j]:bounds[j + 1]],
                                t.quantized_cdf, t.cdf_length, t.offset)
        return enc.flush()

    if k == 1:
        return _frame([enc_chunk(0)])
    return _frame(list(_CODER_POOL.map(enc_chunk, range(k))))


def _decode_one(data: bytes, indexes: np.ndarray, t: CdfTables) -> np.ndarray:
    lut = _lut_for(t)
    idx = indexes.ravel()
    chunks = _unframe(data)
    bounds = np.linspace(0, idx.size, len(chunks) + 1, dtype=np.int64)

    def dec_chunk(j):
        return RansDecoder(chunks[j]).decode_stream(
            idx[bounds[j]:bounds[j + 1]], t.quantized_cdf, t.cdf_length,
            t.offset, lut=lut)

    if len(chunks) == 1:
        parts = [dec_chunk(0)]
    else:
        parts = list(_CODER_POOL.map(dec_chunk, range(len(chunks))))
    return np.concatenate(parts).reshape(indexes.shape)


def _encode_planes(symbols: np.ndarray, indexes: np.ndarray, t: CdfTables) -> List[bytes]:
    """Per-image rANS encode of (B, ...) int32 symbol/index arrays.

    Each image's plane is split into independently-coded sub-streams (our
    framing, ~5 bytes/chunk overhead) so both single-image latency and
    batch throughput use all host cores; ctypes releases the GIL during
    the C calls.
    """
    if symbols.shape[0] == 1:
        return [_encode_one(symbols[0], indexes[0], t)]
    return list(_CODER_POOL.map(
        lambda i: _encode_one(symbols[i], indexes[i], t),
        range(symbols.shape[0])))


def _decode_planes(strings: Sequence[bytes], indexes: np.ndarray, t: CdfTables) -> np.ndarray:
    if len(strings) == 1:
        return np.stack([_decode_one(strings[0], indexes[0], t)])
    return np.stack(list(_CODER_POOL.map(
        lambda i: _decode_one(strings[i], indexes[i], t), range(len(strings)))))


# -- packed wire format -------------------------------------------------
#
# Every device<->host hop over the TPU tunnel pays ~20-25 ms of latency
# PER ARRAY, which dwarfs bandwidth for the coder's many small outputs
# (19 arrays per checkerboard compress, 33 uploads per ELIC decompress
# before this existed). All coder traffic therefore rides ONE uint8
# buffer per direction: device-side bitcasts concatenated along the byte
# axis (XLA bitcast byte order == numpy little-endian views, pinned by
# tests/test_tpu_rans.py::test_bitcast_matches_numpy_views), host-side
# plain numpy views. Layout per plane:
#   [states u32 * lanes][n_renorm i32][n_esc i32]
#   [esc_pos i32 * ESC_MAX][esc_val i32 * ESC_MAX][stream u16 * cap]
# planes back-to-back, optional caller payload ("extra", e.g. HyRES's
# JPEG coefficients) last.


# observability: every tunnel transfer the coder wire makes is counted
# here (bytes, sync wall seconds) so perf work is attributable — see
# scripts/profile_breakdown.py and RESULTS.md's breakdown table.
# host_fallbacks counts compress() calls that silently re-framed with the
# host coder because a plane overflowed its avg-rate stream cap or escape
# side list (VERDICT r4 weak-6: the cliff must be measured, not silent);
# fallback_reasons keeps the OverflowError messages (most recent last).
WIRE_STATS = {"d2h_bytes": 0, "d2h_syncs": 0, "d2h_s": 0.0, "h2d_bytes": 0,
              "host_fallbacks": 0, "fallback_reasons": []}


def reset_wire_stats() -> None:
    WIRE_STATS.update(d2h_bytes=0, d2h_syncs=0, d2h_s=0.0, h2d_bytes=0,
                      host_fallbacks=0, fallback_reasons=[])


def count_host_fallback(exc: BaseException) -> None:
    """Record one TPU-coder -> host-coder fallback (keep <= 32 reasons)."""
    WIRE_STATS["host_fallbacks"] += 1
    reasons = WIRE_STATS["fallback_reasons"]
    reasons.append(str(exc))
    del reasons[:-32]


def _device_get_counted(x):
    t0 = time.time()
    out = jax.device_get(x)
    WIRE_STATS["d2h_s"] += time.time() - t0
    WIRE_STATS["d2h_syncs"] += 1
    WIRE_STATS["d2h_bytes"] += out.nbytes
    return out


def _dev_u8(x: jax.Array) -> jax.Array:
    """(B, ...) any int dtype -> (B, nbytes) u8 (device-side)."""
    b = jax.lax.bitcast_convert_type(x, jnp.uint8)
    return b.reshape(x.shape[0], -1)


def pack_encs(encs: Sequence[Dict], extra: jax.Array | None = None) -> jax.Array:
    """Traceable: encoder output dicts (+ optional extra) -> (B, n) u8."""
    parts = []
    for e in encs:
        parts += [_dev_u8(e["states"]),
                  _dev_u8(e["n_renorm"].reshape(-1, 1)),
                  _dev_u8(e["n_esc"].reshape(-1, 1)),
                  _dev_u8(e["esc_pos"]), _dev_u8(e["esc_val"]),
                  _dev_u8(e["stream"])]
    if extra is not None:
        parts.append(_dev_u8(extra))
    return jnp.concatenate(parts, axis=1)


def _enc_plane_nbytes(lanes: int, cap: int) -> int:
    return 4 * lanes + 8 + 8 * tpu_rans.ESC_MAX + 2 * cap


# wire-size bucketing bases: phase-B slices and decode uploads round
# actual lengths UP geometrically (base * 2^k) so only O(log(cap/base))
# distinct wire/decode programs can ever exist per plane geometry. A
# fresh jit through the tunnel costs SECONDS (the decode scan recompiles
# whole); the <=2x zero padding rides the wire at ~30 MB/s (a few ms).
# Linear 4 KB buckets (round 2) looked tighter but made mid-run rate
# drift recompile the decode scan 4-14 s per new bucket combination.
_STREAM_BUCKET = 4096   # u16 renorm-stream entries (8 KB)
_COEF_BUCKET = 4096     # sparse-extra (pos, val) entries


def _bucket(n: int, g: int) -> int:
    """Smallest g * 2^k >= n (geometric bucket)."""
    m = g
    n = int(n)
    while m < n:
        m *= 2
    return m


def unpack_encs_host(blob: np.ndarray, metas: Sequence[Tuple[int, int]]):
    """(B, n) u8 numpy blob -> (list of enc dicts, trailing extra bytes).

    metas: per-plane (lanes, cap) in pack order."""
    off = 0
    encs = []

    def view(nbytes, dt):
        nonlocal off
        out = np.ascontiguousarray(blob[:, off:off + nbytes]).view(dt)
        off += nbytes
        return out

    for lanes, cap in metas:
        encs.append({
            "states": view(4 * lanes, np.uint32),
            "n_renorm": view(4, np.int32)[:, 0],
            "n_esc": view(4, np.int32)[:, 0],
            "esc_pos": view(4 * tpu_rans.ESC_MAX, np.int32),
            "esc_val": view(4 * tpu_rans.ESC_MAX, np.int32),
            "stream": view(2 * cap, np.uint16),
        })
    return encs, blob[:, off:]


def pack_frames_host(unframed: Sequence[Tuple], extra: np.ndarray | None = None):
    """Host-side: unframe_batch outputs (+ optional extra bytes) -> ONE
    (B, n) u8 upload buffer + metas for the device-side unpacker."""
    parts, metas = [], []
    for lanes, states, stream, esc_pos, esc_val in unframed:
        metas.append((int(lanes), int(stream.shape[1])))
        parts += [np.ascontiguousarray(states).view(np.uint8),
                  np.ascontiguousarray(esc_pos.astype(np.int32)).view(np.uint8),
                  np.ascontiguousarray(esc_val.astype(np.int32)).view(np.uint8),
                  np.ascontiguousarray(stream).view(np.uint8)]
    if extra is not None:
        parts.append(np.ascontiguousarray(extra).view(np.uint8))
    return np.concatenate(parts, axis=1), tuple(metas)


@functools.lru_cache(maxsize=64)
def _frames_unpacker(metas: Tuple[Tuple[int, int], ...], extra_nbytes: int):
    """Jitted device-side inverse of pack_frames_host: ONE dispatch
    returning every plane's (states u32, esc_pos i32, esc_val i32,
    stream u16) plus the extra byte slice."""

    @jax.jit
    def unpack(blob):
        B = blob.shape[0]
        off = 0
        outs = []
        for lanes, cap in metas:
            states = jax.lax.bitcast_convert_type(
                blob[:, off:off + 4 * lanes].reshape(B, lanes, 4), jnp.uint32)
            off += 4 * lanes
            esc_pos = jax.lax.bitcast_convert_type(
                blob[:, off:off + 4 * tpu_rans.ESC_MAX].reshape(
                    B, tpu_rans.ESC_MAX, 4), jnp.int32)
            off += 4 * tpu_rans.ESC_MAX
            esc_val = jax.lax.bitcast_convert_type(
                blob[:, off:off + 4 * tpu_rans.ESC_MAX].reshape(
                    B, tpu_rans.ESC_MAX, 4), jnp.int32)
            off += 4 * tpu_rans.ESC_MAX
            stream = jax.lax.bitcast_convert_type(
                blob[:, off:off + 2 * cap].reshape(B, cap, 2), jnp.uint16)
            off += 2 * cap
            outs.append((states, esc_pos, esc_val, stream))
        extra = blob[:, off:off + extra_nbytes]
        return outs, extra

    return unpack


def upload_frames(unframed: Sequence[Tuple], extra: np.ndarray | None = None):
    """ONE host->device transfer for all planes' decode inputs. Returns
    (per-plane device tuples like unframed, extra u8 device slice)."""
    blob, metas = pack_frames_host(unframed, extra)
    WIRE_STATS["h2d_bytes"] += blob.nbytes
    extra_nbytes = 0 if extra is None else extra.shape[1] * extra.itemsize
    outs, d_extra = _frames_unpacker(metas, extra_nbytes)(jnp.asarray(blob))
    # same tuple order as unframe_batch: (lanes, states, stream, esc_pos,
    # esc_val)
    return ([(unframed[i][0], states, stream, esc_pos, esc_val)
             for i, (states, esc_pos, esc_val, stream) in enumerate(outs)],
            d_extra if extra is not None else None)


# -- sliced encode pulls -------------------------------------------------
#
# The naive encode pull ships every plane at its worst-case cap
# (stream_cap) plus dense `extra` payload — ~10x the real bytes on
# trained stats, and D2H over the tunnel runs only ~20-40 MB/s, with a
# fixed ~25 ms cost PER sync. pull_encs therefore slices the blob to
# (bucketed) actual lengths, learning the sizes one of three ways:
# speculatively from per-codec high-water marks (steady state: ONE sync
# of near-actual bytes, self-validating via a size vector that rides
# the blob), from a dedicated tiny size pull (first batched call), or
# not at all (first single-image call: full caps cost less than a
# second sync). `extra` (HyRES's JPEG coefficients) rides the same blob,
# compacted to sparse (pos, val) pairs when that wins. Overflows
# (stream cap / escape list) are always visible in a size vector before
# any frame is assembled, so the host-coder fallback never pays a
# garbage pull.


def _sizes_cols(encs, extra):
    """(B, 2P+3) i32: per plane [n_renorm, n_esc], then nnz(extra), then
    the 64-bit BLOCK-COLUMN activity mask of extra as two i32 words
    (bit c set iff any 8x8 block's c-th coefficient is nonzero; zero
    when extra is empty or not block-aligned). The mask is what the
    column-sparse coefficient pack validates its static column plan
    against — see _pack_sliced_jit."""
    cols = []
    for e in encs:
        cols += [e["n_renorm"], e["n_esc"]]
    flat = extra.reshape(extra.shape[0], -1)
    B, n = flat.shape
    if n and n % 64 == 0:
        nz = jnp.any((flat != 0).reshape(B, n // 64, 64), axis=1)  # (B, 64)
        bits = jnp.where(nz, jnp.uint32(1), jnp.uint32(0))
        w = jnp.arange(32, dtype=jnp.uint32)
        lo = jnp.sum(bits[:, :32] << w, axis=1).astype(jnp.int32)
        hi = jnp.sum(bits[:, 32:] << w, axis=1).astype(jnp.int32)
    else:
        lo = hi = jnp.zeros((B,), jnp.int32)
    cols += [lo, hi]
    # nnz stays LAST (sizes[:, -1] is the nnz contract everywhere)
    cols.append(jnp.sum(flat != 0, axis=1).astype(jnp.int32))
    return jnp.stack(cols, axis=1)


_sizes_jit = jax.jit(_sizes_cols)


@jax.jit
def _pack_full_jit(encs, extra):
    return pack_encs(encs, extra)


@functools.partial(jax.jit,
                   static_argnames=("slices", "coef_cap", "with_sizes",
                                    "coef_cols"))
def _pack_sliced_jit(encs, extra, slices, coef_cap, with_sizes=False,
                     coef_cols=None):
    """pack_encs with per-plane (stream_len, esc_len) slicing; extra is
    appended dense (coef_cap None), as sparse (pos i32, val i16)
    compacted pairs (coef_cap entries, positions padded with n), or —
    when coef_cols is a static tuple of 8x8-block coefficient positions
    — COLUMN-sparse: extra viewed as (B, nblk, 64) with only the listed
    columns shipped, positions implicit. The column pack exists because
    the (pos, val) compaction ran two full-plane masked_compact trees
    (~51 ms of device time per image, matched_r5/pull_decomp.log) while
    JPEG coefficients at production qualities are nonzero in only a
    handful of the 64 block positions; static column slices cost ~zero
    device compute. The plan is validated against the on-blob column
    mask (_sizes_cols) and widened via exact repull on miss.
    with_sizes prepends the (B, 2P+3) i32 size vector so a SPECULATIVE
    pull can validate its slice plan from the blob itself (see
    pull_encs)."""
    parts = []
    if with_sizes:
        parts.append(_dev_u8(_sizes_cols(encs, extra)))
    for e, (sl, el) in zip(encs, slices):
        parts += [_dev_u8(e["states"]),
                  _dev_u8(e["n_renorm"].reshape(-1, 1)),
                  _dev_u8(e["n_esc"].reshape(-1, 1)),
                  _dev_u8(e["esc_pos"][:, :el]),
                  _dev_u8(e["esc_val"][:, :el]),
                  _dev_u8(e["stream"][:, :sl])]
    if coef_cols is not None:
        B = extra.shape[0]
        n = extra.reshape(B, -1).shape[1]
        assert n % 64 == 0
        blk = extra.reshape(B, n // 64, 64)
        if coef_cols:
            # static slices + one concat (NOT a gather — keeps the pack
            # at pure data-movement cost on every backend)
            parts.append(_dev_u8(jnp.concatenate(
                [blk[:, :, c:c + 1] for c in coef_cols], axis=2)))
    elif coef_cap is None:
        if extra.shape[1]:
            parts.append(_dev_u8(extra))
    else:
        B = extra.shape[0]
        flat = extra.reshape(B, -1)
        n = flat.shape[1]

        if tpu_rans.COMPACT_MODE == "merge":
            def one(row):
                mask = row != 0
                iota = jnp.arange(n, dtype=jnp.int32)
                pos, _ = tpu_rans.masked_compact(iota, mask, coef_cap,
                                                 fill=n)
                val, _ = tpu_rans.masked_compact(
                    row.astype(jnp.int16), mask, coef_cap)
                return pos, val
        else:
            def one(row):
                (pos,) = jnp.nonzero(row != 0, size=coef_cap, fill_value=n)
                val = jnp.take(row, pos, mode="fill",
                               fill_value=0).astype(jnp.int16)
                return pos.astype(jnp.int32), val

        pos, val = jax.vmap(one)(flat)
        parts += [_dev_u8(pos), _dev_u8(val)]
    return jnp.concatenate(parts, axis=1)


def _unpack_sliced_host(blob: np.ndarray, plans, extra_info,
                        with_sizes: bool = False):
    """Inverse of _pack_sliced_jit. plans: per-plane (lanes, sl, el).
    extra_info: None or (np_dtype, per_image_n, coef_cap_or_None[,
    coef_cols_or_None]). Returns (encs, dense extra np or None,
    sizes or None)."""
    off = 0
    B = blob.shape[0]

    def view(nbytes, dt):
        nonlocal off
        out = np.ascontiguousarray(blob[:, off:off + nbytes]).view(dt)
        off += nbytes
        return out

    sizes = view(4 * (2 * len(plans) + 3), np.int32) if with_sizes else None
    encs = []
    for lanes, sl, el in plans:
        encs.append({
            "states": view(4 * lanes, np.uint32),
            "n_renorm": view(4, np.int32)[:, 0],
            "n_esc": view(4, np.int32)[:, 0],
            "esc_pos": view(4 * el, np.int32) if el else
            np.zeros((B, 0), np.int32),
            "esc_val": view(4 * el, np.int32) if el else
            np.zeros((B, 0), np.int32),
            "stream": view(2 * sl, np.uint16),
        })
    extra_np = None
    if extra_info is not None:
        dt, n, coef_cap = extra_info[:3]
        coef_cols = extra_info[3] if len(extra_info) > 3 else None
        if coef_cols is not None:
            k = len(coef_cols)
            extra_np = np.zeros((B, n // 64, 64), dt)
            if k:
                packed = view(n // 64 * k * dt.itemsize, dt)
                extra_np[:, :, list(coef_cols)] = packed.reshape(
                    B, n // 64, k)
            extra_np = extra_np.reshape(B, n)
        elif coef_cap is None:
            extra_np = view(n * dt.itemsize, dt)
        else:
            pos = view(4 * coef_cap, np.int32)
            val = view(2 * coef_cap, np.int16)
            extra_np = np.zeros((B, n), dt)
            for i in range(B):
                m = pos[i] < n
                extra_np[i, pos[i][m]] = val[i][m]
    return encs, extra_np, sizes


def _check_true_overflow(sizes: np.ndarray, caps: Sequence[int]) -> None:
    for p, cap in enumerate(caps):
        n_renorm = int(sizes[:, 2 * p].max())
        n_esc = int(sizes[:, 2 * p + 1].max())
        if n_renorm > cap or n_esc >= min(tpu_rans.ESC_MAX + 1, 256):
            raise OverflowError(
                f"plane {p}: renorm {n_renorm}/{cap} or escapes "
                f"{n_esc} overflow")


def _exact_plans(sizes: np.ndarray, lanes_l: Sequence[int],
                 caps: Sequence[int]):
    plans = []
    for p, cap in enumerate(caps):
        sl = min(cap, _bucket(int(sizes[:, 2 * p].max()), _STREAM_BUCKET))
        ne = int(sizes[:, 2 * p + 1].max())
        # escapes ship full-list or not at all (2 KB when present, rare
        # at trained stats): a graded esc length would multiply the set
        # of compiled pack-program shapes for no meaningful wire saving
        el = 0 if ne == 0 else tpu_rans.ESC_MAX
        plans.append((lanes_l[p], sl, el))
    return plans


def pull_encs_dispatch(encs: Sequence[Dict], extra: jax.Array | None = None,
                       cap_state: dict | None = None):
    """Enqueue the device-side pack program for a pull WITHOUT syncing;
    returns a zero-arg ``finish()`` closure that performs the device_get
    + host unpack (the sync half of :func:`pull_encs`). Pipelined callers
    dispatch the NEXT image's encode programs between the two halves so
    this image's blob transfer and host framing overlap the next image's
    device compute (TPU executes programs in dispatch order, but D2H DMA
    overlaps compute).

    Raises OverflowError (from finish()) when any plane overflowed its
    stream cap or escape list — callers already treat that as "re-frame
    with the host coder". finish() returns (host enc dicts, extra as a
    dense (B, n) numpy array or None).

    Pull strategy (tunnel syncs cost ~25 ms EACH; cap padding is ~10x
    the real bytes at ~20-40 MB/s):

    - cap_state with a recorded high-water mark -> SPECULATIVE
      single-sync pull: slice every plane to hwm*margin, ride the
      per-image size vector in the blob, validate on arrival; a miss
      re-pulls once with exact slices (sizes are then known). Steady
      state = ONE sync of near-actual bytes at ANY batch size.
    - first call, B == 1 -> one full-cap pull (the padding costs less
      than a second sync would).
    - first call, B >= 2 -> two-phase: tiny size pull, then an
      exact-sliced blob (full caps at batch size would be many MB).

    cap_state is a per-codec dict (mutated here) keyed by the plane
    signature, so shapes/orientations track separate high-water marks.
    """
    B = int(encs[0]["states"].shape[0])
    encs = list(encs)
    extra_arr = (jnp.zeros((B, 0), jnp.uint8) if extra is None
                 else extra.reshape(B, -1))
    lanes_l = [int(e["states"].shape[1]) for e in encs]
    caps = [int(e["stream"].shape[1]) for e in encs]
    dt = None if extra is None else np.dtype(extra.dtype)
    n_extra = 0 if extra is None else int(np.prod(extra.shape[1:]))
    sig = (tuple(zip(lanes_l, caps)), n_extra,
           None if dt is None else dt.str)
    st = None if cap_state is None else cap_state.get(sig)

    def coef_cap_for(nnz_max: int):
        if extra is None:
            return None, None
        cap_nz = min(n_extra, _bucket(nnz_max, _COEF_BUCKET))
        cc = cap_nz if 6 * cap_nz < n_extra * dt.itemsize else None
        return cc, (dt, n_extra, cc)

    def _mask_of(sizes) -> int:
        """u64 column mask OR'd over the batch from the sizes row
        (columns -3/-2 per _sizes_cols); 0 when not block-aligned."""
        if sizes.shape[1] < 2 * len(encs) + 3:
            return 0
        lo = np.bitwise_or.reduce(sizes[:, -3].astype(np.uint32))
        hi = np.bitwise_or.reduce(sizes[:, -2].astype(np.uint32))
        return int(lo) | (int(hi) << 32)

    def finalize(out, extra_np, sizes):
        if cap_state is not None and sizes is not None:
            prev = cap_state.get(sig) or {"streams": [0] * len(encs),
                                          "escs": [0] * len(encs),
                                          "nnz": 0, "colmask": 0}
            cap_state[sig] = {
                "streams": [max(prev["streams"][p],
                                int(sizes[:, 2 * p].max()))
                            for p in range(len(encs))],
                "escs": [max(prev["escs"][p], int(sizes[:, 2 * p + 1].max()))
                         for p in range(len(encs))],
                "nnz": max(prev["nnz"], int(sizes[:, -1].max())),
                "colmask": prev.get("colmask", 0) | _mask_of(sizes),
            }
        if extra is not None and extra_np is not None:
            extra_np = np.ascontiguousarray(extra_np).view(dt).reshape(
                (B,) + tuple(extra.shape[1:]))
        return out, extra_np

    def exact_repull(sizes):
        _check_true_overflow(sizes, caps)
        plans = _exact_plans(sizes, lanes_l, caps)
        cc, extra_info = coef_cap_for(int(sizes[:, -1].max()))
        blob = _device_get_counted(_pack_sliced_jit(
            encs, extra_arr, slices=tuple((sl, el) for _, sl, el in plans),
            coef_cap=cc))
        out, extra_np, _ = _unpack_sliced_host(blob, plans, extra_info)
        return finalize(out, extra_np, sizes)

    if st is not None:
        # speculative single-sync pull against the high-water marks
        plans = []
        for p, cap in enumerate(caps):
            sl = min(cap, _bucket(st["streams"][p] * 5 // 4 + 512,
                                  _STREAM_BUCKET))
            el = 0 if st["escs"][p] == 0 else tpu_rans.ESC_MAX
            plans.append((lanes_l[p], sl, el))
        # coefficient plan: COLUMN-sparse when the payload is 8x8-block
        # aligned and a column mask has been observed — static slices
        # instead of the (pos, val) compaction whose masked_compact
        # trees cost ~51 ms/image of device time (pull_decomp.log).
        # Validated against the on-blob mask; a new column -> one exact
        # repull (sparse path) which widens the recorded mask.
        use_cols = (extra is not None and n_extra % 64 == 0
                    and "colmask" in st)
        if use_cols:
            cm = st["colmask"]
            cols = tuple(c for c in range(64) if (cm >> c) & 1)
            cc = None
            extra_info = (dt, n_extra, None, cols)
            blob_dev = _pack_sliced_jit(
                encs, extra_arr,
                slices=tuple((sl, el) for _, sl, el in plans),
                coef_cap=None, with_sizes=True, coef_cols=cols)
        else:
            cm, cols = 0, None
            cc, extra_info = coef_cap_for(st["nnz"] * 5 // 4 + 64)
            blob_dev = _pack_sliced_jit(
                encs, extra_arr,
                slices=tuple((sl, el) for _, sl, el in plans),
                coef_cap=cc, with_sizes=True)

        def finish():
            blob = _device_get_counted(blob_dev)
            out, extra_np, sizes = _unpack_sliced_host(
                blob, plans, extra_info, with_sizes=True)
            _check_true_overflow(sizes, caps)
            fits = all(
                int(sizes[:, 2 * p].max()) <= plans[p][1]
                and int(sizes[:, 2 * p + 1].max()) <= plans[p][2]
                for p in range(len(encs))
            ) and ((_mask_of(sizes) | cm) == cm if use_cols
                   else (cc is None or int(sizes[:, -1].max()) <= cc))
            if fits:
                return finalize(out, extra_np, sizes)
            return exact_repull(sizes)  # rare: stats moved past the hwm
        return finish

    if B == 1:
        blob_dev = _pack_full_jit(encs, extra_arr)

        def finish():
            blob_np = _device_get_counted(blob_dev)
            metas = [(lanes_l[p], caps[p]) for p in range(len(encs))]
            out, extra_bytes = unpack_encs_host(blob_np, metas)
            # sizes for the hwm (incl. the column mask) from the pulled
            # fields themselves — same layout as _sizes_cols
            nnz, lo, hi = 0, 0, 0
            if extra is not None:
                flat = np.ascontiguousarray(extra_bytes).view(dt)
                nnz = int((flat != 0).sum(axis=1).max())
                if n_extra and n_extra % 64 == 0:
                    colnz = (flat != 0).reshape(
                        flat.shape[0], -1, 64).any(axis=(0, 1))
                    cm = sum(1 << c for c in range(64) if colnz[c])
                    # wrap-safe u32 -> i32 (np.int32(u32 >= 2^31) raises)
                    lo = np.uint32(cm & 0xFFFFFFFF).astype(np.int32)
                    hi = np.uint32(cm >> 32).astype(np.int32)
            sizes = np.stack(
                [c for e in out for c in (e["n_renorm"], e["n_esc"])]
                + [np.full(B, lo, np.int32), np.full(B, hi, np.int32),
                   np.full(B, nnz, np.int32)], axis=1)
            return finalize(out, None if extra is None else extra_bytes,
                            sizes)
        return finish

    sizes_dev = _sizes_jit(encs, extra_arr)

    def finish():
        sizes = np.asarray(_device_get_counted(sizes_dev))
        return exact_repull(sizes)
    return finish


def pull_encs(encs: Sequence[Dict], extra: jax.Array | None = None,
              cap_state: dict | None = None):
    """Dispatch + finish in one call (the non-pipelined pull)."""
    return pull_encs_dispatch(encs, extra, cap_state)()


class TpuPlaneCoder:
    """Device-side rANS coder bound to one baked table set.

    Gaussian (y) planes use the segment-table coder
    (tpu_rans.gauss_encode/gauss_decode): a 64x128 bounds table plus
    uniform low bits replaces the 64x3133 scale-table CDFs — no (n, 3133)
    f32 intermediates in bulk lookups, no per-symbol LUT gather in the
    decode scan, and (unlike the round-3 analytic-erf coder) no
    recomputed f32 rounding in the wire contract, so encoder and decoder
    agree bit-for-bit on every backend by construction (see the design
    note in coding/tpu_rans.py). Factorized-prior (z) planes keep the
    baked per-channel tables (their densities are learned, not analytic;
    the tables are tiny).

    All three planes of an image (z, y-anchor, y-non-anchor) encode in
    ONE device program; each decode scan is its own program so the
    surrounding entropy-parameter stages stay the exact shared programs
    the encoder used (the bit-exactness invariant, see
    CheckerboardCodec._build_jits).

    Lane counts trade the per-lane state flush (4 B/lane of real stream
    bytes) against scan depth; see coding/tpu_rans.py.
    """

    def __init__(self, gauss_tables, eb_tables, scale_table=None):
        if scale_table is None:
            scale_table = get_scale_table()
        self.gauss_ana = tpu_rans.build_gauss_tables(scale_table)
        self.eb_dev = tpu_rans.build_device_tables(eb_tables)

        gauss_ana, eb_dev = self.gauss_ana, self.eb_dev

        def _enc_eb(sym, idx):
            B = sym.shape[0]
            n = int(np.prod(sym.shape[1:]))
            lanes = tpu_rans.lanes_for(n)
            return tpu_rans.rans_encode_batch(
                sym.astype(jnp.int32).reshape(B, -1),
                idx.astype(jnp.int32).reshape(B, -1), eb_dev, lanes)

        def _enc_gauss(sym, idx):
            B = sym.shape[0]
            n = int(np.prod(sym.shape[1:]))
            lanes = min(tpu_rans.GAUSS_LANES, tpu_rans.lanes_for(n))
            return tpu_rans.gauss_encode_batch(
                sym.astype(jnp.int32).reshape(B, -1),
                idx.astype(jnp.int32).reshape(B, -1), gauss_ana, lanes)

        def _z_idx(z_sym):
            C = z_sym.shape[-1]
            return jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32), z_sym.shape)

        @jax.jit
        def encode_all(z_sym, a_sym, a_idx, n_sym, n_idx):
            # The two equal-shape y-parity planes ride ONE fused kernel
            # launch (rows in VPU sublane lockstep): the encode scan's
            # sequential step latency is paid once for both planes, and
            # the wire stays bit-identical to separate per-plane encodes
            # (pinned by test_models.test_encode_all_fused_matches_
            # separate). r5 dispatch probe on-chip: separate z+a+n =
            # 175.8 ms, z + fused(a,n) = 91.8 ms. (Folding z in as a
            # ragged identity-padded row — fused_encode_planes supports
            # it — measured SLOWER, 172 ms: the G=4 call with identity
            # rows loses the sublane economics on this backend, see
            # NOTES r5.)
            B = z_sym.shape[0]
            eb = _enc_eb(z_sym, _z_idx(z_sym))
            yn = int(np.prod(a_sym.shape[1:]))
            y_lanes = min(tpu_rans.GAUSS_LANES, tpu_rans.lanes_for(yn))
            if a_sym.shape == n_sym.shape:
                a_enc, n_enc = tpu_rans.fused_encode_planes([
                    ("gauss", a_sym.astype(jnp.int32).reshape(B, -1),
                     a_idx.astype(jnp.int32).reshape(B, -1), gauss_ana,
                     y_lanes),
                    ("gauss", n_sym.astype(jnp.int32).reshape(B, -1),
                     n_idx.astype(jnp.int32).reshape(B, -1), gauss_ana,
                     y_lanes)])
                return eb, a_enc, n_enc
            return (eb, _enc_gauss(a_sym, a_idx), _enc_gauss(n_sym, n_idx))

        @jax.jit
        def encode_gauss(sym, idx):
            return _enc_gauss(sym, idx)

        @jax.jit
        def encode_eb(z_sym):
            return _enc_eb(z_sym, _z_idx(z_sym))

        @functools.partial(jax.jit, static_argnums=(5,))
        def decode_gauss(stream, states, idx, esc_pos, esc_val, lanes: int):
            B = idx.shape[0]
            n = int(np.prod(idx.shape[1:]))
            sym = tpu_rans.gauss_decode_batch(
                stream, states, idx.astype(jnp.int32).reshape(B, -1),
                esc_pos, esc_val, gauss_ana, lanes, n)
            sym = jnp.clip(sym, -32000, 32000).astype(jnp.int16)
            return sym.reshape(idx.shape)

        @functools.partial(jax.jit, static_argnums=(4, 5))
        def decode_eb(stream, states, esc_pos, esc_val,
                      shape: Tuple[int, ...], lanes: int):
            B = shape[0]
            C = shape[-1]
            n = int(np.prod(shape[1:]))
            idx = jnp.broadcast_to(
                jnp.arange(C, dtype=jnp.int32), shape).reshape(B, -1)
            sym = tpu_rans.rans_decode_batch(
                stream, states, idx, esc_pos, esc_val, eb_dev, lanes, n)
            sym = jnp.clip(sym, -32000, 32000).astype(jnp.int16)
            return sym.reshape(shape)

        self.encode_all = encode_all
        self.encode_gauss = encode_gauss
        self.encode_eb = encode_eb
        self.decode_gauss = decode_gauss
        self.decode_eb = decode_eb

    # -- host-side (un)framing ---------------------------------------------

    @staticmethod
    def frames_from_enc(enc) -> List[bytes]:
        """Per-image byte frames from a downloaded vmapped-encode output.
        Raises OverflowError if any image's escape side list overflowed
        (the caller re-frames the whole batch with the host coder)."""
        B = enc["states"].shape[0]
        return [tpu_rans.frame_plane(
            enc["states"][i], enc["stream"][i], int(enc["n_renorm"][i]),
            enc["esc_pos"][i], enc["esc_val"][i], int(enc["n_esc"][i]))
            for i in range(B)]

    @staticmethod
    def unframe_batch(strings: Sequence[bytes], n: int):
        """Per-image frames -> stacked device-ready arrays (or None if any
        frame is host-coder format, which forces the host decode path).

        Streams are padded to a common BUCKETED length (next multiple of
        ``_STREAM_BUCKET`` above the batch max) instead of the worst-case
        cap: the upload then rides near the actual payload size, while
        bucketing bounds how many stream shapes the decode jits compile.
        """
        if not all(tpu_rans.is_tpu_frame(s) for s in strings):
            return None
        parts = [tpu_rans.unframe_plane(s, n) for s in strings]
        lanes = parts[0][0]
        if any(p[0] != lanes for p in parts):
            return None
        L = _bucket(max(p[2].shape[0] for p in parts), _STREAM_BUCKET)
        stream = np.zeros((len(parts), L), np.uint16)
        for i, p in enumerate(parts):
            stream[i, : p[2].shape[0]] = p[2]
        return (lanes,
                np.stack([p[1] for p in parts]),
                stream,
                np.stack([p[3] for p in parts]),
                np.stack([p[4] for p in parts]))


class CheckerboardCodec(CodecBase):
    """Stateful wrapper: model def + params + baked CDF tables.

    clamp: output range of decompress. The reference clamps every decode
    to (0,1) (checkerboard.py:235) — wrong for the residual signal inside
    HyRES, whose range is [-1,1]; HyresCodec passes clamp=None
    (deliberate fix, see models/hyres.py).
    """

    # -- jit graph pieces ---------------------------------------------------

    def _build_jits(self):
        model, params = self.model, self.params
        table = jnp.asarray(get_scale_table())

        def apply(method, *args):
            return model.apply(params, *args, method=method)

        # Bit-exactness invariant: the entropy parameters MUST be computed
        # by the SAME compiled program on both sides of the channel (two
        # differently-fused XLA programs may differ by 1 ulp, which can
        # flip a scale-table index and desync the rANS decode — the same
        # reason the reference pins cudnn determinism in its codec paths,
        # /root/reference/models/cheng2020.py:108,148). Therefore BOTH
        # sides run dec_stage1/dec_stage2 for every coder-facing tensor;
        # the stages also emit the quantized symbols (from the encoder's
        # y; the decoder feeds zeros and ignores that output — the symbol
        # math is elementwise, so the waste is negligible and the fusion
        # of the shared params is identical on both sides).
        #
        # Transfer dtypes are minimized for the host hop: symbols int16
        # (values are clipped; both sides code the same clipped integer),
        # scale-table indexes uint8 (64 levels).

        @jax.jit
        def enc_analysis(x):
            y, z = apply(model.analysis, x)
            med = apply(model.eb_medians)
            return y, quantize_symbols_i16(z, med)

        def _symbols(y, means_packed, parity):
            return quantize_symbols_i16(checkerboard.pack(y, parity), means_packed)

        @jax.jit
        def dec_stage1(z_sym, y):
            med = apply(model.eb_medians)
            z_hat = z_sym.astype(jnp.float32) + med
            lp = apply(model.hyper_synthesis, z_hat)
            sa, ma = apply(model.anchor_params, lp)
            sa_p = checkerboard.pack(sa, ANCHOR)
            ma_p = checkerboard.pack(ma, ANCHOR)
            a_idx = build_indexes(sa_p, table).astype(jnp.uint8)
            return lp, a_idx, ma_p, _symbols(y, ma_p, ANCHOR)

        @jax.jit
        def dec_stage2(lp, a_sym, ma_p, y):
            y_anchor_hat = checkerboard.unpack(
                a_sym.astype(ma_p.dtype) + ma_p, ANCHOR)
            sn, mn = apply(model.nonanchor_params, lp, y_anchor_hat)
            sn_p = checkerboard.pack(sn, NON_ANCHOR)
            mn_p = checkerboard.pack(mn, NON_ANCHOR)
            n_idx = build_indexes(sn_p, table).astype(jnp.uint8)
            return y_anchor_hat, n_idx, mn_p, _symbols(y, mn_p, NON_ANCHOR)

        clamp = self.clamp

        @jax.jit
        def dec_stage3(y_anchor_hat, n_sym, mn_p):
            y_nonanchor_hat = checkerboard.unpack(
                n_sym.astype(mn_p.dtype) + mn_p, NON_ANCHOR)
            x_hat = apply(model.synthesis, y_anchor_hat + y_nonanchor_hat)
            if clamp is not None:
                x_hat = jnp.clip(x_hat, clamp[0], clamp[1])
            return x_hat

        self._enc_analysis = enc_analysis
        self._dec_stage1, self._dec_stage2, self._dec_stage3 = (
            dec_stage1, dec_stage2, dec_stage3)

    # -- public API ----------------------------------------------------------

    def compress(self, x: jax.Array) -> Dict:
        self._require_tables()
        start = time.time()
        size = (int(x.shape[1]), int(x.shape[2]))
        x = pad_to_multiple(x, 64)  # 3 stride-2 stages + hyper /4 => /64
        y, z_sym = self._enc_analysis(x)
        return self._compress_from_latents(y, z_sym, size, start)

    def _compress_dispatch(self, x):
        """Async half of compress for the pipelined serving path
        (CodecBase.inference_stream): analysis + stages + encode scans +
        pull pack all enqueue without a host sync under the TPU coder.
        Host-coder codecs degrade to the eager base behavior in
        _compress_finish (their per-plane host rANS is inherently
        synchronous, though its dispatch already overlaps stages)."""
        self._require_tables()
        start = time.time()
        size = (int(x.shape[1]), int(x.shape[2]))
        x = pad_to_multiple(x, 64)
        y, z_sym = self._enc_analysis(x)
        if self.tpu_coder is None:
            return ("host", (y, z_sym, size, start))
        return ("tpu", (self._latents_dispatch_tpu(y, z_sym), size, start))

    def _compress_finish(self, state):
        kind, payload = state
        if kind == "host":
            y, z_sym, size, start = payload
            return self._compress_from_latents_host(y, z_sym, size, start)
        disp, size, start = payload
        return self._latents_finish_tpu(disp, size, start)

    def _compress_from_latents(self, y, z_sym, size, start, extra=None):
        if self.tpu_coder is not None:
            return self._compress_from_latents_tpu(y, z_sym, size, start, extra)
        if extra is not None:
            out = self._compress_from_latents_host(y, z_sym, size, start)
            return out, jax.device_get(extra)
        return self._compress_from_latents_host(y, z_sym, size, start)

    def _compress_from_latents_host(self, y, z_sym, size, start) -> Dict:
        # dispatch is async: the host rANS work for each plane overlaps the
        # device compute of the next stage
        lp, a_idx, ma_p, a_sym = self._dec_stage1(z_sym, y)
        z_strings = self._eb_encode(np.asarray(z_sym))      # overlaps stage1
        _, n_idx, mn_p, n_sym = self._dec_stage2(lp, a_sym, ma_p, y)
        anchor_strings = _encode_planes(np.asarray(a_sym), np.asarray(a_idx),
                                        self.gauss_tables)  # overlaps stage2
        nonanchor_strings = _encode_planes(np.asarray(n_sym), np.asarray(n_idx),
                                           self.gauss_tables)
        return {
            "strings": [[anchor_strings, nonanchor_strings], z_strings],
            "shape": (int(z_sym.shape[1]), int(z_sym.shape[2])),
            "size": size,
            "time": time.time() - start,
        }

    def _compress_from_latents_tpu(self, y, z_sym, size, start, extra=None):
        """Single- or two-phase-sync encode: the stage programs and all
        three rANS encode scans are enqueued back-to-back
        (device-to-device), then `pull_encs` downloads everything —
        B==1: ONE transfer of ONE full-cap u8 wire buffer; B>=2: a tiny
        size pull plus a bucket-sliced blob (see the two-phase notes).
        The caller's `extra` (HyRES's JPEG coefficients) rides the same
        pull either way.

        If ANY plane's escape side list or stream cap overflows
        (pathological stats, e.g. untrained models), the WHOLE batch
        re-frames with the host coder — formats are never mixed within a
        compressed payload (the decode path picks one choreography for
        the batch)."""
        return self._latents_finish_tpu(
            self._latents_dispatch_tpu(y, z_sym, extra), size, start, extra)

    def _latents_dispatch_tpu(self, y, z_sym, extra=None):
        """Async half of the TPU-coder encode: enqueue the stage programs,
        the three rANS encode scans, and the pull's pack program — no
        host sync. Returns an opaque state for _latents_finish_tpu.
        Pipelined callers (inference_stream) dispatch the NEXT image
        between the halves so this image's blob transfer + host framing
        overlap the next image's device compute."""
        tc = self.tpu_coder
        lp, a_idx, ma_p, a_sym = self._dec_stage1(z_sym, y)
        _, n_idx, mn_p, n_sym = self._dec_stage2(lp, a_sym, ma_p, y)
        enc_z, enc_a, enc_n = tc.encode_all(z_sym, a_sym, a_idx, n_sym, n_idx)
        finish_pull = pull_encs_dispatch(
            (enc_z, enc_a, enc_n), extra,
            cap_state=self.__dict__.setdefault("_enc_cap_state", {}))
        return (finish_pull, z_sym, a_sym, a_idx, n_sym, n_idx)

    def _latents_finish_tpu(self, disp, size, start, extra=None):
        finish_pull, z_sym, a_sym, a_idx, n_sym, n_idx = disp
        tc = self.tpu_coder
        try:
            (enc_z, enc_a, enc_n), extra_np = finish_pull()
            z_strings = tc.frames_from_enc(enc_z)
            anchor_strings = tc.frames_from_enc(enc_a)
            nonanchor_strings = tc.frames_from_enc(enc_n)
        except OverflowError as e:
            count_host_fallback(e)
            extra_np = None if extra is None else np.asarray(
                jax.device_get(extra))
            z_strings = self._eb_encode(np.asarray(z_sym))
            anchor_strings = _encode_planes(
                np.asarray(a_sym), np.asarray(a_idx), self.gauss_tables)
            nonanchor_strings = _encode_planes(
                np.asarray(n_sym), np.asarray(n_idx), self.gauss_tables)
        out = {
            "strings": [[anchor_strings, nonanchor_strings], z_strings],
            "shape": (int(z_sym.shape[1]), int(z_sym.shape[2])),
            "size": size,
            "time": time.time() - start,
        }
        return out if extra is None else (out, extra_np)

    def decompress(self, strings, shape: Tuple[int, int],
                   size: Tuple[int, int] | None = None) -> Dict:
        x_hat, start = self._decompress_dispatch(strings, shape, size)
        x_hat.block_until_ready()
        return {"x_hat": x_hat, "time": time.time() - start}

    def _decompress_dispatch(self, strings, shape, size=None):
        """Async half of decompress: host unframe + ONE upload + the
        all-device decode chain, returned WITHOUT the final sync (the
        TPU-coder chain is fully async; the host-coder path still syncs
        per stage inside _decode_latent_stages)."""
        self._require_tables()
        start = time.time()
        stages = self._decode_latent_stages(strings, shape)
        x_hat = self._dec_stage3(*stages)
        if size is not None:
            x_hat = x_hat[:, : size[0], : size[1], :]
        return x_hat, start

    def _decode_latent_stages(self, strings, shape, extra_bytes=None):
        """Shared decode choreography up to (y_anchor_hat, n_sym, mn_p).

        extra_bytes: optional (B, k) numpy byte payload the caller wants
        on device (HyRES's JPEG coefficients) — it rides the coder's
        single upload. When given, the return is a 4-tuple with the
        device-side u8 slice appended."""
        tpu = (self._decode_latent_stages_tpu(strings, shape, extra_bytes)
               if self.tpu_coder is not None else None)
        if tpu is not None:
            return tpu
        if strings[1] and tpu_rans.is_tpu_frame(strings[1][0]):
            raise ValueError(
                "payload is TPU-coder framed but this codec decodes with "
                "the host coder; construct the codec with coder='tpu'")
        B = len(strings[1])
        z_sym = narrow_symbols_i16(self._eb_decode(strings[1], shape))
        y_zero = jnp.zeros((B, shape[0] * 4, shape[1] * 4, self.model.M),
                           jnp.float32)
        lp, a_idx, ma_p, _ = self._dec_stage1(jnp.asarray(z_sym), y_zero)
        a_sym = narrow_symbols_i16(_decode_planes(
            strings[0][0], np.asarray(a_idx), self.gauss_tables))
        y_anchor_hat, n_idx, mn_p, _ = self._dec_stage2(
            lp, jnp.asarray(a_sym), ma_p, y_zero)
        n_sym = narrow_symbols_i16(_decode_planes(
            strings[0][1], np.asarray(n_idx), self.gauss_tables))
        if extra_bytes is not None:
            return (y_anchor_hat, jnp.asarray(n_sym), mn_p,
                    jnp.asarray(extra_bytes))
        return y_anchor_hat, jnp.asarray(n_sym), mn_p

    def _decode_latent_stages_tpu(self, strings, shape, extra_bytes=None):
        """All-device decode chain: rANS scans between the SAME stage
        programs the encoder used; no host sync until the caller pulls
        x_hat. Returns None if any plane is host-coder framed."""
        tc = self.tpu_coder
        B = len(strings[1])
        C = self.eb_tables.cdf_length.shape[0]
        zshape = (B, shape[0], shape[1], C)
        n_z = int(np.prod(zshape[1:]))
        n_y = shape[0] * 4 * shape[1] * 2 * self.model.M  # packed half-width
        uz = TpuPlaneCoder.unframe_batch(strings[1], n_z)
        ua = TpuPlaneCoder.unframe_batch(strings[0][0], n_y)
        un = TpuPlaneCoder.unframe_batch(strings[0][1], n_y)
        if uz is None or ua is None or un is None:
            return None
        # ONE upload for everything (streams, states, escape lists, plus
        # the caller's extra bytes): tunnel latency is per array
        (ua, un, uz), d_extra = upload_frames((ua, un, uz), extra_bytes)
        z_sym = tc.decode_eb(uz[2], uz[1], uz[3], uz[4], zshape, uz[0])
        y_zero = jnp.zeros((B, shape[0] * 4, shape[1] * 4, self.model.M),
                           jnp.float32)
        lp, a_idx, ma_p, _ = self._dec_stage1(z_sym, y_zero)
        a_sym = tc.decode_gauss(ua[2], ua[1], a_idx, ua[3], ua[4], ua[0])
        y_anchor_hat, n_idx, mn_p, _ = self._dec_stage2(lp, a_sym, ma_p, y_zero)
        n_sym = tc.decode_gauss(un[2], un[1], n_idx, un[3], un[4], un[0])
        if extra_bytes is not None:
            return y_anchor_hat, n_sym, mn_p, d_extra
        return y_anchor_hat, n_sym, mn_p
