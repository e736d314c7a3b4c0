"""TPU-side lane-parallel rANS coder (pure JAX, runs inside jit).

The host C++ coder (coding/csrc/rans.cpp) forces a device->host->device
round-trip between every stage of the checkerboard decode; over the TPU
dispatch tunnel those syncs dominate end-to-end latency (RESULTS r1).
This module moves BOTH directions of the entropy coder onto the TPU so
the entire decode chain (z -> hyper params -> anchor -> context ->
non-anchor -> synthesis) is one async chain of device programs with a
single host sync at the end — the round-1 "north-star lever"
(SURVEY §2.3 stretch goal; reference contract being replaced:
/root/reference/models/checkerboard.py:167-259, whose CompressAI coder
is inherently host-side).

Construction: interleaved multi-lane rANS (the public ryg/Duda
construction, vectorized across lanes instead of SIMD registers):

* 32-bit state per lane in [2^16, 2^32), 16-bit renormalization chunks,
  16-bit quantized CDFs — IDENTICAL tables to the host coder, so the
  rate matches CompressAI's per-symbol cost.
* one shared renorm stream: at each step the lanes that renormalize
  read/write in lane order; the decoder recovers each lane's offsets
  with an exclusive prefix-sum over the renorm mask (the vectorized
  version of interleaved-rANS stream sharing).
* symbols are laid out (T, lanes) with flat index i -> (i // lanes,
  i % lanes); the tail is padded with a high-probability pad symbol.
* per-lane decode is a lax.scan; all per-step math is exact uint32.
* escapes: instead of the host coder's in-band 4-bit bypass chunks
  (awkward for lockstep lanes), out-of-support symbols encode the CDF
  row's escape bin in-stream and carry their raw value in a tiny side
  list ((position, value) pairs, capped; overflow falls back to the
  host coder). Symbol lookup is O(1) via a 65536-entry slot LUT per CDF
  row, resident in HBM.

Stream framing (`frame_plane`/`unframe_plane`):
  [u8 lanes_log2][u8 n_esc][u32 n_renorm]
  [lanes * u32 final states][n_renorm * u16][n_esc * (u32 pos, i16 val)]
The per-lane state flush is the real rate overhead of lane-parallelism
(~2 net bytes/lane); `lanes` trades that against scan depth.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

RENORM_BASE = np.uint32(1 << 16)
ESCAPE_MARK = np.int32(1 << 20)
ESC_MAX = 256          # side-list capacity; more escapes -> host fallback
DEFAULT_LANES = 256
Z_LANES = 64


class TpuCoderTables(NamedTuple):
    """Device-resident coding tables for one CdfTables set."""

    lut_entry: jax.Array   # (rows * 65536,) u32: freq << 16 | start
    lut_sym: jax.Array     # (rows * 65536,) i32: value, or ESCAPE_MARK
    cdf: jax.Array         # (rows, maxL) i32 (encode side)
    cdf_length: jax.Array  # (rows,) i32
    offset: jax.Array      # (rows,) i32
    pad_symbol: int        # host: most probable value of row 0


def build_device_tables(t) -> TpuCoderTables:
    """CdfTables (host numpy, from entropy.build_*_tables) -> device LUTs."""
    cdf = np.asarray(t.quantized_cdf, np.int64)
    lengths = np.asarray(t.cdf_length, np.int64)
    offsets = np.asarray(t.offset, np.int64)
    rows = cdf.shape[0]
    slots = np.arange(1 << 16, dtype=np.int64)
    lut_entry = np.empty((rows, 1 << 16), np.uint32)
    lut_sym = np.empty((rows, 1 << 16), np.int32)
    for r in range(rows):
        bounds = cdf[r, : lengths[r]]          # bounds[0]=0 .. bounds[-1]=2^16
        maxv = lengths[r] - 2                  # escape bin index
        s = np.searchsorted(bounds, slots, side="right") - 1
        start = bounds[s]
        freq = bounds[s + 1] - start
        lut_entry[r] = ((freq.astype(np.uint32)) << 16) | start.astype(np.uint32)
        val = (s + offsets[r]).astype(np.int32)
        val[s == maxv] = ESCAPE_MARK
        lut_sym[r] = val
    freqs0 = np.diff(cdf[0, : lengths[0]])
    pad_symbol = int(np.argmax(freqs0[:-1]) + offsets[0])  # skip escape bin
    return TpuCoderTables(
        lut_entry=jnp.asarray(lut_entry.reshape(-1)),
        lut_sym=jnp.asarray(lut_sym.reshape(-1)),
        cdf=jnp.asarray(t.quantized_cdf, jnp.int32),
        cdf_length=jnp.asarray(t.cdf_length, jnp.int32),
        offset=jnp.asarray(t.offset, jnp.int32),
        pad_symbol=pad_symbol,
    )


def lanes_for(n: int) -> int:
    """Lane count for an n-symbol plane: enough parallelism to keep the
    scan short, few enough that the 4 B/lane state flush stays ~1% of a
    typical plane's payload."""
    lanes = 32
    while lanes < 128 and n >= lanes * 4096:
        lanes *= 2
    return lanes


def plane_geometry(n: int, lanes: int) -> Tuple[int, int, int]:
    """(T, padded_n, n_max renorm entries) for an n-symbol plane."""
    T = -(-n // lanes)
    return T, T * lanes, T * lanes  # worst case: <=1 renorm u16 per symbol


def _to_tl(flat: jax.Array, T: int, lanes: int, pad_value) -> jax.Array:
    n = flat.shape[0]
    flat = jnp.pad(flat, (0, T * lanes - n), constant_values=pad_value)
    return flat.reshape(T, lanes)


# ---------------------------------------------------------------------------
# encode (reverse scan) — traceable, call inside jit
# ---------------------------------------------------------------------------


def rans_encode(symbols: jax.Array, indexes: jax.Array,
                tables: TpuCoderTables, lanes: int):
    """Encode a flat (n,) int32 symbol plane against (n,) int32 CDF rows.

    Returns dict of device arrays:
      states (lanes,) u32, emit (T*lanes,) u16 COMPACTED renorm stream,
      n_renorm scalar i32, esc_pos (ESC_MAX,) i32 (= T*lanes pad),
      esc_val (ESC_MAX,) i32, n_esc scalar i32.
    """
    n = symbols.shape[0]
    T, padded, _ = plane_geometry(n, lanes)
    sym_tl = _to_tl(symbols.astype(jnp.int32), T, lanes, tables.pad_symbol)
    idx_tl = _to_tl(indexes.astype(jnp.int32), T, lanes, 0)

    max_len = tables.cdf.shape[1]

    def step(state, xs):
        sym, idx = xs
        off = tables.offset[idx]
        maxv = tables.cdf_length[idx] - 2
        v = sym - off
        esc = (v < 0) | (v >= maxv)
        vv = jnp.where(esc, maxv, v)
        flat_idx = idx * max_len + vv
        start = jnp.take(tables.cdf.reshape(-1), flat_idx).astype(jnp.uint32)
        end = jnp.take(tables.cdf.reshape(-1), flat_idx + 1).astype(jnp.uint32)
        freq = end - start
        # renorm: emit low 16 bits when the encode step would overflow
        need = state >= (freq << 16)
        emit = (state & 0xFFFF).astype(jnp.uint16)
        state = jnp.where(need, state >> 16, state)
        # exact u32 rANS push
        q = state // freq
        r = state - q * freq
        state = (q << 16) + r + start
        return state, (emit, need, esc)

    init = jnp.full((lanes,), RENORM_BASE, jnp.uint32)
    states, (emit_tl, mask_tl, esc_tl) = jax.lax.scan(
        step, init, (sym_tl, idx_tl), reverse=True)

    # compact the renorm stream in decoder read order (step asc, lane asc)
    mask_flat = mask_tl.reshape(-1)
    emit_flat = emit_tl.reshape(-1)
    pos = jnp.cumsum(mask_flat) - 1
    n_renorm = jnp.sum(mask_flat).astype(jnp.int32)
    stream = jnp.zeros((padded,), jnp.uint16).at[
        jnp.where(mask_flat, pos, padded)].set(emit_flat, mode="drop")

    # escape side list (flat positions in the padded (T*lanes) layout)
    esc_flat = esc_tl.reshape(-1)
    (esc_pos,) = jnp.nonzero(esc_flat, size=ESC_MAX, fill_value=padded)
    esc_val = jnp.take(sym_tl.reshape(-1), esc_pos, mode="clip")
    n_esc = jnp.sum(esc_flat).astype(jnp.int32)

    return {"states": states, "stream": stream, "n_renorm": n_renorm,
            "esc_pos": esc_pos.astype(jnp.int32), "esc_val": esc_val,
            "n_esc": n_esc}


# ---------------------------------------------------------------------------
# decode (forward scan) — traceable, call inside jit
# ---------------------------------------------------------------------------


def rans_decode(stream: jax.Array, states: jax.Array, indexes: jax.Array,
                esc_pos: jax.Array, esc_val: jax.Array,
                tables: TpuCoderTables, lanes: int, n: int) -> jax.Array:
    """Decode a flat (n,) int32 symbol plane.

    stream: (T*lanes,) u16 padded renorm stream; states: (lanes,) u32;
    indexes: (n,) int32 CDF row per symbol; esc_pos/esc_val: escape side
    list ((ESC_MAX,) i32, pad pos >= T*lanes).
    """
    T, padded, _ = plane_geometry(n, lanes)
    idx_tl = _to_tl(indexes.astype(jnp.int32), T, lanes, 0)

    def step(carry, idx):
        state, ptr = carry
        slot = state & 0xFFFF
        flat = (idx.astype(jnp.uint32) << 16) | slot
        entry = jnp.take(tables.lut_entry, flat)
        sym = jnp.take(tables.lut_sym, flat)
        freq = entry >> 16
        start = entry & 0xFFFF
        state = freq * (state >> 16) + slot - start
        # shared-stream renorm: lanes read in lane order
        need = (state < RENORM_BASE).astype(jnp.uint32)
        rank = jnp.cumsum(need) - need            # exclusive prefix
        read = jnp.take(stream, ptr + rank, mode="clip").astype(jnp.uint32)
        state = jnp.where(need > 0, (state << 16) | read, state)
        ptr = ptr + jnp.sum(need)
        return (state, ptr), sym

    init = (states.astype(jnp.uint32), jnp.uint32(0))
    _, sym_tl = jax.lax.scan(step, init, idx_tl)

    sym_flat = sym_tl.reshape(-1)
    # substitute escaped values (side list; padding positions drop)
    sym_flat = sym_flat.at[esc_pos].set(esc_val, mode="drop")
    return sym_flat[:n]


# ---------------------------------------------------------------------------
# host framing
# ---------------------------------------------------------------------------


TPU_MAGIC = 0x80  # first byte 0x80|lanes_log2 distinguishes TPU-coder
                  # frames from the host coder's chunked framing (whose
                  # first byte is a chunk count <= 8)


def is_tpu_frame(data: bytes) -> bool:
    return len(data) > 0 and data[0] >= TPU_MAGIC


def frame_plane(states: np.ndarray, stream: np.ndarray, n_renorm: int,
                esc_pos: np.ndarray, esc_val: np.ndarray, n_esc: int) -> bytes:
    """Assemble one plane's bytes from downloaded encoder outputs."""
    lanes = states.shape[0]
    lanes_log2 = int(lanes).bit_length() - 1
    assert 1 << lanes_log2 == lanes
    if n_esc > ESC_MAX:
        raise OverflowError(f"{n_esc} escapes exceed side-list cap {ESC_MAX}")
    head = (bytes([TPU_MAGIC | lanes_log2, int(n_esc)])
            + int(n_renorm).to_bytes(4, "little"))
    body = (np.asarray(states, "<u4").tobytes()
            + np.asarray(stream[:n_renorm], "<u2").tobytes())
    esc = b"".join(
        int(esc_pos[i]).to_bytes(4, "little")
        + (int(esc_val[i]) & 0xFFFF).to_bytes(2, "little")
        for i in range(int(n_esc)))
    return head + body + esc


def unframe_plane(data: bytes, n: int):
    """bytes -> (lanes, states u32, padded stream u16, esc_pos, esc_val)."""
    lanes = 1 << (data[0] & 0x7F)
    n_esc = data[1]
    n_renorm = int.from_bytes(data[2:6], "little")
    off = 6
    states = np.frombuffer(data, "<u4", lanes, off).copy()
    off += 4 * lanes
    T, padded, _ = plane_geometry(n, lanes)
    stream = np.zeros(padded, np.uint16)
    stream[:n_renorm] = np.frombuffer(data, "<u2", n_renorm, off)
    off += 2 * n_renorm
    esc_pos = np.full(ESC_MAX, padded, np.int32)
    esc_val = np.zeros(ESC_MAX, np.int32)
    for i in range(n_esc):
        esc_pos[i] = int.from_bytes(data[off:off + 4], "little")
        esc_val[i] = np.frombuffer(data, "<i2", 1, off + 4)[0]
        off += 6
    return lanes, states, stream, esc_pos, esc_val
