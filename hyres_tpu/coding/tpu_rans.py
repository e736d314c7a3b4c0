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

import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

RENORM_BASE = np.uint32(1 << 16)
# scan bodies are a few hundred cheap VPU ops; the serial chain's floor
# is the per-iteration while-loop overhead, so unrolling several symbols
# per iteration amortizes it without changing any math (same jaxpr per
# step, bit-identical outputs)
SCAN_UNROLL = 8
ESC_MAX = 256          # side-list capacity; more escapes -> host fallback
DEFAULT_LANES = 256
Z_LANES = 64


class TpuCoderTables(NamedTuple):
    """Device-resident coding tables for one CdfTables set.

    TPU gathers are ~25 ns/element (scalarized) even in bulk, so every
    PER-SYMBOL table access outside the serial scan uses exact one-hot
    f32 matmuls over these small row tables instead (a single-nonzero
    one-hot row sums exactly one product — exact for any value < 2^24).
    Only the state-dependent in-scan lookup keeps the 65536-slot LUT.
    """

    lut_entry: jax.Array   # (rows * 65536,) u32: freq << 16 | (slot - start)
    cdf_f32: jax.Array     # (rows, maxL+1) f32 CDF bounds, 2^17 pad
    off_f32: jax.Array     # (rows,) f32 offset
    maxv_f32: jax.Array    # (rows,) f32 escape bin index (length - 2)
    start_f32: jax.Array   # (rows, maxL) f32 bin starts
    freq_f32: jax.Array    # (rows, maxL) f32 bin freqs (0 past the end)
    cdf: jax.Array         # (rows, maxL) i32 (host-format reference)
    cdf_length: jax.Array  # (rows,) i32
    offset: jax.Array      # (rows,) i32
    pad_symbol: int        # host: most probable value of row 0


def build_device_tables(t) -> TpuCoderTables:
    """CdfTables (host numpy, from entropy.build_*_tables) -> device LUTs.

    lut_entry[row, slot] = freq << 16 | (slot - start): everything the
    decode state update needs in ONE gather (the update is
    ``state = freq * (state >> 16) + (slot - start)``, and slot - start
    is a function of the slot, so it can live in the LUT). Symbols are
    recovered OUTSIDE the scan, gather-free, by counting CDF bounds —
    the serial chain carries no symbol work.
    """
    cdf = np.asarray(t.quantized_cdf, np.int64)
    lengths = np.asarray(t.cdf_length, np.int64)
    offsets = np.asarray(t.offset, np.int64)
    rows = cdf.shape[0]
    slots = np.arange(1 << 16, dtype=np.int64)
    lut_entry = np.empty((rows, 1 << 16), np.uint32)
    for r in range(rows):
        bounds = cdf[r, : lengths[r]]          # bounds[0]=0 .. bounds[-1]=2^16
        s = np.searchsorted(bounds, slots, side="right") - 1
        start = bounds[s]
        freq = bounds[s + 1] - start
        assert freq.max() <= 0xFFFF, "degenerate full-range CDF bin"
        lut_entry[r] = ((freq.astype(np.uint32)) << 16) | (
            (slots - start).astype(np.uint32))
    freqs0 = np.diff(cdf[0, : lengths[0]])
    pad_symbol = int(np.argmax(freqs0[:-1]) + offsets[0])  # skip escape bin
    max_len = cdf.shape[1]
    start_f32 = np.zeros((rows, max_len), np.float32)
    freq_f32 = np.zeros((rows, max_len), np.float32)
    cdf_f32 = np.full((rows, max_len + 1), float(1 << 17), np.float32)
    for r in range(rows):
        nbins = lengths[r] - 1
        start_f32[r, :nbins] = cdf[r, :nbins]
        freq_f32[r, :nbins] = np.diff(cdf[r, : lengths[r]])
        cdf_f32[r, : lengths[r]] = cdf[r, : lengths[r]]
    return TpuCoderTables(
        lut_entry=jnp.asarray(lut_entry.reshape(-1)),
        cdf_f32=jnp.asarray(cdf_f32),
        off_f32=jnp.asarray(offsets.astype(np.float32)),
        maxv_f32=jnp.asarray((lengths - 2).astype(np.float32)),
        start_f32=jnp.asarray(start_f32),
        freq_f32=jnp.asarray(freq_f32),
        cdf=jnp.asarray(t.quantized_cdf, jnp.int32),
        cdf_length=jnp.asarray(t.cdf_length, jnp.int32),
        offset=jnp.asarray(t.offset, jnp.int32),
        pad_symbol=pad_symbol,
    )


def _row_onehot(idx: jax.Array, rows: int) -> jax.Array:
    """(n,) int32 -> (n, rows) f32 one-hot (feeds exact MXU matmuls)."""
    return (idx[:, None] == jnp.arange(rows, dtype=idx.dtype)).astype(
        jnp.float32)


def _lookup(A: jax.Array, table: jax.Array) -> jax.Array:
    """Exact one-hot lookup matmul.

    MUST run at Precision.HIGHEST: TPU f32 matmuls default to single-pass
    bf16, which rounds table values > 2^8 — the CPU-exact one-hot trick
    silently corrupts on the MXU otherwise (caught as a mass host-coder
    fallback: every symbol 'escaped')."""
    return jnp.matmul(A, table, precision=jax.lax.Precision.HIGHEST)


def _div_u32_by_u16(state: jax.Array, freq: jax.Array,
                    rcp: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Exact (floor(state / freq), state % freq) for u32 state, u16 freq.

    TPU VPUs have no integer divide — XLA lowers ``//`` to a long
    serial sequence (~5 us/step measured inside a scan). Long division
    in four 8-bit limbs instead: each round's partial remainder is
    < freq * 256 <= 2^24, exactly representable in f32, so one f32
    reciprocal multiply + a +/-2 correction gives the exact limb
    quotient. ~40 cheap vector ops, no data-dependent latency.
    rcp = 1.0 / freq (f32), precomputed outside the serial chain.
    """
    q = jnp.zeros_like(state)
    r = jnp.zeros_like(state)
    for shift in (24, 16, 8, 0):
        acc = (r << 8) | ((state >> shift) & 0xFF)
        qi = (acc.astype(jnp.float32) * rcp).astype(jnp.uint32)
        # correction: f32 estimate is within +/-2 of the exact quotient
        for _ in range(2):
            over = qi * freq > acc
            qi = qi - over.astype(jnp.uint32)
        ri = acc - qi * freq
        for _ in range(2):
            under = ri >= freq
            qi = qi + under.astype(jnp.uint32)
            ri = ri - jnp.where(under, freq, jnp.zeros_like(freq))
        q = (q << 8) | qi
        r = ri
    return q, r


def _prefix_matrix(lanes: int) -> jax.Array:
    """Exclusive prefix-sum over the lane renorm mask as an f32 matvec:
    one MXU pass (~us) instead of XLA's serial cumsum lowering
    (~7 us/step measured). Exact: counts <= lanes << 2^24. Last column
    accumulates the total for the stream-pointer bump."""
    prefix = np.zeros((lanes, lanes + 1), np.float32)
    for i in range(lanes):
        prefix[i, i + 1:] = 1.0  # strictly-upper: rank[j] = sum_{i<j} need[i]
    prefix[:, lanes] = 1.0
    return jnp.asarray(prefix)


# Renorm stream reads are CONSECUTIVE: the lanes that renorm on a given
# step read stream[ptr], stream[ptr+1], ... in lane order. A per-step
# jnp.take from the full stream scalarizes on TPU (~25 ns/element ->
# ~6.4 us per 256-lane step — the decode latency floor). Default mode
# "slice" instead does ONE contiguous dynamic slice of `lanes` u16s at
# ptr (a single small DMA) and routes win[rank] to each lane with an
# exact one-hot matvec (values < 2^16, exact in f32 at HIGHEST).
# Mode "shift" replaces that matvec with a log2(lanes)-round butterfly
# select-gather (pure VPU — no MXU op on the scan's critical path; see
# _route_monotone for the exactness argument).
# HYRES_STREAM_READ=gather restores the old lowering for A/B timing.
STREAM_READ = os.environ.get("HYRES_STREAM_READ", "slice")

# Exclusive prefix-sum over the lane renorm mask: "matmul" (default) is
# one (lanes, lanes+1) f32 matvec on the MXU; "ladder" is a Hillis-Steele
# shift-add inclusive scan (log2(lanes) VPU rounds) — exact for the same
# reason (counts <= lanes << 2^24 in f32). A/B knob for the scan-step
# latency: a small matmul inside a serial scan pays MXU issue latency
# every step, the ladder stays on the VPU.
PREFIX_MODE = os.environ.get("HYRES_PREFIX", "matmul")

# Stream/escape compaction inside the encode program: "nonzero" uses
# jnp.nonzero (XLA:TPU lowers it as a serialized ~9 ns/element custom
# fusion — the captured round-3 profile shows 4x 5.15 ms of it per
# single-image encode, the encode device-time floor); "merge" uses
# masked_compact below (dense merge-tree, no gather/scatter/sort).
COMPACT_MODE = os.environ.get("HYRES_COMPACT", "nonzero")


def _pad_stream(stream: jax.Array, lanes: int) -> jax.Array:
    """Pad so the in-scan dynamic slice never clamps (ptr <= len)."""
    return jnp.concatenate(
        [stream, jnp.zeros((lanes,), stream.dtype)])


def _rank_total(need_f: jax.Array, prefix_m: jax.Array,
                lanes: int) -> Tuple[jax.Array, jax.Array]:
    """need_f (lanes,) f32 0/1 -> (exclusive rank (lanes,) f32, total f32).

    PREFIX_MODE selects the lowering; both are exact in f32 (integer
    counts <= lanes)."""
    if PREFIX_MODE == "ladder":
        incl = need_f
        d = 1
        while d < lanes:
            incl = incl + jnp.concatenate(
                [jnp.zeros((d,), incl.dtype), incl[:-d]])
            d *= 2
        return incl - need_f, incl[lanes - 1]
    rankx = jnp.matmul(need_f, prefix_m,
                       precision=jax.lax.Precision.HIGHEST)
    return rankx[:lanes], rankx[lanes]


def _route_monotone(win: jax.Array, rank_f: jax.Array,
                    lanes: int) -> jax.Array:
    """out[j] = win[rank_j] for a MONOTONE rank (exclusive prefix of a
    0/1 mask: rank_{j+1} - rank_j in {0,1}, rank_j <= j), as a
    log2(lanes)-round butterfly select-gather — pure VPU, no MXU.

    Exactness: with d_j = j - rank_j (nondecreasing, unit steps), apply
    displacement bits MSB->LSB: x_j <- x_{j-2^b} iff bit b of d_j. The
    induction needs hi-bits(d_{j-2^b}) == hi-bits(d_j) whenever bit b of
    d_j is set, which holds because d_{j-2^b} lies in [d_j - 2^b, d_j]
    and that whole interval shares the same bits above b. Lanes with
    j < 2^b never have bit b set (d_j <= j), so the shift's zero-fill is
    never selected. Guarded bit-exact vs the one-hot matvec in
    tests/test_tpu_rans.py."""
    d = jnp.arange(lanes, dtype=jnp.float32) - rank_f
    x = win.astype(jnp.float32)
    b = 1 << (lanes.bit_length() - 2) if lanes > 1 else 0  # highest bit < lanes
    while b >= 1:
        shifted = jnp.concatenate([jnp.zeros((b,), x.dtype), x[:-b]])
        take = jnp.floor(d / b) % 2.0 >= 1.0
        x = jnp.where(take, shifted, x)
        b >>= 1
    return x.astype(jnp.uint32)


def _stream_read(stream_pad: jax.Array, ptr: jax.Array, rank_f: jax.Array,
                 lanes: int) -> jax.Array:
    """(lanes,) u32 renorm reads at stream_pad[ptr + rank] (masked lanes
    read arbitrary in-bounds data; callers mask by `need`)."""
    if STREAM_READ == "gather":
        rank = rank_f.astype(jnp.uint32)
        return jnp.take(stream_pad, ptr + rank, mode="clip").astype(
            jnp.uint32)
    win = jax.lax.dynamic_slice_in_dim(
        stream_pad, ptr.astype(jnp.int32), lanes)
    if STREAM_READ == "shift":
        return _route_monotone(win, rank_f, lanes)
    oh = (rank_f[:, None] == jnp.arange(lanes, dtype=jnp.float32)[None, :]
          ).astype(jnp.float32)
    return jnp.matmul(oh, win.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST).astype(jnp.uint32)


def lanes_for(n: int) -> int:
    """Lane count for an n-symbol plane: enough parallelism to keep the
    scan short, few enough that the ~2 net B/lane state flush stays ~1%
    of a typical plane's payload (the scan's serial latency is what the
    decode critical path pays, ~7 us/step)."""
    lanes = 32
    while lanes < 256 and n >= lanes * 1024:
        lanes *= 2
    return lanes


def plane_geometry(n: int, lanes: int) -> Tuple[int, int, int]:
    """(T, padded_n, n_max renorm entries) for an n-symbol plane."""
    T = -(-n // lanes)
    return T, T * lanes, T * lanes  # worst case: <=1 renorm u16 per symbol


def stream_cap(n: int, lanes: int) -> int:
    """Renorm-stream buffer entries.

    Large planes get an average-4-bits/symbol buffer (trained-stat
    planes run 2-3 bits/symbol; overflow at framing time falls back to
    the host coder like escape-list overflow) — this cuts the
    device->host stream transfer 4x. Small planes (<= 64k symbols, e.g.
    hyper-latents) keep the full worst-case buffer: their transfer is
    trivial and undertrained hyper stats can legitimately need
    >4 bits/symbol."""
    _, padded, _ = plane_geometry(n, lanes)
    if n <= 65536:
        return padded
    return max(4096, padded // 4)


def _barrel_shift_right(x: jax.Array, c: jax.Array, maxshift: int) -> jax.Array:
    """Per-row right-shift of the last axis by c in [0, maxshift], zero
    fill. x (..., W), c (...,) i32. log2(maxshift)+1 select rounds."""
    k = 0
    while (1 << k) <= maxshift:
        s = 1 << k
        shifted = jnp.concatenate(
            [jnp.zeros_like(x[..., :s]), x[..., :-s]], axis=-1)
        bit = ((c >> k) & 1)[..., None] > 0
        x = jnp.where(bit, shifted, x)
        k += 1
    return x


def masked_compact(vals: jax.Array, mask: jax.Array, cap: int,
                   fill=0) -> Tuple[jax.Array, jax.Array]:
    """Stable compaction: vals at mask-set positions moved to the front.

    Returns ((cap,) vals with `fill` past the count, count i32). Pure
    dense work — a merge tree of barrel-shift merges (log2(n) levels;
    level merging width-W rows costs n * (log2(W)+1) selects), no
    gather/scatter/sort anywhere, so XLA:TPU keeps it on the VPU instead
    of the serialized nonzero custom fusion. Exact for any dtype (the
    shifts/selects copy values bit-for-bit).
    """
    n = vals.shape[0]
    npad = 1 << max(1, (n - 1).bit_length())
    m = jnp.pad(mask.astype(jnp.int32), (0, npad - n))
    v = jnp.pad(vals, (0, npad - n))
    v = jnp.where(m > 0, v, jnp.zeros_like(v))  # invariant: junk is 0
    v = v[:, None]           # (rows, W) with W=1
    c = m                    # width-1 rows: count = mask
    W = 1
    while W < npad:
        a, b = v[0::2], v[1::2]
        ca, cb = c[0::2], c[1::2]
        z = jnp.zeros_like(a)
        A2 = jnp.concatenate([a, z], axis=-1)
        B2 = jnp.concatenate([b, z], axis=-1)
        B2 = _barrel_shift_right(B2, ca, W)
        keep_a = jnp.arange(2 * W, dtype=jnp.int32)[None, :] < ca[:, None]
        v = jnp.where(keep_a, A2, B2)
        c = ca + cb
        W *= 2
    out = v[0]
    count = c[0]
    if cap <= npad:
        out = out[:cap]
    else:
        out = jnp.pad(out, (0, cap - npad))
    idx = jnp.arange(cap, dtype=jnp.int32)
    out = jnp.where(idx < count, out,
                    jnp.full((cap,), fill, vals.dtype))
    return out, count


def _to_tl(flat: jax.Array, T: int, lanes: int, pad_value) -> jax.Array:
    n = flat.shape[0]
    flat = jnp.pad(flat, (0, T * lanes - n), constant_values=pad_value)
    return flat.reshape(T, lanes)


# ---------------------------------------------------------------------------
# encode (reverse scan) — traceable, call inside jit
# ---------------------------------------------------------------------------


def _encode_scan_core(sym_tl: jax.Array, start: jax.Array, freq_f: jax.Array,
                      esc_tl: jax.Array, lanes: int, n: int):
    """Shared reverse encode scan + stream compaction.

    sym_tl (T, lanes) i32, start (T, lanes) u32, freq_f (T, lanes) f32
    (integer-valued), esc_tl (T, lanes) bool. The scan body is pure
    arithmetic: every per-symbol quantity is precomputed (CDF entries
    depend only on symbol and row, never on the rANS state)."""
    T = sym_tl.shape[0]
    padded = T * lanes
    freq = freq_f.astype(jnp.uint32)
    rcp = 1.0 / freq_f

    def step(state, xs):
        start, freq, rcp = xs
        # renorm: emit low 16 bits when the encode step would overflow
        need = state >= (freq << 16)
        emit = (state & 0xFFFF).astype(jnp.uint16)
        state = jnp.where(need, state >> 16, state)
        # exact u32 rANS push (limb division, see _div_u32_by_u16)
        q, r = _div_u32_by_u16(state, freq, rcp)
        state = (q << 16) + r + start
        return state, (emit, need)

    init = jnp.full((lanes,), RENORM_BASE, jnp.uint32)
    states, (emit_tl, mask_tl) = jax.lax.scan(
        step, init, (start, freq, rcp), reverse=True, unroll=SCAN_UNROLL)

    # compact the renorm stream in decoder read order (step asc, lane asc)
    # into a capped buffer (overflow detected at framing time)
    mask_flat = mask_tl.reshape(-1)
    emit_flat = emit_tl.reshape(-1)
    cap = stream_cap(n, lanes)
    esc_flat = esc_tl.reshape(-1)
    if COMPACT_MODE == "merge":
        stream, n_renorm = masked_compact(emit_flat, mask_flat, cap)
        iota = jnp.arange(padded, dtype=jnp.int32)
        esc_pos, n_esc = masked_compact(iota, esc_flat, ESC_MAX, fill=padded)
        esc_val, _ = masked_compact(
            sym_tl.reshape(-1), esc_flat, ESC_MAX)
    else:
        (pos,) = jnp.nonzero(mask_flat, size=cap, fill_value=padded)
        stream = jnp.take(emit_flat, pos, mode="fill", fill_value=0)
        n_renorm = jnp.sum(mask_flat).astype(jnp.int32)
        # escape side list (flat positions in the padded (T*lanes) layout)
        (esc_pos,) = jnp.nonzero(esc_flat, size=ESC_MAX, fill_value=padded)
        esc_val = jnp.take(sym_tl.reshape(-1), esc_pos, mode="clip")
        n_esc = jnp.sum(esc_flat).astype(jnp.int32)

    return {"states": states, "stream": stream, "n_renorm": n_renorm,
            "esc_pos": esc_pos.astype(jnp.int32), "esc_val": esc_val,
            "n_esc": n_esc}


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
    rows = tables.cdf.shape[0]

    # ALL table lookups hoisted out of the serial chain: the CDF entry of
    # every symbol is known before the scan (it depends only on symbol and
    # row, never on the rANS state) — the scan body is pure arithmetic.
    # The bulk lookups themselves are exact one-hot f32 matmuls, not
    # gathers (TPU gathers run ~25 ns/element even in bulk; the MXU does
    # the same lookup traffic-bound). Every value involved is an integer
    # < 2^17, exactly representable in f32, and a one-hot row sums
    # exactly one product, so the results are exact (asserted in
    # tests/test_tpu_rans.py::test_onehot_lookup_exact).
    #
    # NOTE: for per-channel (factorized-prior) tables max_len is small and
    # this is cheap. For the 64x3133 gaussian tables the (n, max_len)
    # intermediates below are why gaussian planes use the table-free
    # analytic coder (gauss_encode/gauss_decode) instead.
    A = _row_onehot(idx_tl.reshape(-1), rows)            # (n', rows)
    off = _lookup(A, tables.off_f32).reshape(T, lanes)
    maxv = _lookup(A, tables.maxv_f32).reshape(T, lanes)
    v = sym_tl.astype(jnp.float32) - off
    esc_tl = (v < 0) | (v >= maxv)
    vv = jnp.where(esc_tl, maxv, v)                      # f32 bin index
    binoh = (vv.reshape(-1, 1) ==
             jnp.arange(max_len, dtype=jnp.float32)).astype(jnp.float32)
    start = jnp.sum(_lookup(A, tables.start_f32) * binoh, -1).reshape(T, lanes)
    freq_f = jnp.sum(_lookup(A, tables.freq_f32) * binoh, -1).reshape(T, lanes)
    return _encode_scan_core(sym_tl, start.astype(jnp.uint32), freq_f,
                             esc_tl, lanes, n)


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
    base_tl = idx_tl.astype(jnp.uint32) << 16  # LUT row base, outside scan

    prefix_m = _prefix_matrix(lanes)
    stream_pad = _pad_stream(stream, lanes)

    def step(carry, base):
        state, ptr = carry
        slot = state & 0xFFFF
        entry = jnp.take(tables.lut_entry, base | slot)
        # entry = freq << 16 | (slot - start): the full state update in
        # one gather; symbols are recovered after the scan
        state = (entry >> 16) * (state >> 16) + (entry & 0xFFFF)
        need = (state < RENORM_BASE).astype(jnp.float32)
        rank_f, total = _rank_total(need, prefix_m, lanes)
        read = _stream_read(stream_pad, ptr, rank_f, lanes)
        state = jnp.where(need > 0, (state << 16) | read, state)
        ptr = ptr + total.astype(jnp.uint32)
        return (state, ptr), slot.astype(jnp.uint16)

    init = (states.astype(jnp.uint32), jnp.uint32(0))
    _, slot_tl = jax.lax.scan(step, init, base_tl, unroll=SCAN_UNROLL)

    # bulk symbol recovery, gather-free: the bin index is how many CDF
    # bounds lie at or below the slot (the row's bounds come from one
    # exact one-hot matmul; comparisons/sums are exact in f32)
    rows = tables.cdf.shape[0]
    A = _row_onehot(idx_tl.reshape(-1), rows)
    bounds = _lookup(A, tables.cdf_f32)               # (n', maxL+1)
    slot_f = slot_tl.reshape(-1, 1).astype(jnp.float32)
    v = jnp.sum((bounds <= slot_f).astype(jnp.float32), -1) - 1.0
    sym_flat = (v + _lookup(A, tables.off_f32)).astype(jnp.int32)
    # substitute escaped values (side list; padding positions drop)
    sym_flat = sym_flat.at[esc_pos].set(esc_val, mode="drop")
    return sym_flat[:n]


# ---------------------------------------------------------------------------
# analytic gaussian coder (table-free; y planes)
# ---------------------------------------------------------------------------
#
# The scale-table CDFs are 64 rows x up to 3133 bins: coding y planes
# against them with the one-hot trick materializes (n, 3133) f32
# intermediates (~1.8 GB for a Kodak y plane, ~15 GB at batch 8 — the
# round-2 batched-throughput regression), and the in-scan 65536-slot LUT
# gather is the decode latency floor (~25 ns/lane-element serialized).
# But the gaussian CDF is an ANALYTIC function of (bin, sigma): instead
# of baking tables, compute the quantized CDF bounds on the fly —
#
#   bound(v) = clip(floor(B * G(v)), v, B - L + v),  bound(0)=0, bound(L)=B
#   G(v) = (1-eps) * (Phi((v-c-0.5)/sigma) - Phi_lo) / den  +  eps * v/L
#
# with B = 65504 value slots, the top 32 slots an escape bin, c = support
# half-width (SUPPORT_SIGMAS sigmas), L = 2c+1 bins, and eps sized so the
# pre-floor gap between consecutive bounds is >= EPS_MARGIN (every bin
# keeps freq >= 1 despite f32 rounding; the clip additionally pins
# bound(v) inside [v, B-L+v], which preserves strict monotonicity even if
# floor lands short). Encode needs bound(v), bound(v+1) per symbol — pure
# elementwise math, no tables. Decode inverts slot -> v by BISECTION on
# bound inside the scan (12 erf evaluations, all vectorized across lanes)
# — no gather anywhere, so scan steps are pure VPU work and batching
# amortizes instead of scaling the gather cost.
#
# Exactness contract: encoder and decoder evaluate _gauss_bound through
# the same jaxpr with the same f32 row parameters; XLA's f32 elementwise
# ops round identically regardless of surrounding fusion (no FP
# contraction/reassociation in XLA's default semantics), so the floor is
# bit-identical on both sides. Guarded by
# tests/test_tpu_rans.py::test_gauss_bound_bulk_vs_scan_identical.
#
# Rate: the analytic quantization is within ~0.1% of the baked-table
# rate (same gaussian, same tail mass class); only the widest rows pay
# the eps mixing visibly and almost no trained-stat symbols land there.

GAUSS_B = 65504.0          # value-slot budget; [B, 2^16) = escape bin
GAUSS_ESC_FREQ = 65536.0 - GAUSS_B
SUPPORT_SIGMAS = 6.0       # matches the baked tables' 1e-9 tail multiplier
EPS_MARGIN = 2.5           # pre-floor bound gap (>= 1 + f32 slack)
_INV_SQRT2 = 0.7071067811865476
# y planes; smaller than the table path's 256: the bisection scan step is
# cheap enough that halving the per-lane state flush wins. Env override
# for latency/rate tuning sweeps (each extra lane costs ~2 net flush
# bytes/plane but shortens the serial decode chain proportionally).
GAUSS_LANES = int(os.environ.get("HYRES_GAUSS_LANES", "128"))


class GaussAnalytic(NamedTuple):
    """Per-scale-table-row f32 parameters for the analytic coder.

    params: (rows, 8) f32 — [inv_sigma, c+0.5, c, L, 1/L, eps, phi_lo,
    inv_den]. Fetched per symbol by exact one-hot matmul (rows <= 64)."""

    params: jax.Array


def build_gauss_analytic(scale_table) -> GaussAnalytic:
    from scipy.special import ndtr

    st = np.asarray(scale_table, np.float64)
    c = np.ceil(SUPPORT_SIGMAS * st)
    L = 2.0 * c + 1.0
    eps = EPS_MARGIN * L / GAUSS_B
    phi_lo = ndtr((-c - 0.5) / st)
    den = ndtr((c + 0.5) / st) - phi_lo
    p = np.stack([1.0 / st, c + 0.5, c, L, 1.0 / L, eps,
                  phi_lo, 1.0 / den], axis=1).astype(np.float32)
    return GaussAnalytic(params=jnp.asarray(p))


def _gauss_bound(v, inv_sigma, chalf, L, inv_L, eps, phi_lo, inv_den):
    """Quantized CDF bound at integer bin edge v (all f32, all exact
    integers on output). Must stay a single shared expression — both
    coder directions call it (see exactness contract above)."""
    t = (v - chalf) * inv_sigma
    phi = 0.5 * (1.0 + jax.lax.erf(t * _INV_SQRT2))
    F = (phi - phi_lo) * inv_den
    G = F + eps * (v * inv_L - F)
    b = jnp.floor(GAUSS_B * G)
    b = jnp.clip(b, v, GAUSS_B - L + v)
    return jnp.where(v <= 0.0, 0.0, jnp.where(v >= L, GAUSS_B, b))


def _gauss_params_for(idx_flat: jax.Array, ga: GaussAnalytic):
    """(n,) i32 row ids -> tuple of 8 (n,) f32 param vectors (exact:
    one-hot matmul copies each f32 value bit-for-bit)."""
    rows = ga.params.shape[0]
    P = _lookup(_row_onehot(idx_flat, rows), ga.params)
    return tuple(P[:, i] for i in range(8))


def gauss_encode(symbols: jax.Array, indexes: jax.Array,
                 ga: GaussAnalytic, lanes: int):
    """Analytic-gaussian encode of a flat (n,) int32 plane; same output
    contract as rans_encode."""
    n = symbols.shape[0]
    T, _, _ = plane_geometry(n, lanes)
    sym_tl = _to_tl(symbols.astype(jnp.int32), T, lanes, 0)  # pad: center
    idx_tl = _to_tl(indexes.astype(jnp.int32), T, lanes, 0)
    inv_sigma, chalf, c, L, inv_L, eps, phi_lo, inv_den = (
        q.reshape(T, lanes) for q in _gauss_params_for(
            idx_tl.reshape(-1), ga))
    v = sym_tl.astype(jnp.float32) + c
    esc_tl = (v < 0.0) | (v >= L)
    vv = jnp.where(esc_tl, 0.0, v)
    b0 = _gauss_bound(vv, inv_sigma, chalf, L, inv_L, eps, phi_lo, inv_den)
    b1 = _gauss_bound(vv + 1.0, inv_sigma, chalf, L, inv_L, eps, phi_lo,
                      inv_den)
    start = jnp.where(esc_tl, GAUSS_B, b0)
    freq_f = jnp.where(esc_tl, GAUSS_ESC_FREQ, b1 - b0)
    return _encode_scan_core(sym_tl, start.astype(jnp.uint32), freq_f,
                             esc_tl, lanes, n)


def gauss_decode(stream: jax.Array, states: jax.Array, indexes: jax.Array,
                 esc_pos: jax.Array, esc_val: jax.Array,
                 ga: GaussAnalytic, lanes: int, n: int) -> jax.Array:
    """Analytic-gaussian decode; same contract as rans_decode.

    The scan carries NO table state: each step recovers the bin by
    bisection on _gauss_bound (12 iterations cover L <= 3073+2), tracking
    bound(lo)/bound(hi) so start/freq need no extra evaluations."""
    T, padded, _ = plane_geometry(n, lanes)
    idx_tl = _to_tl(indexes.astype(jnp.int32), T, lanes, 0)
    rows = ga.params.shape[0]
    P = _lookup(_row_onehot(idx_tl.reshape(-1), rows),
                ga.params).reshape(T, lanes, 8)
    prefix_m = _prefix_matrix(lanes)
    stream_pad = _pad_stream(stream, lanes)
    n_iters = max(1, int(np.ceil(np.log2(
        2.0 * np.ceil(SUPPORT_SIGMAS * 256.0) + 2.0))))

    def step(carry, p):
        state, ptr = carry
        inv_sigma, chalf, c, L = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
        inv_L, eps, phi_lo, inv_den = p[:, 4], p[:, 5], p[:, 6], p[:, 7]
        slot = state & 0xFFFF
        slot_f = slot.astype(jnp.float32)
        is_esc = slot_f >= GAUSS_B
        # bisection invariant: bound(lo) <= slot < bound(hi)
        lo = jnp.zeros_like(slot_f)
        blo = jnp.zeros_like(slot_f)
        hi = L
        bhi = jnp.full_like(slot_f, GAUSS_B)
        for _ in range(n_iters):
            mid = jnp.floor((lo + hi) * 0.5)
            b = _gauss_bound(mid, inv_sigma, chalf, L, inv_L, eps,
                             phi_lo, inv_den)
            take = b <= slot_f
            lo = jnp.where(take, mid, lo)
            blo = jnp.where(take, b, blo)
            hi = jnp.where(take, hi, mid)
            bhi = jnp.where(take, bhi, b)
        start = jnp.where(is_esc, GAUSS_B, blo)
        freq = jnp.where(is_esc, 65536.0, bhi) - start
        state = (freq.astype(jnp.uint32) * (state >> 16)
                 + (slot - start.astype(jnp.uint32)))
        need = (state < RENORM_BASE).astype(jnp.float32)
        rank_f, total = _rank_total(need, prefix_m, lanes)
        read = _stream_read(stream_pad, ptr, rank_f, lanes)
        state = jnp.where(need > 0, (state << 16) | read, state)
        ptr = ptr + total.astype(jnp.uint32)
        return (state, ptr), (lo - c).astype(jnp.int32)

    init = (states.astype(jnp.uint32), jnp.uint32(0))
    _, sym_tl = jax.lax.scan(step, init, P, unroll=SCAN_UNROLL)
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
    # n_esc rides a ONE-BYTE header field: >= 256 (including exactly 256,
    # which the side list could hold) must overflow to the host coder,
    # never reach bytes() (which would raise ValueError past the codecs'
    # OverflowError fallbacks)
    if n_esc >= min(ESC_MAX + 1, 256):
        raise OverflowError(f"{n_esc} escapes exceed side-list cap {ESC_MAX}")
    if n_renorm > stream.shape[0]:
        raise OverflowError(
            f"{n_renorm} renorm chunks exceed the stream cap {stream.shape[0]}")
    for i in range(int(n_esc)):
        # escape values are framed as i16; anything wider must fall back
        # (symbols are clipped to +/-32000 upstream, so this is a guard
        # against misuse, not a hot path)
        if not -32768 <= int(esc_val[i]) <= 32767:
            raise OverflowError(f"escape value {int(esc_val[i])} exceeds i16")
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
    """bytes -> (lanes, states u32, EXACT-length stream u16, esc_pos,
    esc_val). The decode scans read the stream only through
    ``take(..., mode="clip")`` at offsets < n_renorm, so the stream array
    needs no cap padding — callers batch-pad to a bucketed common length
    (unframe_batch) to bound jit recompiles while keeping the
    host->device upload near the actual payload size."""
    lanes = 1 << (data[0] & 0x7F)
    n_esc = data[1]
    n_renorm = int.from_bytes(data[2:6], "little")
    off = 6
    states = np.frombuffer(data, "<u4", lanes, off).copy()
    off += 4 * lanes
    T, padded, _ = plane_geometry(n, lanes)
    # at least one entry: jnp.take rejects gathers from an empty axis
    stream = np.zeros(max(n_renorm, 1), np.uint16)
    stream[:n_renorm] = np.frombuffer(data, "<u2", n_renorm, off)
    off += 2 * n_renorm
    esc_pos = np.full(ESC_MAX, padded, np.int32)
    esc_val = np.zeros(ESC_MAX, np.int32)
    for i in range(n_esc):
        esc_pos[i] = int.from_bytes(data[off:off + 4], "little")
        esc_val[i] = np.frombuffer(data, "<i2", 1, off + 4)[0]
        off += 6
    return lanes, states, stream, esc_pos, esc_val
