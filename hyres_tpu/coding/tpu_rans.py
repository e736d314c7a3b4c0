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

    TPU gathers are ~25 ns/element (scalarized) even in bulk, so EVERY
    per-symbol table access — in-scan included — uses exact one-hot
    f32 matmuls over these small row tables instead (a single-nonzero
    one-hot row sums exactly one product — exact for any value < 2^24).
    The decode scan recovers each bin as the RANK of the slot among the
    row's CDF bounds (compare + sum + masked max/min reductions over
    cdf_f32), the same construction as the gaussian coder's segment
    tables — no 65536-slot LUT, no gather on the serial chain.
    """

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
    """CdfTables (host numpy, from entropy.build_*_tables) -> device
    row tables (integer-valued f32 data; everything the coder reads)."""
    cdf = np.asarray(t.quantized_cdf, np.int64)
    lengths = np.asarray(t.cdf_length, np.int64)
    offsets = np.asarray(t.offset, np.int64)
    rows = cdf.shape[0]
    for r in range(rows):
        freqs = np.diff(cdf[r, : lengths[r]])
        assert freqs.max() <= 0xFFFF, "degenerate full-range CDF bin"
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
    one = jnp.uint32(1)
    zero = jnp.uint32(0)
    q = jnp.zeros_like(state)
    r = jnp.zeros_like(state)
    for shift in (24, 16, 8, 0):
        acc = (r << 8) | ((state >> shift) & 0xFF)
        # every cast routes through int32: this chip's Mosaic backend has
        # no uint32<->float32 conversion ('Unsupported cast: uint32 ->
        # float32', BENCH_r03), and acc < 2^24 is exact in int32. Same
        # bits on the XLA lowering.
        acc_f = acc.astype(jnp.int32).astype(jnp.float32)
        qi = (acc_f * rcp).astype(jnp.int32).astype(jnp.uint32)
        # correction: f32 estimate is within +/-2 of the exact quotient
        for _ in range(2):
            over = qi * freq > acc
            qi = qi - jnp.where(over, one, zero)
        ri = acc - qi * freq
        for _ in range(2):
            under = ri >= freq
            qi = qi + jnp.where(under, one, zero)
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
# single-image encode, the encode device-time floor, and it multiplies
# by B under vmap); "merge" (default) uses masked_compact below — a
# dense merge-tree of barrel-shift merges, pure VPU work that
# vectorizes under vmap (~200M selects for a y plane, well under 1 ms
# of VPU at 8x128 lanes). Bit-equality between the two is pinned by
# tests (same bytes); HYRES_COMPACT=nonzero restores the old lowering
# for A/B timing.
COMPACT_MODE = os.environ.get("HYRES_COMPACT", "merge")

# Gaussian-plane DECODE lowering: "xla" (lax.scan, this module),
# "pallas" (coding/pallas_rans.py — the whole decode scan in one Mosaic
# kernel, sublane-batched up to 8 images in lockstep), or "auto"
# (default: pallas when the backend lowers Mosaic natively AND a
# one-shot self-test decodes a real XLA-framed plane bit-exactly through
# the kernel, else xla — see pallas_rans.probe). v2 streams are
# lowering-independent (exact-integer wire contract), so this is purely
# a latency knob.
GAUSS_IMPL = os.environ.get("HYRES_GAUSS_IMPL", "auto")


def _auto_kernel_ok(probe_fn) -> bool:
    """auto-mode gate for the Pallas lowerings.

    On backends without native Mosaic support (CPU) pallas_call runs in
    interpret mode — an emulation meant for correctness tests, orders of
    magnitude slower than this module's XLA scans (a 256x256 image's
    196k-symbol plane takes minutes instead of milliseconds). "auto"
    therefore takes a kernel only on a real Mosaic backend and only
    after its one-shot bit-exactness probe; GAUSS_IMPL=pallas still
    forces the kernel anywhere (how the CPU test suite exercises the
    kernels in interpret mode)."""
    from . import pallas_rans
    return not pallas_rans._interpret() and probe_fn()


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


def stream_cap(n: int, lanes: int, words: int = 1) -> int:
    """Renorm-stream buffer entries.

    Large planes get an average-4-bits/symbol buffer (trained-stat
    planes run 2-3 bits/symbol; overflow at framing time falls back to
    the host coder like escape-list overflow) — this cuts the
    device->host stream transfer 4x. Small planes (<= 64k symbols, e.g.
    hyper-latents) keep the full worst-case buffer: their transfer is
    trivial and undertrained hyper stats can legitimately need
    >4 bits/symbol. `words` is the coder's worst-case renorm words per
    symbol (2 for the segment-coded gaussian path's two pushes); the
    big-plane average cap tracks total RATE, not push count, so only
    the worst-case branch scales with it."""
    _, padded, _ = plane_geometry(n, lanes)
    if n <= 65536:
        return padded * words
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


def escape_compact(sym_flat: jax.Array, esc_flat: jax.Array,
                   fill_pos: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Escape side lists ((ESC_MAX,) positions asc, (ESC_MAX,) values,
    exact count) for a SPARSE mask — two-level stable compaction.

    masked_compact over the full padded plane costs ~n*log2(n) selects
    per list (~21M for a 589k-symbol y plane, and the encode path builds
    TWO lists); escapes are capped at ESC_MAX = 256, so almost all of
    that work shuffles zeros. Level 1 compacts the indices of the
    128-wide ROWS that contain any set lane (n/128-element tree); level
    2 gathers those <= ESC_MAX rows and compacts the (ESC_MAX*128,)
    block (32k-element tree) — ~15x fewer selects, same bytes.

    Exactness: row-major order is preserved (row indices ascend by
    masked_compact's stability, lanes ascend within a row). The count is
    the exact jnp.sum of the mask. Rows-with-escapes <= count, so when
    count <= ESC_MAX every escape is captured; when count > ESC_MAX the
    list prefix may be garbage, which is sound because frame_plane
    raises OverflowError on the exact count before any byte is read.
    Pinned bit-identical to masked_compact by tests/test_tpu_rans.py."""
    n = esc_flat.shape[0]
    W = 128
    npad = -(-n // W) * W
    mask = jnp.pad(esc_flat.astype(jnp.int32), (0, npad - n))
    vals = jnp.pad(sym_flat, (0, npad - n))
    rows = npad // W
    m2 = mask.reshape(rows, W)
    row_has = (jnp.sum(m2, axis=1) > 0)
    row_iota = jnp.arange(rows, dtype=jnp.int32)
    row_sel, _ = masked_compact(row_iota, row_has, ESC_MAX, fill=rows)
    # gather the <= ESC_MAX escape-bearing rows (out-of-range fill rows
    # clip to the last row; their lanes are masked off below)
    live = row_sel < rows
    v_rows = jnp.take(vals.reshape(rows, W), row_sel, axis=0, mode="clip")
    m_rows = jnp.take(m2, row_sel, axis=0, mode="clip") * live[:, None]
    pos_rows = (row_sel[:, None] * W
                + jnp.arange(W, dtype=jnp.int32)[None, :])
    esc_pos, _ = masked_compact(pos_rows.reshape(-1),
                                m_rows.reshape(-1) > 0, ESC_MAX,
                                fill=fill_pos)
    esc_val, _ = masked_compact(v_rows.reshape(-1),
                                m_rows.reshape(-1) > 0, ESC_MAX)
    n_esc = jnp.sum(mask).astype(jnp.int32)
    return esc_pos.astype(jnp.int32), esc_val, n_esc


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
        esc_pos, esc_val, n_esc = escape_compact(
            sym_tl.reshape(-1), esc_flat, fill_pos=padded)
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
    # intermediates would be why gaussian planes use the segment-table
    # coder (gauss_encode/gauss_decode) instead.
    start, freq_f, esc = _eb_split(sym_tl.reshape(-1), idx_tl.reshape(-1),
                                   tables)
    return _encode_scan_core(sym_tl, start.astype(jnp.uint32).reshape(T, lanes),
                             freq_f.reshape(T, lanes),
                             esc.reshape(T, lanes), lanes, n)


def _eb_split(sym_flat: jax.Array, idx_flat: jax.Array,
              tables: TpuCoderTables):
    """Per-symbol (start, freq, esc) for the factorized-prior coder —
    bulk, exact (one-hot matmul lookups over the small row tables)."""
    rows = tables.cdf.shape[0]
    max_len = tables.cdf.shape[1]
    A = _row_onehot(idx_flat, rows)                      # (n', rows)
    off = _lookup(A, tables.off_f32)
    maxv = _lookup(A, tables.maxv_f32)
    v = sym_flat.astype(jnp.float32) - off
    esc = (v < 0) | (v >= maxv)
    vv = jnp.where(esc, maxv, v)                         # f32 bin index
    binoh = (vv[:, None] ==
             jnp.arange(max_len, dtype=jnp.float32)).astype(jnp.float32)
    start = jnp.sum(_lookup(A, tables.start_f32) * binoh, -1)
    freq_f = jnp.sum(_lookup(A, tables.freq_f32) * binoh, -1)
    return start, freq_f, esc


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
    rows = tables.cdf.shape[0]

    prefix_m = _prefix_matrix(lanes)
    stream_pad = _pad_stream(stream, lanes)
    bounds_t, off_t = tables.cdf_f32, tables.off_f32

    def step(carry, row):
        state, ptr = carry
        # the bin is the RANK of the slot among the row's CDF bounds;
        # the row arrives by exact one-hot matmul, start/freq by masked
        # max/min — reductions only, no gather on the serial chain
        # (same construction as gauss_decode; the escape bin is just the
        # row's last bin, so it needs no special casing here)
        oh = _row_onehot(row, rows)                  # (lanes, rows)
        rowvals = _lookup(oh, bounds_t)              # (lanes, maxL+1)
        off = jnp.sum(oh * off_t[None, :], -1)       # (lanes,) exact
        slot = state & 0xFFFF
        slot_f = slot.astype(jnp.float32)
        le = rowvals <= slot_f[:, None]
        v = jnp.sum(le.astype(jnp.float32), -1) - 1.0
        start = jnp.max(jnp.where(le, rowvals, 0.0), -1)
        b1 = jnp.min(jnp.where(le, jnp.float32(1 << 17), rowvals), -1)
        freq = b1 - start
        state = (freq.astype(jnp.uint32) * (state >> 16)
                 + (slot - start.astype(jnp.uint32)))
        need = (state < RENORM_BASE).astype(jnp.float32)
        rank_f, total = _rank_total(need, prefix_m, lanes)
        read = _stream_read(stream_pad, ptr, rank_f, lanes)
        state = jnp.where(need > 0, (state << 16) | read, state)
        ptr = ptr + total.astype(jnp.uint32)
        return (state, ptr), (v + off).astype(jnp.int32)

    init = (states.astype(jnp.uint32), jnp.uint32(0))
    _, sym_tl = jax.lax.scan(step, init, idx_tl, unroll=SCAN_UNROLL)
    sym_flat = sym_tl.reshape(-1)
    # substitute escaped values (side list; padding positions drop)
    sym_flat = sym_flat.at[esc_pos].set(esc_val, mode="drop")
    return sym_flat[:n]


def rans_decode_batch(stream_b: jax.Array, states_b: jax.Array,
                      idx_b: jax.Array, esc_pos_b: jax.Array,
                      esc_val_b: jax.Array, tables: TpuCoderTables,
                      lanes: int, n: int) -> jax.Array:
    """(B, ...) batched factorized-prior decode -> (B, n) i32. Same
    lowering dispatch as gauss_decode_batch (GAUSS_IMPL; the EB kernel
    has its own one-shot self-test, pallas_rans.probe_eb)."""
    pk = _kernel_module("probe_eb", lanes)
    if pk is not None:
        return pk.eb_decode_batch(
            stream_b, states_b, idx_b, esc_pos_b, esc_val_b,
            tables, lanes, n)
    return jax.vmap(
        lambda st, sa, ix, ep, ev: rans_decode(
            st, sa, ix, ep, ev, tables, lanes, n)
    )(stream_b, states_b, idx_b, esc_pos_b, esc_val_b)


# ---------------------------------------------------------------------------
# gaussian coder (segment-table + uniform low bits; y planes)
# ---------------------------------------------------------------------------
#
# The scale-table CDFs are 64 rows x up to 3133 bins: coding y planes
# against them with the one-hot trick materializes (n, 3133) f32
# intermediates (~1.8 GB for a Kodak y plane), and the in-scan
# 65536-slot LUT gather is a decode latency floor. Round 2/3 coded y
# planes against an ANALYTIC erf CDF recomputed on both sides instead —
# which exposed a fundamental exactness problem: rANS needs the encoder
# and decoder to agree BIT-FOR-BIT on every (start, freq), but f32
# transcendentals are NOT reproducible across compilation contexts
# (lax.erf differs by 1 ulp between bulk and in-scan lowering on
# XLA:CPU for 37% of inputs, and even mul/add chains are subject to
# context-dependent FMA contraction; measured corruption: whole planes
# at wide sigmas). Conclusion: the wire contract must never depend on a
# recomputed f32 rounding.
#
# v2 design — every coding quantity is EXACT integer arithmetic:
#
#   Per scale row r (host-built, f64/scipy, shipped as integer-valued
#   f32 DATA): support half-width c = ceil(6 sigma), L = 2c+1 bins,
#   low-bit count k_r = smallest k with ceil(L / 2^k) <= 127 segments,
#   and a strictly increasing quantized-CDF bounds table
#   B_r[j] = bound at bin-edge (j << k_r), j = 0..nseg (B_r[0] = 0,
#   B_r[nseg] = GAUSS_B, each segment >= 1 slot), padded to 128 columns
#   with 65536.
#
#   A symbol's bin v = sym + c in [0, L) splits into h = v >> k and
#   low = v & (2^k - 1). The HIGH part codes against segment h:
#   (start, freq) = (B[h], B[h+1] - B[h]). The LOW part codes as k
#   uniform bits: (start, freq) = (low << (16-k), 2^(16-k)) — pure
#   shifts. Out-of-support values escape exactly as before (slot region
#   [GAUSS_B, 2^16), value in the side list; escapes still push k zero
#   low bits so both directions stay in lockstep).
#
#   Encode (reverse scan, per symbol): push low (shift math), then push
#   high (_div_u32_by_u16). Decode (forward scan, per symbol): pop high
#   — fetch the 128-wide bounds row with ONE exact one-hot MXU matmul,
#   then h = rank of slot (compare + sum), start/freq by masked max/min
#   reductions (NO per-lane gather, NO bisection-on-a-function) — then
#   pop low by shifts. Every device-side quantity is data movement,
#   integer-valued-f32 compares/selects, u32 shifts/mul, or exact
#   division — bit-identical on XLA:TPU, XLA:CPU and Mosaic by
#   construction, so XLA-framed streams are decodable by the Pallas
#   kernel and vice versa.
#
# Rate: within a segment the 2^k low bits are coded uniformly; the KL
# penalty vs the exact per-bin CDF is ~(pdf slope within segment)^2 and
# is measured < 1% even on the widest rows (k=5, sigma ~ 256); rows
# with L <= 127 have k = 0 — an exact per-bin quantized CDF, zero
# penalty (most trained-stat symbols land there). Guarded by
# tests/test_tpu_rans.py::test_gauss_rate_close_to_table_coder.
#
# Replaces: CompressAI's GaussianConditional coder used by
# /root/reference/models/checkerboard.py:167-259.

GAUSS_B = 65504.0          # value-slot budget; [B, 2^16) = escape bin
GAUSS_ESC_FREQ = 65536.0 - GAUSS_B
SUPPORT_SIGMAS = 6.0       # matches the baked tables' 1e-9 tail multiplier
# Bounds row width (nseg <= GAUSS_COLS-1 segments). 128 = one VPU/MXU
# lane tile per decode-step fetch; 256 halves k on the widest rows
# (halves the uniform-low-bits rate penalty) at 2x fetch/reduce cost
# per scan step — rate/latency knob, resolved by on-chip A/B.
GAUSS_COLS = int(os.environ.get("HYRES_GAUSS_COLS", "128"))
# y planes; smaller than the table path's 256: the scan step is cheap
# enough that halving the per-lane state flush wins. Env override for
# latency/rate tuning sweeps (each extra lane costs ~2 net flush
# bytes/plane but shortens the serial decode chain proportionally).
GAUSS_LANES = int(os.environ.get("HYRES_GAUSS_LANES", "128"))


class GaussTables(NamedTuple):
    """Device tables for the segment-coded gaussian coder.

    bounds: (rows, GAUSS_COLS) f32, integer-valued — strictly increasing
        quantized CDF bounds at bin edges (j << k) per row, B[0] = 0,
        B[nseg] = GAUSS_B, padding 65536 past nseg.
    params: (rows, 4) f32, integer-valued — [c, L, k, nseg].
    """

    bounds: jax.Array
    params: jax.Array


def build_gauss_tables(scale_table) -> GaussTables:
    from scipy.special import ndtr

    st = np.asarray(scale_table, np.float64)
    rows = st.size
    B = int(GAUSS_B)
    bounds = np.full((rows, GAUSS_COLS), 65536.0, np.float64)
    params = np.zeros((rows, 4), np.float64)
    for r in range(rows):
        c = int(np.ceil(SUPPORT_SIGMAS * st[r]))
        L = 2 * c + 1
        k = 0
        while -(-L // (1 << k)) > GAUSS_COLS - 1:
            k += 1
        nseg = -(-L // (1 << k))
        edges = np.minimum(np.arange(nseg + 1) << k, L).astype(np.float64)
        lo = ndtr((-c - 0.5) / st[r])
        den = ndtr((c + 0.5) / st[r]) - lo
        F = (ndtr((edges - c - 0.5) / st[r]) - lo) / den
        b = np.floor(B * np.clip(F, 0.0, 1.0))
        # strictly increasing lift: every segment keeps >= 1 slot
        f = np.maximum(np.diff(b).astype(np.int64), 1)
        excess = int(f.sum()) - B
        while excess > 0:
            g = int(np.argmax(f))
            take = min(excess, int(f[g]) - 1)
            f[g] -= take
            excess -= take
        assert excess == 0 and (f >= 1).all()
        bounds[r, : nseg + 1] = np.concatenate(
            [[0.0], np.cumsum(f)]).astype(np.float64)
        assert bounds[r, nseg] == B
        params[r] = [c, L, k, nseg]
    return GaussTables(bounds=jnp.asarray(bounds, jnp.float32),
                       params=jnp.asarray(params, jnp.float32))


def _gauss_split(sym_flat: jax.Array, idx_flat: jax.Array,
                 gt: GaussTables):
    """Per-symbol (start_h, freq_h, low, kshift, esc) — bulk, exact.

    start/freq come from one-hot matmul sums over the integer-valued
    bounds table (exact data movement); h/low from integer shifts."""
    rows = gt.bounds.shape[0]
    oh = _row_onehot(idx_flat, rows)                     # (N, rows)
    prm = _lookup(oh, gt.params)                         # (N, 4)
    c_i = prm[:, 0].astype(jnp.int32)
    L_i = prm[:, 1].astype(jnp.int32)
    k_i = prm[:, 2].astype(jnp.int32)
    v = sym_flat + c_i
    esc = (v < 0) | (v >= L_i)
    vv = jnp.where(esc, 0, v)
    h = jax.lax.shift_right_logical(vv, k_i)
    low = vv - jax.lax.shift_left(h, k_i)
    cols = gt.bounds.shape[1]
    iota = jnp.arange(cols, dtype=jnp.int32)[None, :]
    oh_h = (iota == h[:, None]).astype(jnp.float32)
    oh_h1 = (iota == (h + 1)[:, None]).astype(jnp.float32)
    bT = gt.bounds.T                                     # (cols, rows)
    b0 = jnp.sum(_lookup(oh_h, bT) * oh, -1)
    b1 = jnp.sum(_lookup(oh_h1, bT) * oh, -1)
    start_h = jnp.where(esc, jnp.float32(GAUSS_B), b0)
    freq_h = jnp.where(esc, jnp.float32(GAUSS_ESC_FREQ), b1 - b0)
    return start_h, freq_h, low, (16 - k_i), esc


def gauss_encode(symbols: jax.Array, indexes: jax.Array,
                 gt: GaussTables, lanes: int):
    """Segment-table gaussian encode of a flat (n,) int32 plane; same
    output contract as rans_encode. Each symbol is TWO rANS pushes (low
    bits first, then the segment), so the stream budget is 2 words/symbol
    worst case (stream_cap(..., words=2))."""
    n = symbols.shape[0]
    T, padded, _ = plane_geometry(n, lanes)
    sym_tl = _to_tl(symbols.astype(jnp.int32), T, lanes, 0)  # pad: center
    idx_tl = _to_tl(indexes.astype(jnp.int32), T, lanes, 0)
    start_h, freq_h, low, ks, esc = _gauss_split(
        sym_tl.reshape(-1), idx_tl.reshape(-1), gt)
    xs = (start_h.astype(jnp.uint32).reshape(T, lanes),
          freq_h.astype(jnp.uint32).reshape(T, lanes),
          (1.0 / freq_h).reshape(T, lanes),
          low.astype(jnp.uint32).reshape(T, lanes),
          ks.astype(jnp.uint32).reshape(T, lanes))

    def step(state, x):
        start, freq, rcp, lowv, ksv = x
        # push LOW first: the decoder pops high then low; k = 0 rows
        # degenerate to an exact identity (freq_l = 2^16, never renorms)
        freq_l = jnp.uint32(1) << ksv
        emit_l = (state & 0xFFFF).astype(jnp.uint16)
        need_l = (state >> 16) >= freq_l
        state = jnp.where(need_l, state >> 16, state)
        state = ((state >> ksv) << 16) + (lowv << ksv) + (state & (freq_l - 1))
        # push HIGH (exact limb division)
        emit_h = (state & 0xFFFF).astype(jnp.uint16)
        need_h = (state >> 16) >= freq
        state = jnp.where(need_h, state >> 16, state)
        q, r = _div_u32_by_u16(state, freq, rcp)
        state = (q << 16) + r + start
        # ys stack [high, low]: within a decode step the high-pop's
        # renorm word is read first (LIFO of the reverse encode)
        return state, (jnp.stack([emit_h, emit_l]),
                       jnp.stack([need_h, need_l]))

    init = jnp.full((lanes,), RENORM_BASE, jnp.uint32)
    states, (emit_t2, mask_t2) = jax.lax.scan(
        step, init, xs, reverse=True, unroll=SCAN_UNROLL)

    # compact the renorm stream in decoder read order (step asc,
    # [high, low], lane asc) into a capped buffer
    mask_flat = mask_t2.reshape(-1)
    emit_flat = emit_t2.reshape(-1)
    cap = stream_cap(n, lanes, words=2)
    esc_flat = esc
    sym_flat = sym_tl.reshape(-1)
    if COMPACT_MODE == "merge":
        stream, n_renorm = masked_compact(emit_flat, mask_flat, cap)
        esc_pos, esc_val, n_esc = escape_compact(
            sym_flat, esc_flat, fill_pos=padded)
    else:
        (pos,) = jnp.nonzero(mask_flat, size=cap, fill_value=2 * padded)
        stream = jnp.take(emit_flat, pos, mode="fill", fill_value=0)
        n_renorm = jnp.sum(mask_flat).astype(jnp.int32)
        (esc_pos,) = jnp.nonzero(esc_flat, size=ESC_MAX, fill_value=padded)
        esc_val = jnp.take(sym_flat, esc_pos, mode="clip")
        n_esc = jnp.sum(esc_flat).astype(jnp.int32)

    return {"states": states, "stream": stream, "n_renorm": n_renorm,
            "esc_pos": esc_pos.astype(jnp.int32), "esc_val": esc_val,
            "n_esc": n_esc}


def gauss_decode(stream: jax.Array, states: jax.Array, indexes: jax.Array,
                 esc_pos: jax.Array, esc_val: jax.Array,
                 gt: GaussTables, lanes: int, n: int) -> jax.Array:
    """Segment-table gaussian decode; same contract as rans_decode.

    The scan carries NO table state: each step fetches the lane's
    128-wide bounds row by exact one-hot matmul and recovers the segment
    as the RANK of the slot among the row's bounds (compare + sum +
    masked max/min — reductions only, no gather, no function
    re-evaluation), then pops the k uniform low bits by shifts."""
    T, padded, _ = plane_geometry(n, lanes)
    idx_tl = _to_tl(indexes.astype(jnp.int32), T, lanes, 0)
    rows = gt.bounds.shape[0]
    prefix_m = _prefix_matrix(lanes)
    stream_pad = _pad_stream(stream, lanes)
    bounds, params = gt.bounds, gt.params

    def step(carry, row):
        state, ptr = carry
        oh = _row_onehot(row, rows)                  # (lanes, rows)
        rowvals = _lookup(oh, bounds)                # (lanes, cols) exact
        prm = _lookup(oh, params)                    # (lanes, 4)
        c_i = prm[:, 0].astype(jnp.int32)
        k_i = prm[:, 2].astype(jnp.int32)
        ks = (16 - k_i).astype(jnp.uint32)
        # pop HIGH: h = rank of slot among the row bounds
        slot = state & 0xFFFF
        slot_f = slot.astype(jnp.float32)
        is_esc = slot_f >= GAUSS_B
        le = rowvals <= slot_f[:, None]
        h = jnp.sum(le.astype(jnp.float32), -1).astype(jnp.int32) - 1
        b0 = jnp.max(jnp.where(le, rowvals, 0.0), -1)
        b1 = jnp.min(jnp.where(le, jnp.float32(65536.0), rowvals), -1)
        start = jnp.where(is_esc, jnp.float32(GAUSS_B), b0)
        freq = jnp.where(is_esc, jnp.float32(65536.0), b1) - start
        h = jnp.where(is_esc, 0, h)
        state = (freq.astype(jnp.uint32) * (state >> 16)
                 + (slot - start.astype(jnp.uint32)))
        need = (state < RENORM_BASE).astype(jnp.float32)
        rank_f, total = _rank_total(need, prefix_m, lanes)
        read = _stream_read(stream_pad, ptr, rank_f, lanes)
        state = jnp.where(need > 0, (state << 16) | read, state)
        ptr = ptr + total.astype(jnp.uint32)
        # pop LOW (k uniform bits; k = 0 rows are an exact identity)
        slot2 = state & 0xFFFF
        lowv = (slot2 >> ks).astype(jnp.int32)
        freq_l = jnp.uint32(1) << ks
        state = ((state >> 16) << ks) + (slot2 & (freq_l - 1))
        need2 = (state < RENORM_BASE).astype(jnp.float32)
        rank2, total2 = _rank_total(need2, prefix_m, lanes)
        read2 = _stream_read(stream_pad, ptr, rank2, lanes)
        state = jnp.where(need2 > 0, (state << 16) | read2, state)
        ptr = ptr + total2.astype(jnp.uint32)
        sym = (jax.lax.shift_left(h, k_i) | lowv) - c_i
        return (state, ptr), sym

    init = (states.astype(jnp.uint32), jnp.uint32(0))
    _, sym_tl = jax.lax.scan(step, init, idx_tl, unroll=SCAN_UNROLL)
    sym_flat = sym_tl.reshape(-1)
    # substitute escaped values (side list; padding positions drop)
    sym_flat = sym_flat.at[esc_pos].set(esc_val, mode="drop")
    return sym_flat[:n]


# ---------------------------------------------------------------------------
# batched gaussian entry points (implementation dispatch)
# ---------------------------------------------------------------------------


def _kernel_module(probe_name: str, lanes: int):
    """The single GAUSS_IMPL dispatch policy shared by all four batched
    entry points: returns the pallas_rans module iff this call should
    route through the Mosaic kernel — the lane tier is supported AND
    either the kernel is forced (GAUSS_IMPL=pallas) or its one-shot
    on-backend bit-equality self-test passes (=auto). Returns None to
    take the XLA scan lowering."""
    if GAUSS_IMPL not in ("pallas", "auto"):
        return None
    from . import pallas_rans
    if not pallas_rans.supported(lanes):
        return None
    if GAUSS_IMPL != "pallas" and not _auto_kernel_ok(
            getattr(pallas_rans, probe_name)):
        return None
    return pallas_rans


def gauss_encode_batch(sym_b: jax.Array, idx_b: jax.Array,
                       gt: GaussTables, lanes: int):
    """(B, n) batched gaussian encode; per-image output dict stacked on
    axis 0. GAUSS_IMPL dispatch: the Pallas encode kernel runs the
    reverse scan AND the stream compaction in one kernel (backward
    fill); "auto" takes it only after its one-shot bit-equality
    self-test vs the XLA path (pallas_rans.probe_enc)."""
    pk = _kernel_module("probe_enc", lanes)
    if pk is not None:
        return pk.gauss_encode_batch(sym_b, idx_b, gt, lanes)
    return jax.vmap(lambda s, i: gauss_encode(s, i, gt, lanes)
                    )(sym_b, idx_b)


def rans_encode_batch(sym_b: jax.Array, idx_b: jax.Array,
                      tables: TpuCoderTables, lanes: int):
    """(B, n) batched factorized-prior encode; same dispatch as
    gauss_encode_batch (the shared encode kernel's low push degenerates
    to an exact identity for this path)."""
    pk = _kernel_module("probe_enc", lanes)
    if pk is not None:
        return pk.eb_encode_batch(sym_b, idx_b, tables, lanes)
    return jax.vmap(lambda s, i: rans_encode(s, i, tables, lanes)
                    )(sym_b, idx_b)


def fused_encode_planes(planes):
    """Encode several (possibly ragged) planes, as ONE Mosaic kernel
    launch when the encode kernel is available, else as per-plane XLA
    scans. planes: sequence of ("gauss"|"eb", sym_b (B, n), idx_b (B, n),
    tables, lanes). Returns one enc dict per plane; the wire is
    bit-identical across lowerings AND to separate per-plane calls (the
    fused kernel pads ragged rows with exact-identity steps — see
    pallas_rans.fused_encode_batch).

    This is the encode-latency fuse: the scan's sequential step count is
    paid once for all planes instead of once per plane (r5
    enc_dispatch_probe: separate z+a+n = 176 ms, fused ~ the longest
    plane alone)."""
    max_lanes = max(p[4] for p in planes)
    pk = _kernel_module("probe_enc", max_lanes)
    if pk is not None and all(pk.supported(p[4]) for p in planes):
        return pk.fused_encode_batch(planes)
    outs = []
    for kind, sym_b, idx_b, tab, lanes in planes:
        outs.append(gauss_encode_batch(sym_b, idx_b, tab, lanes)
                    if kind == "gauss"
                    else rans_encode_batch(sym_b, idx_b, tab, lanes))
    return outs


def gauss_decode_batch(stream_b: jax.Array, states_b: jax.Array,
                       idx_b: jax.Array, esc_pos_b: jax.Array,
                       esc_val_b: jax.Array, gt: GaussTables,
                       lanes: int, n: int) -> jax.Array:
    """(B, ...) batched gaussian decode -> (B, n) i32. GAUSS_IMPL picks
    the lowering; v2 streams are cross-decodable between XLA and Pallas
    (all coding arithmetic is exact integer work on both). "auto" takes
    the kernel only after its one-shot bit-exactness self-test passes
    on this backend (pallas_rans.probe)."""
    pk = _kernel_module("probe", lanes)
    if pk is not None:
        return pk.gauss_decode_batch(
            stream_b, states_b, idx_b, esc_pos_b, esc_val_b, gt,
            lanes, n)
    return jax.vmap(
        lambda st, sa, ix, ep, ev: gauss_decode(
            st, sa, ix, ep, ev, gt, lanes, n)
    )(stream_b, states_b, idx_b, esc_pos_b, esc_val_b)


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
