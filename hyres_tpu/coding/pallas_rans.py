"""Pallas TPU kernel for the segment-table gaussian rANS decoder.

Why a hand-written kernel when coding/tpu_rans.py already runs the whole
coder inside jit: the XLA lowering of the decode scan pays ~11 us of
while-loop/dispatch overhead PER STEP for a step body that is only a few
hundred (1, lanes) VPU/MXU ops (captured round-3 trace: 12.65 ms for the
T=1152 scan of one 768x512 y plane), and a batch of B images pays it B
times. This module reimplements the latency-critical decode scan as ONE
Mosaic kernel: lane states live in VMEM scratch, the renorm stream is
VMEM-resident, the bounds tables are VMEM constants, and the per-step
work is one small MXU one-hot dot plus straight VPU reductions/shifts —
the per-step cost is the step's actual arithmetic, not XLA loop
machinery.

Sublane batching (the TPU-native batch design): the VPU is 8x128 — a
(1, 128) lane vector uses one sublane row. Up to G = 8 images of the
SAME plane geometry decode in lockstep as the rows of an (G, 128) tile:
every per-step op is shared, only the stream reads are per-image (each
image has its own stream and pointer). Batch-8 decode therefore costs
~one image's scan latency instead of 8x — this, not throughput tiling,
is what the serving path needs behind a ~26 ms dispatch tunnel.

Exactness: the v2 gaussian coder (see tpu_rans.py) has NO recomputed
f32 rounding in its wire contract — every coding quantity is exact
integer arithmetic (one-hot data movement, integer-valued-f32
compares/selects/reductions, u32 shifts/mul). XLA:TPU, XLA:CPU and
Mosaic therefore agree bit-for-bit by construction, and streams framed
by the XLA encoder are decodable by this kernel (guarded by
tests/test_pallas_rans.py, which cross-decodes on CPU interpret mode,
and by scripts/coder_microbench.py --impl pallas on-chip).

Encode has no kernel: it is bulk matmuls plus a cheap reverse scan,
already well-lowered by XLA (tpu_rans.gauss_encode_batch).

Reference being replaced: the CompressAI host coder used by
/root/reference/models/checkerboard.py:167-259 (see coding/tpu_rans.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tpu_rans as tr

# One kernel grid step processes TC scan steps; the row-id block DMA
# (G * TC * lanes * 4 B) double-buffers against the compute.
TC = 64
MAX_G = 8          # sublane rows: images decoded in lockstep per kernel


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _to_f32(x: jax.Array) -> jax.Array:
    """Mosaic-safe cast to f32: this chip's Mosaic backend rejects
    uint32 -> float32 (probe: 'Unsupported cast: uint32 -> float32'),
    so route through int32 (every value cast in these kernels is a
    16/17-bit coder quantity — exact in int32) and lower bools as a
    select instead of a cast."""
    if x.dtype == jnp.bool_:
        return jnp.where(x, jnp.float32(1.0), jnp.float32(0.0))
    if x.dtype == jnp.float32:
        return x
    return x.astype(jnp.int32).astype(jnp.float32)


def _f32_to_u32(x: jax.Array) -> jax.Array:
    """Mosaic-safe f32 -> u32 via int32 (values here are < 2^31)."""
    return x.astype(jnp.int32).astype(jnp.uint32)


def _shift_right_zeros(x: jax.Array, d: int) -> jax.Array:
    """(G, W) -> shifted right along lanes by static d, zero fill."""
    if d == 0:
        return x
    return jnp.concatenate(
        [jnp.zeros_like(x[:, :d]), x[:, :-d]], axis=1)


def _funnel_rot(a: jax.Array, b: jax.Array, o_col: jax.Array,
                lanes: int) -> jax.Array:
    """Per-row rotate-left of the (G, 2*lanes) window [a|b] by
    o in [0, lanes): returns (G, lanes) = window[o : o+lanes].

    log2(lanes) rounds of static funnel shifts selected by o's bits
    (per-row masks), so no per-lane gather ever happens."""
    k = 0
    while (1 << k) < lanes:
        s = 1 << k
        a_s = jnp.concatenate([a[:, s:], b[:, :s]], axis=1)
        b_s = jnp.concatenate([b[:, s:], a[:, :s]], axis=1)
        bit = ((o_col >> k) & 1) > 0          # (G, 1) bool
        a = jnp.where(bit, a_s, a)
        b = jnp.where(bit, b_s, b)
        k += 1
    return a


def _route_monotone_rows(win: jax.Array, rank: jax.Array,
                         lanes: int) -> jax.Array:
    """out[g, j] = win[g, rank[g, j]] for per-row MONOTONE ranks
    (exclusive prefix of a 0/1 mask). Same butterfly argument as
    tpu_rans._route_monotone, vectorized over sublane rows."""
    G = win.shape[0]
    # int iota then convert: Mosaic's tpu.iota is integer-only (f32 iota
    # fails verification — BENCH_r03 probe_eb tail)
    d = jax.lax.broadcasted_iota(jnp.int32, (G, lanes), 1
                                 ).astype(jnp.float32) - rank
    x = win
    b = 1 << (lanes.bit_length() - 2) if lanes > 1 else 0
    while b >= 1:
        shifted = _shift_right_zeros(x, b)
        take = jnp.floor(d / float(b)) % 2.0 >= 1.0
        x = jnp.where(take, shifted, x)
        b >>= 1
    return x


def _ladder_prefix(need_f: jax.Array, lanes: int
                   ) -> Tuple[jax.Array, jax.Array]:
    """(G, lanes) 0/1 f32 -> (exclusive rank, inclusive row totals
    (G, lanes) whose last column is the total)."""
    incl = need_f
    dshift = 1
    while dshift < lanes:
        incl = incl + _shift_right_zeros(incl, dshift)
        dshift *= 2
    return incl - need_f, incl


def _read_renorm(state, ptr_list, stream_ref, G: int, lanes: int, R):
    """One renorm round: lanes with state < 2^16 read the next stream
    words (per-image pointer) in lane order. The stream is always packed
    in 128-wide rows; the rotation happens at width 128 and slices down
    to `lanes` (reads are consecutive from ptr, and at most lanes <= 128
    of them happen per round)."""
    need = state < tr.RENORM_BASE
    need_f = _to_f32(need)
    rank_f, incl = _ladder_prefix(need_f, lanes)
    win_a, win_b, o_list = [], [], []
    for i in range(G):
        p = ptr_list[i]
        # clamp: a corrupt/padded-junk stream pointer must never read
        # past the block (real pointers satisfy r <= R - 2 because the
        # stream rows carry +2 rows of zero padding)
        r = jnp.minimum(jax.lax.shift_right_logical(p, 7), R - 2)
        # two separate 1-row reads, NOT win2[0:1]/win2[1:2] of one
        # (2, 128) read: the row-1 slice carries sublane offset 1 into
        # the funnel concats, which Mosaic rejects ('result/input offset
        # mismatch on non-concat dimension' — r4 probe log)
        win_a.append(stream_ref[i, pl.ds(r, 1), :].reshape(1, 128))
        win_b.append(stream_ref[i, pl.ds(r + 1, 1), :].reshape(1, 128))
        o_list.append(p)
    a = jnp.concatenate(win_a, axis=0)               # (G, 128)
    b = jnp.concatenate(win_b, axis=0)
    o_col = jnp.stack(o_list).reshape(G, 1) & 0x7F
    win = _funnel_rot(a, b, o_col, 128)[:, :lanes]
    read = _f32_to_u32(_route_monotone_rows(
        _to_f32(win), rank_f, lanes))
    state = jnp.where(need, (state << 16) | read, state)
    new_ptrs = [ptr_list[i] + incl[i, lanes - 1].astype(jnp.int32)
                for i in range(G)]
    return state, new_ptrs


# ---------------------------------------------------------------------------
# decode kernel
# ---------------------------------------------------------------------------


def _decode_kernel(row_ref, tab_ref, stream_ref, states_ref, out_ref,
                   st_scr, ptr_scr, *, G: int, lanes: int, T: int,
                   rows: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        st_scr[...] = states_ref[...]
        for i in range(G):
            ptr_scr[i] = 0

    R = stream_ref.shape[1]
    cols = tab_ref.shape[1] - 128        # bounds width (see _cat_tables)
    upper = jnp.minimum(TC, T - k * TC)
    tab = tab_ref[...]                               # (rows, cols+128) f32

    def read_renorm(state, ptr_list):
        return _read_renorm(state, ptr_list, stream_ref, G, lanes, R)

    def body(t, _):
        row = row_ref[:, pl.ds(t, 1), :].reshape(G, lanes)   # i32
        oh = _to_f32(row[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, (G, lanes, rows), 2))
        fetched = jax.lax.dot_general(
            oh.reshape(G * lanes, rows), tab,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)      # (G*lanes, cols+128)
        fetched = fetched.reshape(G, lanes, cols + 128)
        rowvals = fetched[:, :, :cols]               # (G, lanes, cols)
        # params columns (see _cat_tables): [c, L, k, nseg]
        c_i = fetched[:, :, cols].astype(jnp.int32)
        k_i = fetched[:, :, cols + 2].astype(jnp.int32)
        ks = (16 - k_i).astype(jnp.uint32)

        state = st_scr[...]                          # (G, lanes) u32
        # pop HIGH: h = rank of slot among the row bounds
        slot = state & 0xFFFF
        slot_f = _to_f32(slot)
        is_esc = slot_f >= tr.GAUSS_B
        le = rowvals <= slot_f[..., None]
        h = jnp.sum(_to_f32(le), -1).astype(jnp.int32) - 1
        b0 = jnp.max(jnp.where(le, rowvals, 0.0), -1)
        b1 = jnp.min(jnp.where(le, jnp.float32(65536.0), rowvals), -1)
        start = jnp.where(is_esc, jnp.float32(tr.GAUSS_B), b0)
        freq = jnp.where(is_esc, jnp.float32(65536.0), b1) - start
        h = jnp.where(is_esc, 0, h)
        state = (_f32_to_u32(freq) * (state >> 16)
                 + (slot - _f32_to_u32(start)))
        ptrs = [ptr_scr[i] for i in range(G)]
        state, ptrs = read_renorm(state, ptrs)
        # pop LOW (k uniform bits; k = 0 rows are an exact identity)
        slot2 = state & 0xFFFF
        lowv = (slot2 >> ks).astype(jnp.int32)
        freq_l = jnp.uint32(1) << ks
        state = ((state >> 16) << ks) + (slot2 & (freq_l - 1))
        state, ptrs = read_renorm(state, ptrs)
        st_scr[...] = state
        for i in range(G):
            ptr_scr[i] = ptrs[i]

        sym = (jax.lax.shift_left(h, k_i) | lowv) - c_i
        out_ref[:, pl.ds(t, 1), :] = sym.reshape(G, 1, lanes)
        return 0

    jax.lax.fori_loop(0, upper, body, 0)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _decode_call(row_tl, tab, stream_rows, states, lanes: int, T: int):
    """row_tl (Bp, Tp, lanes) i32, tab (rows, cols+128) f32 (bounds ||
    params || pad),
    stream_rows (Bp, R, 128) u32, states (Bp, lanes) u32 ->
    (Bp, Tp, lanes) i32 symbols."""
    Bp, Tp = row_tl.shape[0], row_tl.shape[1]
    rows = tab.shape[0]
    G = min(Bp, MAX_G)
    assert Bp % G == 0
    R = stream_rows.shape[1]
    NC = Tp // TC

    kern = functools.partial(_decode_kernel, G=G, lanes=lanes, T=T,
                             rows=rows)
    grid = (Bp // G, NC)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, TC, lanes), lambda g, k: (g, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tab.shape, lambda g, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R, 128), lambda g, k: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, lanes), lambda g, k: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, TC, lanes), lambda g, k: (g, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Tp, lanes), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((G, lanes), jnp.uint32),
            pltpu.SMEM((G,), jnp.int32),
        ],
        interpret=_interpret(),
    )(row_tl, tab, stream_rows, states)


# ---------------------------------------------------------------------------
# batch entry point (called from tpu_rans.gauss_decode_batch)
# ---------------------------------------------------------------------------


def _pad_batch(x: jax.Array) -> Tuple[jax.Array, int]:
    B = x.shape[0]
    G = min(B, MAX_G)
    Bp = -(-B // G) * G
    if Bp != B:
        x = jnp.pad(x, [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1))
    return x, Bp


def supported(lanes: int) -> bool:
    """Kernel lane tiers: 128 fills a VPU row; 64/32 (ELIC/Cheng slice
    planes, z-sized planes) run at partial lane occupancy — still far
    cheaper than the XLA scan's per-step loop overhead."""
    return lanes in (32, 64, 128)


_PROBE_OK = None


def _run_outside_trace(body):
    """Run body() on a fresh thread and return its result.

    The probes are reached lazily from the GAUSS_IMPL dispatch, i.e. at
    TRACE TIME of the caller's encode/decode jit (the first compress or
    decompress call). Under omnistaging the probe's own jnp ops would be
    staged into the caller's jaxpr and its np.asarray pulls would see
    tracers (TracerArrayConversionError) — permanently latching the
    probe False and silently disabling the kernels on TPU too. JAX trace
    state is thread-local, so a fresh thread executes the probe eagerly
    on the real backend regardless of any ambient trace.
    (jax.ensure_compile_time_eval is NOT a substitute: it disables
    staging outright, and pallas_call internals such as program_id have
    no eager evaluation rule.)"""
    import threading
    out: dict = {}

    def run():
        try:
            out["v"] = body()
        except BaseException as e:  # noqa: BLE001 — re-raised below
            out["e"] = e

    t = threading.Thread(target=run, name="pallas-rans-probe")
    t.start()
    t.join()
    if "e" in out:
        raise out["e"]
    return out["v"]


def _probe_body() -> bool:
    n, lanes = TC * 128, 128
    rng = np.random.default_rng(0)
    st = np.exp(np.linspace(np.log(0.11), np.log(256.0), 64))
    gt = tr.build_gauss_tables(st)
    idx = rng.integers(0, 64, (1, n)).astype(np.int32)
    sym = np.clip(np.round(rng.normal(0, st[idx])), -30000, 30000
                  ).astype(np.int32)
    # jit both halves: eagerly these are hundreds of per-primitive
    # compiles, each a ~0.4 s round-trip through the axon tunnel (the
    # round-3/4 "probe takes 25 min" failure mode). The XLA encoder is
    # used explicitly as the reference (no nested kernel dispatch).
    enc = jax.jit(jax.vmap(lambda s, i: tr.gauss_encode(s, i, gt, lanes))
                  )(jnp.asarray(sym), jnp.asarray(idx))
    f = tr.frame_plane(
        np.asarray(enc["states"][0]), np.asarray(enc["stream"][0]),
        int(enc["n_renorm"][0]), np.asarray(enc["esc_pos"][0]),
        np.asarray(enc["esc_val"][0]), int(enc["n_esc"][0]))
    _, states, stream, ep, ev = tr.unframe_plane(f, n)
    dec = jax.jit(lambda st_, sb, ib, ep_, ev_: gauss_decode_batch(
        st_, sb, ib, ep_, ev_, gt, lanes, n))(
        jnp.asarray(stream[None]), jnp.asarray(states[None]),
        jnp.asarray(idx), jnp.asarray(ep[None]), jnp.asarray(ev[None]))
    return bool(np.array_equal(np.asarray(dec), sym))


def probe() -> bool:
    """One-shot self-test: encode a tiny plane with the XLA encoder and
    decode it through the REAL kernel; True iff it compiles AND matches
    bit-for-bit. Cached for the process. This is what lets
    GAUSS_IMPL=auto route through the kernel safely on backends where
    Mosaic support hasn't been verified by hand — a compile failure or
    a wrong-lowering mismatch falls back to the XLA scan instead of
    crashing (or worse, corrupting) the serving path."""
    global _PROBE_OK
    if _PROBE_OK is not None:
        return _PROBE_OK
    try:
        _PROBE_OK = _run_outside_trace(_probe_body)
    except Exception as e:  # Mosaic compile/runtime failure -> XLA path
        import warnings
        warnings.warn(f"pallas rANS kernel probe failed ({e!r}); "
                      "falling back to the XLA decode scan")
        _PROBE_OK = False
    return _PROBE_OK


def _cat_tables(gt) -> jax.Array:
    """(rows, cols+128) kernel table: cols 0..cols-1 = bounds row,
    cols..cols+3 = params [c, L, k, nseg] (integer-valued f32), rest
    zero (the params block pads to a full 128-lane tile)."""
    rows = gt.bounds.shape[0]
    pad = jnp.zeros((rows, 128 - 4), jnp.float32)
    return jnp.concatenate([gt.bounds, gt.params, pad], axis=1)


def gauss_decode_batch(stream_b: jax.Array, states_b: jax.Array,
                       idx_b: jax.Array, esc_pos_b: jax.Array,
                       esc_val_b: jax.Array, gt, lanes: int,
                       n: int) -> jax.Array:
    """Pallas decode of (B, S) streams; returns (B, n) i32 symbols."""
    B = idx_b.shape[0]
    T, padded, _ = tr.plane_geometry(n, lanes)
    Tp = -(-T // TC) * TC
    row_tl = jax.vmap(lambda i: tr._to_tl(i.astype(jnp.int32), T, lanes, 0)
                      )(idx_b)
    if Tp != T:
        row_tl = jnp.pad(row_tl, ((0, 0), (0, Tp - T), (0, 0)))

    S = stream_b.shape[1]
    R = -(-S // 128) + 2                  # +2: window read never clamps
    sr = jnp.zeros((B, R * 128), jnp.uint32)
    sr = sr.at[:, :S].set(stream_b.astype(jnp.uint32))
    sr = sr.reshape(B, R, 128)

    row_b, Bp = _pad_batch(row_tl)
    sr_b, _ = _pad_batch(sr)
    st_b, _ = _pad_batch(states_b.astype(jnp.uint32))
    tab = _cat_tables(gt)
    sym = _decode_call(row_b, tab, sr_b, st_b, lanes, T)
    sym_flat = sym[:B, :T].reshape(B, T * lanes)

    def sub(sf, ep, ev):
        return sf.at[ep].set(ev, mode="drop")

    sym_flat = jax.vmap(sub)(sym_flat, esc_pos_b, esc_val_b)
    return sym_flat[:, :n]


# ---------------------------------------------------------------------------
# factorized-prior (EB / z plane) decode kernel
# ---------------------------------------------------------------------------
#
# Same rank-in-row construction as the gaussian kernel, minus the
# gaussian specifics: the EB row tables cover the FULL 65536-slot span
# (the escape/bypass bin is just the row's last bin, overridden from the
# side list after the scan), there are no uniform low bits, and the
# symbol is rank-1 plus the row's offset. Replaces the vmapped XLA scan
# of tpu_rans.rans_decode for supported lane tiers.


def _eb_decode_kernel(row_ref, tab_ref, stream_ref, states_ref, out_ref,
                      st_scr, ptr_scr, *, G: int, lanes: int, T: int,
                      rows: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        st_scr[...] = states_ref[...]
        for i in range(G):
            ptr_scr[i] = 0

    R = stream_ref.shape[1]
    cols = tab_ref.shape[1] - 128        # bounds width (see _eb_tables)
    upper = jnp.minimum(TC, T - k * TC)
    tab = tab_ref[...]                               # (rows, cols+128) f32

    def body(t, _):
        row = row_ref[:, pl.ds(t, 1), :].reshape(G, lanes)   # i32
        oh = _to_f32(row[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, (G, lanes, rows), 2))
        fetched = jax.lax.dot_general(
            oh.reshape(G * lanes, rows), tab,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        fetched = fetched.reshape(G, lanes, cols + 128)
        rowvals = fetched[:, :, :cols]               # CDF bounds, 2^17 pad
        off = fetched[:, :, cols].astype(jnp.int32)  # row offset

        state = st_scr[...]                          # (G, lanes) u32
        slot = state & 0xFFFF
        slot_f = _to_f32(slot)
        le = rowvals <= slot_f[..., None]
        v = jnp.sum(_to_f32(le), -1).astype(jnp.int32) - 1
        start = jnp.max(jnp.where(le, rowvals, 0.0), -1)
        b1 = jnp.min(jnp.where(le, jnp.float32(1 << 17), rowvals), -1)
        freq = b1 - start
        state = (_f32_to_u32(freq) * (state >> 16)
                 + (slot - _f32_to_u32(start)))
        ptrs = [ptr_scr[i] for i in range(G)]
        state, ptrs = _read_renorm(state, ptrs, stream_ref, G, lanes, R)
        st_scr[...] = state
        for i in range(G):
            ptr_scr[i] = ptrs[i]

        out_ref[:, pl.ds(t, 1), :] = (v + off).reshape(G, 1, lanes)
        return 0

    jax.lax.fori_loop(0, upper, body, 0)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _eb_decode_call(row_tl, tab, stream_rows, states, lanes: int, T: int):
    Bp, Tp = row_tl.shape[0], row_tl.shape[1]
    rows = tab.shape[0]
    G = min(Bp, MAX_G)
    assert Bp % G == 0
    R = stream_rows.shape[1]
    NC = Tp // TC

    kern = functools.partial(_eb_decode_kernel, G=G, lanes=lanes, T=T,
                             rows=rows)
    grid = (Bp // G, NC)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, TC, lanes), lambda g, k: (g, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tab.shape, lambda g, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R, 128), lambda g, k: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, lanes), lambda g, k: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, TC, lanes), lambda g, k: (g, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Tp, lanes), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((G, lanes), jnp.uint32),
            pltpu.SMEM((G,), jnp.int32),
        ],
        interpret=_interpret(),
    )(row_tl, tab, stream_rows, states)


def _eb_tables(tables) -> jax.Array:
    """(rows, colsP+128) kernel table: CDF bounds row (2^17-padded to a
    128 multiple) || [offset, 0...] (a full 128-lane params tile)."""
    rows, w = tables.cdf_f32.shape
    colsP = -(-w // 128) * 128
    bounds = jnp.pad(tables.cdf_f32, ((0, 0), (0, colsP - w)),
                     constant_values=float(1 << 17))
    params = jnp.zeros((rows, 128), jnp.float32)
    params = params.at[:, 0].set(tables.off_f32)
    return jnp.concatenate([bounds, params], axis=1)


def eb_decode_batch(stream_b: jax.Array, states_b: jax.Array,
                    idx_b: jax.Array, esc_pos_b: jax.Array,
                    esc_val_b: jax.Array, tables, lanes: int,
                    n: int) -> jax.Array:
    """Pallas decode of (B, S) factorized-prior streams -> (B, n) i32."""
    B = idx_b.shape[0]
    T, padded, _ = tr.plane_geometry(n, lanes)
    Tp = -(-T // TC) * TC
    row_tl = jax.vmap(lambda i: tr._to_tl(i.astype(jnp.int32), T, lanes, 0)
                      )(idx_b)
    if Tp != T:
        row_tl = jnp.pad(row_tl, ((0, 0), (0, Tp - T), (0, 0)))

    S = stream_b.shape[1]
    R = -(-S // 128) + 2
    sr = jnp.zeros((B, R * 128), jnp.uint32)
    sr = sr.at[:, :S].set(stream_b.astype(jnp.uint32))
    sr = sr.reshape(B, R, 128)

    row_b, Bp = _pad_batch(row_tl)
    sr_b, _ = _pad_batch(sr)
    st_b, _ = _pad_batch(states_b.astype(jnp.uint32))
    tab = _eb_tables(tables)
    sym = _eb_decode_call(row_b, tab, sr_b, st_b, lanes, T)
    sym_flat = sym[:B, :T].reshape(B, T * lanes)

    def sub(sf, ep, ev):
        return sf.at[ep].set(ev, mode="drop")

    sym_flat = jax.vmap(sub)(sym_flat, esc_pos_b, esc_val_b)
    return sym_flat[:, :n]


_EB_PROBE_OK = None


def _probe_eb_body() -> bool:
    import types
    n, lanes, C = TC * 32, 32, 8
    rng = np.random.default_rng(0)
    pmf = np.exp(-0.5 * ((np.arange(31) - 15) / 3.0) ** 2)
    freqs = np.maximum(1, np.round(pmf / pmf.sum() * 65000)
                       ).astype(np.int64)
    freqs = np.concatenate([freqs, [65536 - freqs.sum()]])
    bounds = np.concatenate([[0], np.cumsum(freqs)])
    host = types.SimpleNamespace(
        quantized_cdf=np.tile(bounds, (C, 1)).astype(np.int32),
        cdf_length=np.full(C, bounds.size, np.int32),
        offset=np.full(C, -15, np.int32))
    tables = tr.build_device_tables(host)
    idx = rng.integers(0, C, (1, n)).astype(np.int32)
    sym = np.clip(rng.normal(0, 4, (1, n)).round(), -15, 14
                  ).astype(np.int32)
    # jit both halves (see _probe_body: eager per-primitive dispatch
    # through the tunnel costs ~0.4 s per op)
    enc = jax.jit(jax.vmap(lambda s, i: tr.rans_encode(s, i, tables, lanes))
                  )(jnp.asarray(sym), jnp.asarray(idx))
    f = tr.frame_plane(
        np.asarray(enc["states"][0]), np.asarray(enc["stream"][0]),
        int(enc["n_renorm"][0]), np.asarray(enc["esc_pos"][0]),
        np.asarray(enc["esc_val"][0]), int(enc["n_esc"][0]))
    _, states, stream, ep, ev = tr.unframe_plane(f, n)
    dec = jax.jit(lambda st_, sb, ib, ep_, ev_: eb_decode_batch(
        st_, sb, ib, ep_, ev_, tables, lanes, n))(
        jnp.asarray(stream[None]), jnp.asarray(states[None]),
        jnp.asarray(idx), jnp.asarray(ep[None]), jnp.asarray(ev[None]))
    return bool(np.array_equal(np.asarray(dec), sym))


def probe_eb() -> bool:
    """One-shot self-test for the EB kernel (see probe)."""
    global _EB_PROBE_OK
    if _EB_PROBE_OK is not None:
        return _EB_PROBE_OK
    try:
        _EB_PROBE_OK = _run_outside_trace(_probe_eb_body)
    except Exception as e:  # Mosaic compile/runtime failure -> XLA path
        import warnings
        warnings.warn(f"pallas EB rANS kernel probe failed ({e!r}); "
                      "falling back to the XLA decode scan")
        _EB_PROBE_OK = False
    return _EB_PROBE_OK


# ---------------------------------------------------------------------------
# encode kernel (reverse scan + in-kernel backward stream compaction)
# ---------------------------------------------------------------------------
#
# The XLA encode path is: reverse lax.scan (pays the ~11 us/step loop
# overhead) + a whole-plane masked compaction of the (T, 2, lanes) emit
# buffer (jnp.nonzero: the profiled 4x 5.15 ms/image encode floor;
# masked_compact: dense but still a 20-level merge tree). This kernel
# does both AT ONCE: it scans time in reverse and writes each step's
# renorm words DIRECTLY into their final stream positions, backwards
# from the end of the buffer (the stream is read forward by the
# decoder, so reverse-scan emissions fill it back-to-front in exactly
# decode-read order). No post-scan compaction exists at all.
#
# Per sub-step (low push, then high push — the decoder pops high first):
# masked emit words are scattered to the front in lane order (exact
# one-hot sum over a (lanes, lanes) rank match), rotated to the write
# offset across a 2x128-row window (funnel shifts), and accumulated
# into the resident output rows — safe because positions >= wp were
# written by LATER stream positions only and positions < wp-count are
# still zero.
#
# One kernel serves BOTH coder families: the factorized-prior (EB) path
# is the gaussian path with k = 0 (the low push degenerates to an exact
# identity that never emits).


def _scatter_front(x: jax.Array, rank_f: jax.Array, need_f: jax.Array,
                   lanes: int) -> jax.Array:
    """out[g, p] = x[g, j] where j is the p-th masked lane (exact:
    one contributor per position, one-hot sum)."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lanes), 2
                                   ).astype(jnp.float32)
    oh = jnp.where(rank_f[:, :, None] == pos, need_f[:, :, None],
                   jnp.float32(0.0))
    return jnp.sum(oh * x[:, :, None], axis=1)       # (G, lanes)


def _rot_right_2rows(x: jax.Array, off_s: jax.Array) -> jax.Array:
    """(1, 128) front-aligned words -> (2, 128) window with the words
    moved to positions [off, off+count) of the flattened 256 window
    (zero fill elsewhere). off: dynamic SCALAR in [0, 128).

    One hardware lane-rotate + two masked selects (pltpu.roll replaces
    the former 7-round funnel, which also tripped Mosaic's layout rules
    on sublane-offset row slices at batch shapes — r4 bench log)."""
    r = pltpu.roll(x, off_s, axis=1)     # r[0, p] = x[0, (p - off) % 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    row0 = jnp.where(lane >= off_s, r, jnp.zeros_like(r))
    row1 = jnp.where(lane < off_s, r, jnp.zeros_like(r))
    return jnp.concatenate([row0, row1], axis=0)     # (2, 128)


def _encode_kernel(start_ref, freq_ref, rcp_ref, low_ref, ks_ref,
                   stream_ref, states_ref, wp_ref,
                   st_scr, wp_scr, fr_scr, *, G: int, lanes: int, T: int,
                   cap: int, NC: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        st_scr[...] = jnp.full((G, lanes), tr.RENORM_BASE, jnp.uint32)
        for i in range(G):
            wp_scr[i] = cap
        stream_ref[...] = jnp.zeros(stream_ref.shape, jnp.uint32)

    c = NC - 1 - k                       # time chunk, processed newest-first
    length = jnp.minimum(TC, T - c * TC)

    def write_words(emit, need, wp_list):
        """Place this sub-step's masked emit words at [wp-count, wp) of
        each image's stream (backwards fill; see module comment)."""
        need_f = _to_f32(need)
        rank_f, incl = _ladder_prefix(need_f, lanes)
        front = _scatter_front(_to_f32(emit), rank_f, need_f,
                               lanes)                 # (G, lanes) f32
        if lanes < 128:
            front = jnp.concatenate(
                [front, jnp.zeros((G, 128 - lanes), front.dtype)], axis=1)
        # round-trip through VMEM scratch: a register row slice
        # front[i:i+1] carries sublane offset i for i > 0, which Mosaic
        # rejects downstream ('result/input offset mismatch' at batch
        # shapes); a memory read of row i is always offset-0.
        fr_scr[...] = front.reshape(G, 1, 128)
        Rbuf = stream_ref.shape[1]
        new_wps = []
        for i in range(G):
            cnt = incl[i, lanes - 1].astype(jnp.int32)
            w0 = wp_list[i] - cnt
            # clamp BOTH ends: w0 < 0 is stream overflow (garbage words,
            # caught at framing); w0 == cap with cnt == 0 (every sub-step
            # before the first renorm word) lands row0 on Rbuf - 1 whose
            # 2-row window would touch row Rbuf — out of bounds on the
            # Mosaic path (interpret mode clamps silently). The emitted
            # words are all zero whenever the clamp binds, so adding
            # them to the clamped window is exact.
            row0 = jnp.clip(w0 >> 7, 0, Rbuf - 2)
            front_i = fr_scr[i, :, :].reshape(1, 128)
            placed = _rot_right_2rows(front_i, w0 & 0x7F)   # (2, 128)
            cur = stream_ref[i, pl.ds(row0, 2), :]
            stream_ref[i, pl.ds(row0, 2), :] = (
                cur.reshape(2, 128) + _f32_to_u32(placed))
            new_wps.append(w0)
        return new_wps

    def body(it, _):
        t = length - 1 - it
        start = start_ref[:, pl.ds(t, 1), :].reshape(G, lanes)
        freq = freq_ref[:, pl.ds(t, 1), :].reshape(G, lanes)
        rcp = rcp_ref[:, pl.ds(t, 1), :].reshape(G, lanes)
        low = low_ref[:, pl.ds(t, 1), :].reshape(G, lanes)
        ks = ks_ref[:, pl.ds(t, 1), :].reshape(G, lanes)

        state = st_scr[...]
        wps = [wp_scr[i] for i in range(G)]
        # push LOW first (decoder pops high then low; backward writing
        # emits low's words first = the later stream positions)
        freq_l = jnp.uint32(1) << ks
        emit_l = (state & 0xFFFF).astype(jnp.uint32)
        need_l = (state >> 16) >= freq_l
        state = jnp.where(need_l, state >> 16, state)
        state = ((state >> ks) << 16) + (low << ks) + (state & (freq_l - 1))
        wps = write_words(emit_l, need_l, wps)
        # push HIGH (exact limb division)
        emit_h = (state & 0xFFFF).astype(jnp.uint32)
        need_h = (state >> 16) >= freq
        state = jnp.where(need_h, state >> 16, state)
        q, r = tr._div_u32_by_u16(state, freq, rcp)
        state = (q << 16) + r + start
        wps = write_words(emit_h, need_h, wps)

        st_scr[...] = state
        for i in range(G):
            wp_scr[i] = wps[i]
        return 0

    jax.lax.fori_loop(0, length, body, 0)

    @pl.when(k == NC - 1)
    def _():
        states_ref[...] = st_scr[...]
        wp_col = jnp.stack([wp_scr[i] for i in range(G)]).reshape(G, 1)
        wp_ref[...] = jnp.broadcast_to(wp_col, wp_ref.shape)


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _encode_call(start, freq, rcp, low, ks, lanes: int, cap: int,
                 T: int):
    """All inputs (Bp, Tp, lanes), real scan length T <= Tp (the padded
    time rows are never processed); returns (stream_rows (Bp, Rbuf, 128)
    u32 back-filled from flat position wp, states (Bp, lanes) u32,
    wp (Bp,) i32)."""
    Bp, Tp = start.shape[0], start.shape[1]
    G = min(Bp, MAX_G)
    assert Bp % G == 0 and Tp % TC == 0 and T <= Tp
    NC = Tp // TC
    Rbuf = -(-cap // 128) + 1

    kern = functools.partial(_encode_kernel, G=G, lanes=lanes, T=T,
                             cap=cap, NC=NC)
    grid = (Bp // G, NC)
    xspec = pl.BlockSpec((G, TC, lanes), lambda g, k: (g, NC - 1 - k, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[xspec] * 5,
        out_specs=[
            pl.BlockSpec((G, Rbuf, 128), lambda g, k: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, lanes), lambda g, k: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 128), lambda g, k: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Rbuf, 128), jnp.uint32),
            jax.ShapeDtypeStruct((Bp, lanes), jnp.uint32),
            jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, lanes), jnp.uint32),
            pltpu.SMEM((G,), jnp.int32),
            pltpu.VMEM((G, 1, 128), jnp.float32),
        ],
        interpret=_interpret(),
    )(start, freq, rcp, low, ks)
    return out[0], out[1], out[2][:, 0]


def _finish_encode(stream_rows, states, wp, esc_flat_b, sym_flat_b,
                   cap: int, padded: int):
    """Kernel outputs -> the XLA encode dict contract (stream aligned to
    offset 0, zero-filled past n_renorm; escapes via the COMPACT_MODE
    path — they are scan-independent bulk work)."""
    B = stream_rows.shape[0]
    n_renorm = (cap - wp).astype(jnp.int32)
    flat = stream_rows.reshape(B, -1)
    flat = jnp.concatenate(
        [flat, jnp.zeros((B, cap), jnp.uint32)], axis=1)
    stream = jax.vmap(lambda f, w: jax.lax.dynamic_slice(
        f, (w,), (cap,)))(flat, jnp.maximum(wp, 0))
    iota = jnp.arange(cap, dtype=jnp.int32)[None, :]
    stream = jnp.where(iota < n_renorm[:, None], stream, 0
                       ).astype(jnp.uint16)

    def esc_of(esc_flat, sym_flat):
        if tr.COMPACT_MODE == "merge":
            esc_pos, esc_val, n_esc = tr.escape_compact(
                sym_flat, esc_flat, fill_pos=padded)
        else:
            (esc_pos,) = jnp.nonzero(esc_flat, size=tr.ESC_MAX,
                                     fill_value=padded)
            esc_val = jnp.take(sym_flat, esc_pos, mode="clip")
            n_esc = jnp.sum(esc_flat).astype(jnp.int32)
        return esc_pos.astype(jnp.int32), esc_val, n_esc

    esc_pos, esc_val, n_esc = jax.vmap(esc_of)(esc_flat_b, sym_flat_b)
    return {"states": states, "stream": stream, "n_renorm": n_renorm,
            "esc_pos": esc_pos, "esc_val": esc_val, "n_esc": n_esc}


def _pad_time(x, Tp):
    T = x.shape[1]
    if Tp == T:
        return x
    return jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))


def _gauss_args(sym_b: jax.Array, idx_b: jax.Array, gt, lanes: int):
    """Gaussian-plane kernel inputs: ((start, freq, rcp, low, ks) each
    (B, T, lanes), esc, sym_flat, cap, padded, T) — the exact arrays the
    XLA scan consumes, so both lowerings share one wire by construction."""
    B, n = sym_b.shape
    T, padded, _ = tr.plane_geometry(n, lanes)
    cap = tr.stream_cap(n, lanes, words=2)
    sym_tl = jax.vmap(
        lambda s: tr._to_tl(s.astype(jnp.int32), T, lanes, 0))(sym_b)
    idx_tl = jax.vmap(
        lambda i: tr._to_tl(i.astype(jnp.int32), T, lanes, 0))(idx_b)
    start, freq, low, ks, esc = jax.vmap(
        lambda s, i: tr._gauss_split(s.reshape(-1), i.reshape(-1), gt)
    )(sym_tl, idx_tl)
    rcp = 1.0 / freq
    args = [a.reshape(B, T, lanes) for a in (
        start.astype(jnp.uint32), freq.astype(jnp.uint32), rcp,
        low.astype(jnp.uint32), ks.astype(jnp.uint32))]
    return args, esc, sym_tl.reshape(B, -1), cap, padded, T


def _eb_args(sym_b: jax.Array, idx_b: jax.Array, tables, lanes: int):
    """Factorized-prior kernel inputs (the low push degenerates to the
    exact identity at ks = 16, low = 0); same contract as _gauss_args."""
    B, n = sym_b.shape
    T, padded, _ = tr.plane_geometry(n, lanes)
    cap = tr.stream_cap(n, lanes)
    sym_tl = jax.vmap(lambda s: tr._to_tl(
        s.astype(jnp.int32), T, lanes, tables.pad_symbol))(sym_b)
    idx_tl = jax.vmap(
        lambda i: tr._to_tl(i.astype(jnp.int32), T, lanes, 0))(idx_b)
    start, freq, esc = jax.vmap(
        lambda s, i: tr._eb_split(s.reshape(-1), i.reshape(-1), tables)
    )(sym_tl, idx_tl)
    rcp = 1.0 / freq
    zero = jnp.zeros((B, T, lanes), jnp.uint32)
    args = [a.reshape(B, T, lanes) for a in (
        start.astype(jnp.uint32), freq.astype(jnp.uint32), rcp)]
    args += [zero, jnp.full((B, T, lanes), 16, jnp.uint32)]
    return args, esc, sym_tl.reshape(B, -1), cap, padded, T


def gauss_encode_batch(sym_b: jax.Array, idx_b: jax.Array, gt,
                       lanes: int):
    """Kernel-backed batched gaussian encode; bit-identical output dict
    to the XLA path (same bulk splits, same wire)."""
    B = sym_b.shape[0]
    args, esc, sym_flat, cap, padded, T = _gauss_args(sym_b, idx_b, gt,
                                                      lanes)
    Tp = -(-T // TC) * TC
    args = [_pad_time(a, Tp) for a in args]
    args, Bp = zip(*[_pad_batch(a) for a in args])
    stream_rows, states, wp = _encode_call(*args, lanes, cap, T)
    return _finish_encode(stream_rows[:B], states[:B], wp[:B],
                          esc, sym_flat, cap, padded)


def eb_encode_batch(sym_b: jax.Array, idx_b: jax.Array, tables,
                    lanes: int):
    """Kernel-backed batched factorized-prior encode; bit-identical
    output dict to the vmapped tr.rans_encode."""
    B = sym_b.shape[0]
    args, esc, sym_flat, cap, padded, T = _eb_args(sym_b, idx_b, tables,
                                                   lanes)
    Tp = -(-T // TC) * TC
    args = [_pad_time(a, Tp) for a in args]
    args, _ = zip(*[_pad_batch(a) for a in args])
    stream_rows, states, wp = _encode_call(*args, lanes, cap, T)
    return _finish_encode(stream_rows[:B], states[:B], wp[:B],
                          esc, sym_flat, cap, padded)


def _identity_args(shape):
    """Kernel inputs whose encode step is an EXACT no-op: freq = 2^16
    makes the high push's renorm test (state >> 16 >= freq) always
    false and its state update (q << 16) + r + 0 == state (the limb
    division is exact at freq = 2^16: rcp = 2^-16 is a power of two and
    every partial remainder < 2^24 — see tr._div_u32_by_u16); ks = 16,
    low = 0 makes the low push the same identity. Zero renorm words,
    state untouched — so rows padded with these steps produce wire
    bytes IDENTICAL to an unpadded encode of the same row."""
    return (jnp.zeros(shape, jnp.uint32),
            jnp.full(shape, 65536, jnp.uint32),
            jnp.full(shape, np.float32(1.0 / 65536.0), jnp.float32),
            jnp.zeros(shape, jnp.uint32),
            jnp.full(shape, 16, jnp.uint32))


def fused_encode_batch(planes):
    """Encode several (possibly ragged) planes in ONE kernel launch.

    planes: sequence of ("gauss", sym_b, idx_b, gauss_tables, lanes) or
    ("eb", sym_b, idx_b, eb_tables, lanes) with sym_b/idx_b (B_i, n_i).
    Returns one enc dict per plane, each BIT-IDENTICAL to the separate
    gauss_encode_batch / eb_encode_batch output (same per-plane lanes,
    caps, escapes, overflow semantics).

    Why: the encode scan's cost is its sequential grid-step count, and
    batch rows ride VPU sublanes in lockstep (B=1 -> B=8 is 40.7 ->
    73.1 ms for 8x the symbols, matched_r4/pallas_ab2.log). Encoding an
    image's z / y-anchor / y-nonanchor planes as three calls pays the
    step latency three times; stacking them as rows of one call pays it
    once. Ragged shapes are reconciled with identity steps
    (_identity_args): planes shorter in time are padded up to the
    longest plane's T, and planes with fewer lanes occupy the low lanes
    with identity steps above — both padings emit zero renorm words and
    leave lane order, states, and stream bytes unchanged."""
    specs = []
    for kind, sym_b, idx_b, tab, lanes in planes:
        build = _gauss_args if kind == "gauss" else _eb_args
        args, esc, sym_flat, cap, padded, T = build(sym_b, idx_b, tab,
                                                    lanes)
        specs.append(dict(args=args, esc=esc, sym=sym_flat, cap=cap,
                          padded=padded, T=T, lanes=lanes,
                          B=sym_b.shape[0]))
    L = max(sp["lanes"] for sp in specs)
    T_max = max(sp["T"] for sp in specs)
    Tp = -(-T_max // TC) * TC
    cap = max(sp["cap"] for sp in specs)

    rows = []
    for sp in specs:
        a, B, T, lanes = sp["args"], sp["B"], sp["T"], sp["lanes"]
        if lanes < L:
            ident = _identity_args((B, T, L - lanes))
            a = [jnp.concatenate([x, iv], axis=2)
                 for x, iv in zip(a, ident)]
        if T < T_max:
            ident = _identity_args((B, T_max - T, L))
            a = [jnp.concatenate([x, iv], axis=1)
                 for x, iv in zip(a, ident)]
        rows.append(a)
    cat = [jnp.concatenate([r[j] for r in rows], axis=0) for j in range(5)]
    B_tot = cat[0].shape[0]
    # pad the row count to a power of two (<= MAX_G per grid step) with
    # IDENTITY rows: a 3-row fused call hung the Mosaic backend on-chip
    # (odd sublane grouping), and _pad_batch's zero rows would put
    # freq = 0 / rcp = inf through the limb division — identity rows are
    # well-defined no-ops that cost one lockstep sublane
    Bp = 1
    while Bp < B_tot:
        Bp *= 2
    Bp = -(-B_tot // min(B_tot, MAX_G)) * min(B_tot, MAX_G) if Bp > MAX_G \
        else Bp
    if Bp != B_tot:
        ident = _identity_args((Bp - B_tot, cat[0].shape[1], L))
        cat = [jnp.concatenate([x, iv], axis=0)
               for x, iv in zip(cat, ident)]
    args = [_pad_time(x, Tp) for x in cat]
    stream_rows, states, wp = _encode_call(*args, L, cap, T_max)

    outs, off = [], 0
    for sp in specs:
        B = sp["B"]
        enc = _finish_encode(stream_rows[off:off + B],
                             states[off:off + B, :sp["lanes"]],
                             wp[off:off + B], sp["esc"], sp["sym"],
                             cap, sp["padded"])
        if sp["cap"] < cap:
            # preserve the separate call's host-fallback semantics: a
            # plane whose renorm words exceed ITS OWN cap must still
            # raise OverflowError at framing (n_renorm > stream length)
            enc["stream"] = enc["stream"][:, :sp["cap"]]
        outs.append(enc)
        off += B
    return outs


_ENC_PROBE_OK = None


def _probe_enc_body() -> bool:
    n, lanes = TC * 128 + 1000, 128   # partial last chunk on purpose
    rng = np.random.default_rng(0)
    st = np.exp(np.linspace(np.log(0.11), np.log(256.0), 64))
    gt = tr.build_gauss_tables(st)
    idx = rng.integers(0, 64, (2, n)).astype(np.int32)
    sym = np.clip(np.round(rng.normal(0, st[idx])), -30000, 30000
                  ).astype(np.int32)
    sym[0, :2] = [31000, -31000]
    # jit both paths (see _probe_body on eager tunnel dispatch cost)
    ref = jax.jit(jax.vmap(lambda s, i: tr.gauss_encode(s, i, gt, lanes))
                  )(jnp.asarray(sym), jnp.asarray(idx))
    out = jax.jit(lambda s, i: gauss_encode_batch(s, i, gt, lanes)
                  )(jnp.asarray(sym), jnp.asarray(idx))
    return all(
        np.array_equal(np.asarray(ref[k]), np.asarray(out[k]))
        for k in ("states", "stream", "n_renorm", "esc_pos",
                  "esc_val", "n_esc"))


def probe_enc() -> bool:
    """One-shot self-test for the encode kernel: the full output dict
    must match the XLA scan bit-for-bit on a tiny plane."""
    global _ENC_PROBE_OK
    if _ENC_PROBE_OK is not None:
        return _ENC_PROBE_OK
    try:
        _ENC_PROBE_OK = _run_outside_trace(_probe_enc_body)
    except Exception as e:  # Mosaic compile/runtime failure -> XLA path
        import warnings
        warnings.warn(f"pallas rANS encode kernel probe failed ({e!r}); "
                      "falling back to the XLA encode scan")
        _ENC_PROBE_OK = False
    return _ENC_PROBE_OK
