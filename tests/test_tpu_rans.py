"""TPU-side lane-parallel rANS: roundtrip, rate, escapes, framing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyres_tpu.coding import tpu_rans
from hyres_tpu.entropy import build_gaussian_tables, get_scale_table
from hyres_tpu.entropy.bottleneck import CdfTables


@pytest.fixture(scope="module")
def gauss_tables():
    host = build_gaussian_tables(get_scale_table())
    return host, tpu_rans.build_device_tables(host)


def _roundtrip(sym, idx, dev, lanes):
    enc = jax.jit(tpu_rans.rans_encode, static_argnums=(3,))(
        jnp.asarray(sym), jnp.asarray(idx), dev, lanes)
    data = tpu_rans.frame_plane(
        np.asarray(enc["states"]), np.asarray(enc["stream"]),
        int(enc["n_renorm"]), np.asarray(enc["esc_pos"]),
        np.asarray(enc["esc_val"]), int(enc["n_esc"]))
    lanes2, states, stream, esc_pos, esc_val = tpu_rans.unframe_plane(
        data, sym.size)
    assert lanes2 == lanes
    got = jax.jit(tpu_rans.rans_decode, static_argnums=(6, 7))(
        jnp.asarray(stream), jnp.asarray(states), jnp.asarray(idx),
        jnp.asarray(esc_pos), jnp.asarray(esc_val), dev, lanes, sym.size)
    return np.asarray(got), data


def test_roundtrip_gaussian_symbols(gauss_tables):
    host, dev = gauss_tables
    rng = np.random.default_rng(0)
    n = 10000
    idx = rng.integers(0, 64, n).astype(np.int32)
    sigma = np.asarray(get_scale_table())[idx]
    sym = np.round(rng.normal(0, sigma)).astype(np.int32)
    got, data = _roundtrip(sym, idx, dev, lanes=64)
    np.testing.assert_array_equal(got, sym)

    # rate sanity: close to the entropy of the quantized-CDF model
    bits = sum(-np.log2(_freq(host, idx[i], sym[i]) / 65536.0)
               for i in range(n))
    overhead = 64 * 4 + 6  # states + header
    assert len(data) <= bits / 8 * 1.02 + overhead + 16


def _freq(host, row, value):
    cdf = host.quantized_cdf[row]
    L = host.cdf_length[row]
    v = value - host.offset[row]
    v = np.clip(v, 0, L - 2)  # escape bin for out-of-range
    return max(int(cdf[v + 1] - cdf[v]), 1)


def test_roundtrip_with_escapes(gauss_tables):
    """Out-of-support symbols survive via the side list."""
    _, dev = gauss_tables
    rng = np.random.default_rng(1)
    n = 4096
    idx = np.zeros(n, np.int32)  # sigma=0.11: support is tiny
    sym = np.round(rng.normal(0, 0.11, n)).astype(np.int32)
    hot = rng.choice(n, 20, replace=False)
    sym[hot] = rng.integers(-30000, 30000, 20)  # way out of support
    got, _ = _roundtrip(sym, idx, dev, lanes=64)
    np.testing.assert_array_equal(got, sym)


def test_escape_overflow_raises(gauss_tables):
    _, dev = gauss_tables
    n = 1024
    idx = np.zeros(n, np.int32)
    sym = np.full(n, 20000, np.int32)  # every symbol escapes
    enc = tpu_rans.rans_encode(jnp.asarray(sym), jnp.asarray(idx), dev, 64)
    with pytest.raises(OverflowError):
        tpu_rans.frame_plane(
            np.asarray(enc["states"]), np.asarray(enc["stream"]),
            int(enc["n_renorm"]), np.asarray(enc["esc_pos"]),
            np.asarray(enc["esc_val"]), int(enc["n_esc"]))


def test_roundtrip_eb_channel_tables():
    """Per-channel factorized-prior tables work through the same kernel."""
    rng = np.random.default_rng(2)
    C, L = 8, 12
    pmf = rng.random((C, L)).astype(np.float64)
    pmf /= pmf.sum(1, keepdims=True)
    from hyres_tpu.coding.cdf import pmf_to_quantized_cdf

    # append the escape/tail bin like the real table bakers do
    rows = [pmf_to_quantized_cdf(np.append(p * (1 - 1e-6), 1e-6), 16)
            for p in pmf]
    maxlen = max(len(r) for r in rows)
    cdf = np.zeros((C, maxlen), np.int32)
    for i, r in enumerate(rows):
        cdf[i, : len(r)] = r
    host = CdfTables(quantized_cdf=cdf,
                     cdf_length=np.array([len(r) for r in rows], np.int32),
                     offset=np.full(C, -(L // 2), np.int32))
    dev = tpu_rans.build_device_tables(host)

    n = 5000
    idx = rng.integers(0, C, n).astype(np.int32)
    sym = (rng.integers(0, L, n) - L // 2).astype(np.int32)
    got, _ = _roundtrip(sym, idx, dev, lanes=32)
    np.testing.assert_array_equal(got, sym)


def test_various_lane_counts_and_sizes(gauss_tables):
    _, dev = gauss_tables
    rng = np.random.default_rng(3)
    for lanes in (32, 256):
        for n in (31, 257, 4096, 7777):
            idx = rng.integers(0, 64, n).astype(np.int32)
            sigma = np.asarray(get_scale_table())[idx]
            sym = np.round(rng.normal(0, sigma)).astype(np.int32)
            got, _ = _roundtrip(sym, idx, dev, lanes)
            np.testing.assert_array_equal(got, sym)


def test_limb_division_exact():
    """_div_u32_by_u16 must be exact for every (u32, u16) pair class —
    the rANS push desyncs on any off-by-one."""
    import jax.numpy as jnp

    from hyres_tpu.coding.tpu_rans import _div_u32_by_u16

    rng = np.random.default_rng(11)
    state = rng.integers(0, 1 << 32, 200000, dtype=np.uint64).astype(np.uint32)
    freq = rng.integers(1, 1 << 16, 200000, dtype=np.uint32)
    # adversarial corners
    state[:6] = [0, 1, 0xFFFFFFFF, 0x10000, 0xFFFF, 0x80000000]
    freq[:6] = [1, 1, 1, 0xFFFF, 2, 3]
    q, r = jax.jit(_div_u32_by_u16)(
        jnp.asarray(state), jnp.asarray(freq),
        1.0 / jnp.asarray(freq).astype(jnp.float32))
    want_q = (state.astype(np.uint64) // freq).astype(np.uint32)
    want_r = (state.astype(np.uint64) % freq).astype(np.uint32)
    np.testing.assert_array_equal(np.asarray(q), want_q)
    np.testing.assert_array_equal(np.asarray(r), want_r)


def test_onehot_lookup_exact(gauss_tables):
    """The one-hot f32 matmul lookups must equal direct indexing for
    EVERY (row, bin) — any rounding desyncs the coder."""
    import jax.numpy as jnp

    from hyres_tpu.coding import tpu_rans

    host, dev = gauss_tables
    rows, L = dev.cdf.shape
    idx = np.repeat(np.arange(rows), L).astype(np.int32)
    bins = np.tile(np.arange(L), rows).astype(np.float32)

    A = tpu_rans._row_onehot(jnp.asarray(idx), rows)
    np.testing.assert_array_equal(
        np.asarray(tpu_rans._lookup(A, dev.off_f32)),
        np.asarray(dev.offset, np.float32)[idx])
    binoh = (jnp.asarray(bins)[:, None] ==
             jnp.arange(L, dtype=jnp.float32)).astype(jnp.float32)
    start = np.asarray(jnp.sum(tpu_rans._lookup(A, dev.start_f32) * binoh, -1))
    freq = np.asarray(jnp.sum(tpu_rans._lookup(A, dev.freq_f32) * binoh, -1))
    np.testing.assert_array_equal(
        start, np.asarray(dev.start_f32).reshape(-1))
    np.testing.assert_array_equal(
        freq, np.asarray(dev.freq_f32).reshape(-1))
    # CDF-bounds symbol recovery: every in-row slot maps to its bin
    cdf = np.asarray(host.quantized_cdf, np.int64)
    lengths = np.asarray(host.cdf_length)
    r = rows // 2
    slots = np.arange(0, 1 << 16, 97, dtype=np.int64)
    want = np.searchsorted(cdf[r, : lengths[r]], slots, side="right") - 1
    Ar = tpu_rans._row_onehot(jnp.full((len(slots),), r, jnp.int32), rows)
    bounds = tpu_rans._lookup(Ar, dev.cdf_f32)
    got = np.asarray(jnp.sum(
        (bounds <= jnp.asarray(slots, jnp.float32)[:, None]).astype(
            jnp.float32), -1) - 1.0)
    np.testing.assert_array_equal(got, want.astype(np.float32))


def test_escape_count_exactly_256_overflows(gauss_tables):
    """n_esc == 256 fits the side list but NOT the one-byte header field:
    it must raise OverflowError (host-coder fallback), never ValueError
    (ADVICE r2, frame_plane header)."""
    _, dev = gauss_tables
    n = 4096
    idx = np.zeros(n, np.int32)
    sym = np.zeros(n, np.int32)
    sym[:256] = 20000  # exactly 256 escapes
    enc = tpu_rans.rans_encode(jnp.asarray(sym), jnp.asarray(idx), dev, 64)
    assert int(enc["n_esc"]) == 256
    with pytest.raises(OverflowError):
        tpu_rans.frame_plane(
            np.asarray(enc["states"]), np.asarray(enc["stream"]),
            int(enc["n_renorm"]), np.asarray(enc["esc_pos"]),
            np.asarray(enc["esc_val"]), int(enc["n_esc"]))


def test_escape_value_beyond_i16_overflows():
    """Escape values are framed as i16; wider values must raise
    OverflowError at framing, not silently truncate (ADVICE r2)."""
    states = np.full(4, 1 << 16, np.uint32)
    stream = np.zeros(16, np.uint16)
    esc_pos = np.array([0], np.int32)
    esc_val = np.array([40000], np.int32)
    with pytest.raises(OverflowError):
        tpu_rans.frame_plane(states, stream, 0, esc_pos, esc_val, 1)


# ---------------------------------------------------------------------------
# segment-table gaussian coder (v2)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gt():
    from hyres_tpu.entropy import get_scale_table
    return tpu_rans.build_gauss_tables(get_scale_table())


def _gt_roundtrip(sym, idx, gt, lanes):
    enc = jax.jit(tpu_rans.gauss_encode, static_argnums=(3,))(
        jnp.asarray(sym), jnp.asarray(idx), gt, lanes)
    data = tpu_rans.frame_plane(
        np.asarray(enc["states"]), np.asarray(enc["stream"]),
        int(enc["n_renorm"]), np.asarray(enc["esc_pos"]),
        np.asarray(enc["esc_val"]), int(enc["n_esc"]))
    lanes2, states, stream, esc_pos, esc_val = tpu_rans.unframe_plane(
        data, sym.size)
    assert lanes2 == lanes
    got = jax.jit(tpu_rans.gauss_decode, static_argnums=(6, 7))(
        jnp.asarray(stream), jnp.asarray(states), jnp.asarray(idx),
        jnp.asarray(esc_pos), jnp.asarray(esc_val), gt, lanes, sym.size)
    return np.asarray(got), data


def test_gauss_tables_valid(gt):
    """Host-built tables are a valid coding contract: per row, bounds
    strictly increase from 0 to GAUSS_B over nseg segments (every
    segment >= 1 slot), padding is 65536, k/nseg consistent with L."""
    B = np.asarray(gt.bounds)
    P = np.asarray(gt.params)
    for r in range(B.shape[0]):
        c, L, k, nseg = (int(x) for x in P[r])
        assert nseg == -(-L // (1 << k)) and nseg <= 127
        assert L == 2 * c + 1
        brow = B[r, : nseg + 1]
        assert brow[0] == 0.0 and brow[nseg] == tpu_rans.GAUSS_B
        assert np.all(np.diff(brow) >= 1.0), f"row {r} zero-width segment"
        assert np.all(B[r, nseg + 1:] == 65536.0)


def test_gauss_roundtrip(gt):
    from hyres_tpu.entropy import get_scale_table
    rng = np.random.default_rng(0)
    n = 20000
    idx = rng.integers(0, 64, n).astype(np.int32)
    sigma = np.asarray(get_scale_table())[idx]
    sym = np.round(rng.normal(0, sigma)).astype(np.int32)
    got, data = _gt_roundtrip(sym, idx, gt, lanes=64)
    np.testing.assert_array_equal(got, sym)
    # rate sanity: within a few % of the gaussian entropy
    ent_bits = float(np.sum(0.5 * np.log2(2 * np.pi * np.e * sigma**2).clip(1)))
    assert len(data) * 8 <= ent_bits * 1.06 + (64 * 4 + 6) * 8


def test_gauss_roundtrip_wide_sigmas(gt):
    """REGRESSION: the round-3 analytic-erf coder corrupted planes with
    wide trained stats (context-dependent f32 transcendental rounding,
    see the design note in coding/tpu_rans.py). v2 must roundtrip any
    scale mix bit-exactly, escapes included."""
    from hyres_tpu.entropy import get_scale_table
    rng = np.random.default_rng(2)
    st = np.asarray(get_scale_table())
    n = 20000
    idx = rng.integers(5, 64, n).astype(np.int32)
    sym = np.clip(np.round(rng.normal(0, st[idx], n)),
                  -30000, 30000).astype(np.int32)
    sym[:5] = [31000, -31000, 29000, -29000, 28000]
    idx[:5] = 5
    got, _ = _gt_roundtrip(sym, idx, gt, lanes=128)
    np.testing.assert_array_equal(got, sym)


def test_gauss_support_edges_roundtrip(gt):
    """Every row's extreme in-support bins and just-outside (escape)
    values roundtrip exactly."""
    from hyres_tpu.entropy import get_scale_table
    st = np.asarray(get_scale_table(), np.float64)
    c = np.ceil(tpu_rans.SUPPORT_SIGMAS * st).astype(np.int64)
    rows = []
    for r in range(64):
        for s in (-c[r], -c[r] + 1, -1, 0, 1, c[r] - 1, c[r],
                  c[r] + 1, -c[r] - 1):  # last two escape
            rows.append((r, s))
    idx = np.array([r for r, _ in rows], np.int32)
    sym = np.array([s for _, s in rows], np.int32)
    got, _ = _gt_roundtrip(sym, idx, gt, lanes=32)
    np.testing.assert_array_equal(got, sym)


def _numpy_gauss_encode(sym, idx, gt, lanes):
    """Exact-integer reference encoder (u64 arithmetic, host tables).

    THE exactness contract: the jitted encoder must reproduce this wire
    BIT-FOR-BIT — v2's design guarantee is that no device-side coding
    quantity depends on context-sensitive f32 rounding (the round-3
    analytic coder failed exactly this check at wide sigmas)."""
    B = np.asarray(gt.bounds).astype(np.int64)
    P = np.asarray(gt.params).astype(np.int64)
    n = sym.size
    T = -(-n // lanes)
    sym_tl = np.zeros(T * lanes, np.int64)
    sym_tl[:n] = sym
    idx_tl = np.zeros(T * lanes, np.int64)
    idx_tl[:n] = idx
    c, L, k = P[idx_tl, 0], P[idx_tl, 1], P[idx_tl, 2]
    v = sym_tl + c
    esc = (v < 0) | (v >= L)
    vv = np.where(esc, 0, v)
    h = vv >> k
    low = vv & ((1 << k) - 1)
    b0 = B[idx_tl, h]
    b1 = B[idx_tl, h + 1]
    start_h = np.where(esc, int(tpu_rans.GAUSS_B), b0).reshape(T, lanes)
    freq_h = np.where(esc, int(tpu_rans.GAUSS_ESC_FREQ),
                      b1 - b0).reshape(T, lanes)
    low = low.reshape(T, lanes)
    ks = (16 - k).reshape(T, lanes)
    state = np.full(lanes, 1 << 16, np.uint64)
    emits = np.zeros((T, 2, lanes), np.uint16)
    masks = np.zeros((T, 2, lanes), bool)
    for t in range(T - 1, -1, -1):
        fl = (np.uint64(1) << ks[t].astype(np.uint64))
        emits[t, 1] = (state & np.uint64(0xFFFF)).astype(np.uint16)
        need = (state >> np.uint64(16)) >= fl
        masks[t, 1] = need
        state = np.where(need, state >> np.uint64(16), state)
        state = (((state >> ks[t].astype(np.uint64)) << np.uint64(16))
                 + (low[t].astype(np.uint64) << ks[t].astype(np.uint64))
                 + (state & (fl - np.uint64(1))))
        fh = freq_h[t].astype(np.uint64)
        emits[t, 0] = (state & np.uint64(0xFFFF)).astype(np.uint16)
        need = (state >> np.uint64(16)) >= fh
        masks[t, 0] = need
        state = np.where(need, state >> np.uint64(16), state)
        q, r = state // fh, state % fh
        state = (q << np.uint64(16)) + r + start_h[t].astype(np.uint64)
    stream = emits.reshape(-1)[masks.reshape(-1)]
    return state.astype(np.uint32), stream


def test_gauss_encode_matches_numpy_reference(gt):
    """Jitted encode (bulk matmuls + scan) == exact u64 numpy reference,
    bit-for-bit, over a wide-scale plane with escapes."""
    from hyres_tpu.entropy import get_scale_table
    rng = np.random.default_rng(3)
    st = np.asarray(get_scale_table())
    n = 30000
    lanes = 128
    idx = rng.integers(0, 64, n).astype(np.int32)
    sym = np.clip(np.round(rng.normal(0, st[idx], n)),
                  -30000, 30000).astype(np.int32)
    sym[:3] = [31000, -31000, 30000]
    idx[:3] = 8
    enc = jax.jit(tpu_rans.gauss_encode, static_argnums=(3,))(
        jnp.asarray(sym), jnp.asarray(idx), gt, lanes)
    states_ref, stream_ref = _numpy_gauss_encode(sym, idx, gt, lanes)
    np.testing.assert_array_equal(np.asarray(enc["states"]), states_ref)
    assert int(enc["n_renorm"]) == stream_ref.size
    np.testing.assert_array_equal(
        np.asarray(enc["stream"])[: stream_ref.size], stream_ref)


def test_gauss_rate_close_to_table_coder(gt, gauss_tables):
    """The segment quantization's rate (incl. the uniform low bits)
    matches the baked-table coder's within ~2% on trained-like symbol
    statistics."""
    from hyres_tpu.entropy import get_scale_table
    host, dev = gauss_tables
    rng = np.random.default_rng(7)
    n = 65536
    idx = rng.integers(0, 40, n).astype(np.int32)  # typical scales
    sigma = np.asarray(get_scale_table())[idx]
    sym = np.round(rng.normal(0, sigma)).astype(np.int32)
    _, data_a = _gt_roundtrip(sym, idx, gt, lanes=64)
    got, data_t = _roundtrip(sym, idx, dev, lanes=64)
    np.testing.assert_array_equal(got, sym)
    assert len(data_a) <= len(data_t) * 1.02 + 64


@pytest.mark.parametrize("dtype,density", [(np.int8, 0.02), (np.int16, 0.9)])
def test_pull_encs_two_phase_extra_roundtrip(gauss_tables, dtype, density):
    """pull_encs at B>=2 (the two-phase bucket-sliced pull) must return
    host enc dicts that frame to the SAME bytes as full-cap downloads,
    and reconstruct the extra payload exactly — through the sparse
    (pos, val) compaction at low density and the dense path at high."""
    from hyres_tpu.models.codec import pull_encs

    _, dev = gauss_tables
    rng = np.random.default_rng(7)
    B, n = 3, 20000
    idx = rng.integers(0, 64, (B, n)).astype(np.int32)
    sigma = np.asarray(get_scale_table())[idx]
    sym = np.round(rng.normal(0, sigma)).astype(np.int32)
    lanes = 64

    enc = jax.jit(jax.vmap(
        lambda s, i: tpu_rans.rans_encode(s, i, dev, lanes)))(
        jnp.asarray(sym), jnp.asarray(idx))

    extra = (rng.random((B, 4096)) < density) * rng.integers(
        -100, 100, (B, 4096))
    extra = jnp.asarray(extra.astype(dtype))

    encs_host, extra_np = pull_encs([enc], extra)
    np.testing.assert_array_equal(extra_np, np.asarray(extra))

    # frames from the sliced pull == frames from full-cap device_get
    full = jax.device_get(enc)
    for i in range(B):
        sliced = tpu_rans.frame_plane(
            encs_host[0]["states"][i], encs_host[0]["stream"][i],
            int(encs_host[0]["n_renorm"][i]), encs_host[0]["esc_pos"][i],
            encs_host[0]["esc_val"][i], int(encs_host[0]["n_esc"][i]))
        ref = tpu_rans.frame_plane(
            full["states"][i], full["stream"][i], int(full["n_renorm"][i]),
            full["esc_pos"][i], full["esc_val"][i], int(full["n_esc"][i]))
        assert sliced == ref


def test_pull_encs_column_sparse_coef_path(gauss_tables):
    """The speculative pull's COLUMN-sparse coefficient plan (static
    block-position slices instead of the (pos, val) masked_compact —
    the 51 ms/image device cost found in r5, pull_decomp.log) must
    reconstruct the payload exactly, take the cols path once a mask is
    recorded, and fall back to an exact repull when a NEW column
    appears (then widen the recorded mask)."""
    from hyres_tpu.models import codec as codec_mod

    _, dev = gauss_tables
    rng = np.random.default_rng(11)
    B, n = 1, 20000
    idx = rng.integers(0, 64, (B, n)).astype(np.int32)
    sigma = np.asarray(get_scale_table())[idx]
    sym = np.round(rng.normal(0, sigma)).astype(np.int32)
    lanes = 64
    enc = jax.jit(jax.vmap(
        lambda s, i: tpu_rans.rans_encode(s, i, dev, lanes)))(
        jnp.asarray(sym), jnp.asarray(idx))

    def coef(active_cols):
        # 8x8-block layout: 128 blocks x 64 positions, nonzeros only at
        # the given block positions (JPEG q=1-like clustering)
        c = np.zeros((B, 128, 64), np.int8)
        for col in active_cols:
            c[:, rng.integers(0, 128, 40), col] = rng.integers(
                1, 100, 40).astype(np.int8)
        return c.reshape(B, 128 * 64)

    cap_state: dict = {}
    # call 1: no state -> full-cap pull; records colmask
    e1 = coef([0, 1, 8])
    out, x1 = codec_mod.pull_encs([enc], jnp.asarray(e1),
                                  cap_state=cap_state)
    np.testing.assert_array_equal(x1, e1)
    st = next(iter(cap_state.values()))
    assert st["colmask"] == (1 << 0) | (1 << 1) | (1 << 8)

    # call 2: speculative cols path (subset of the mask) — exact bytes
    e2 = coef([0, 8])
    out2, x2 = codec_mod.pull_encs([enc], jnp.asarray(e2),
                                   cap_state=cap_state)
    np.testing.assert_array_equal(x2, e2)
    full = jax.device_get(enc)
    np.testing.assert_array_equal(out2[0]["states"], full["states"])
    nr = int(full["n_renorm"][0])
    assert int(out2[0]["n_renorm"][0]) == nr
    np.testing.assert_array_equal(out2[0]["stream"][0][:nr],
                                  full["stream"][0][:nr])

    # call 3: a NEW column (9) -> mask miss -> exact repull, still exact,
    # and the recorded mask widens
    e3 = coef([0, 1, 9])
    _, x3 = codec_mod.pull_encs([enc], jnp.asarray(e3),
                                cap_state=cap_state)
    np.testing.assert_array_equal(x3, e3)
    st = next(iter(cap_state.values()))
    assert st["colmask"] & (1 << 9)

    # call 4: cols path again with the widened mask
    e4 = coef([1, 9])
    _, x4 = codec_mod.pull_encs([enc], jnp.asarray(e4),
                                cap_state=cap_state)
    np.testing.assert_array_equal(x4, e4)


def test_sizes_cols_mask_matches_numpy(gauss_tables):
    """_sizes_cols' device-side u64 column mask == the host formula."""
    from hyres_tpu.models import codec as codec_mod

    _, dev = gauss_tables
    rng = np.random.default_rng(3)
    sym = rng.integers(-5, 5, (2, 512)).astype(np.int32)
    idx = rng.integers(0, 64, (2, 512)).astype(np.int32)
    enc = jax.jit(jax.vmap(
        lambda s, i: tpu_rans.rans_encode(s, i, dev, 32)))(
        jnp.asarray(sym), jnp.asarray(idx))
    extra = np.zeros((2, 4 * 64), np.int8)
    extra[0, 33] = 7          # block 0, col 33 (tests the hi word)
    extra[1, 64 + 2] = -3     # block 1, col 2
    sizes = np.asarray(codec_mod._sizes_jit([enc], jnp.asarray(extra)))
    lo = sizes[:, -3].astype(np.uint32)
    hi = sizes[:, -2].astype(np.uint32)
    masks = [int(lo[i]) | (int(hi[i]) << 32) for i in range(2)]
    assert masks[0] == 1 << 33
    assert masks[1] == 1 << 2
    assert list(sizes[:, -1]) == [1, 1]


# ---------------------------------------------------------------------------
# pure-VPU scan-step lowerings (prefix ladder / butterfly stream routing)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("lanes", [32, 64, 128, 256])
def test_rank_total_ladder_matches_matmul(monkeypatch, lanes):
    rng = np.random.default_rng(7)
    prefix_m = tpu_rans._prefix_matrix(lanes)
    for density in (0.0, 0.3, 1.0):
        need = (rng.random(lanes) < density).astype(np.float32)
        monkeypatch.setattr(tpu_rans, "PREFIX_MODE", "matmul")
        r0, t0 = tpu_rans._rank_total(jnp.asarray(need), prefix_m, lanes)
        monkeypatch.setattr(tpu_rans, "PREFIX_MODE", "ladder")
        r1, t1 = tpu_rans._rank_total(jnp.asarray(need), prefix_m, lanes)
        np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
        assert float(t0) == float(t1)


@pytest.mark.parametrize("lanes", [32, 64, 128, 256])
def test_route_monotone_matches_onehot(lanes):
    rng = np.random.default_rng(11)
    for density in (0.0, 0.1, 0.5, 0.9, 1.0):
        need = (rng.random(lanes) < density).astype(np.float32)
        rank = np.concatenate([[0.0], np.cumsum(need)[:-1]]).astype(
            np.float32)
        win = rng.integers(0, 1 << 16, lanes).astype(np.uint32)
        got = np.asarray(tpu_rans._route_monotone(
            jnp.asarray(win), jnp.asarray(rank), lanes))
        want = win[rank.astype(np.int64)]
        # only lanes that renorm consume their read; junk elsewhere is
        # masked by the caller — compare on the need lanes only
        np.testing.assert_array_equal(got[need > 0], want[need > 0])


@pytest.mark.parametrize("prefix_mode,stream_read", [
    ("ladder", "slice"), ("matmul", "shift"), ("ladder", "shift"),
])
def test_vpu_scan_modes_bit_identical_roundtrip(
        monkeypatch, gt, gauss_tables, prefix_mode, stream_read):
    """Every (prefix, stream-read) lowering decodes the DEFAULT-mode
    encoder's bytes exactly — the wire format is lowering-independent."""
    _, dev = gauss_tables
    rng = np.random.default_rng(3)
    n = 30000
    idx = rng.integers(0, 64, n).astype(np.int32)
    from hyres_tpu.entropy import get_scale_table
    sigma = np.asarray(get_scale_table())[idx]
    sym = np.round(rng.normal(0, sigma)).astype(np.int32)

    got_g, data_g = _gt_roundtrip(sym, idx, gt, lanes=128)
    got_t, data_t = _roundtrip(sym, idx, dev, lanes=64)
    np.testing.assert_array_equal(got_g, sym)
    np.testing.assert_array_equal(got_t, sym)

    monkeypatch.setattr(tpu_rans, "PREFIX_MODE", prefix_mode)
    monkeypatch.setattr(tpu_rans, "STREAM_READ", stream_read)

    lanes2, states, stream, esc_pos, esc_val = tpu_rans.unframe_plane(
        data_g, n)
    got2 = np.asarray(jax.jit(tpu_rans.gauss_decode, static_argnums=(6, 7))(
        jnp.asarray(stream), jnp.asarray(states), jnp.asarray(idx),
        jnp.asarray(esc_pos), jnp.asarray(esc_val), gt, 128, n))
    np.testing.assert_array_equal(got2, sym)

    lanes3, states3, stream3, esc_pos3, esc_val3 = tpu_rans.unframe_plane(
        data_t, n)
    got3 = np.asarray(jax.jit(tpu_rans.rans_decode, static_argnums=(6, 7))(
        jnp.asarray(stream3), jnp.asarray(states3), jnp.asarray(idx),
        jnp.asarray(esc_pos3), jnp.asarray(esc_val3), dev, 64, n))
    np.testing.assert_array_equal(got3, sym)


# ---------------------------------------------------------------------------
# dense merge-tree compaction (nonzero replacement)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n,cap", [(100, 32), (100, 256), (4096, 1024),
                                   (20000, 5000), (65536, 65536)])
def test_masked_compact_matches_nonzero(n, cap):
    rng = np.random.default_rng(n)
    for density in (0.0, 0.01, 0.3, 1.0):
        mask = rng.random(n) < density
        vals = rng.integers(0, 1 << 16, n).astype(np.uint16)
        out, count = tpu_rans.masked_compact(
            jnp.asarray(vals), jnp.asarray(mask), cap, fill=0)
        want = vals[mask]
        assert int(count) == want.size
        k = min(cap, want.size)
        np.testing.assert_array_equal(np.asarray(out)[:k], want[:k])
        np.testing.assert_array_equal(np.asarray(out)[k:], 0)


@pytest.mark.parametrize("n", [1000, 4096, 100000, 589824])
def test_escape_compact_matches_masked_compact(n):
    """Two-level sparse escape compaction == the full merge tree,
    bit-for-bit, for every in-contract escape density (the lists only
    ship when n_esc < 256 — frame_plane raises otherwise)."""
    rng = np.random.default_rng(n)
    for n_set in (0, 1, 7, 200, 255):
        pos = rng.choice(n, size=n_set, replace=False)
        mask = np.zeros(n, bool)
        mask[pos] = True
        sym = rng.integers(-30000, 30000, n).astype(np.int32)
        ep, ev, cnt = tpu_rans.escape_compact(
            jnp.asarray(sym), jnp.asarray(mask), fill_pos=n)
        iota = np.arange(n, dtype=np.int32)
        ep_ref, cnt_ref = tpu_rans.masked_compact(
            jnp.asarray(iota), jnp.asarray(mask), tpu_rans.ESC_MAX, fill=n)
        ev_ref, _ = tpu_rans.masked_compact(
            jnp.asarray(sym), jnp.asarray(mask), tpu_rans.ESC_MAX)
        assert int(cnt) == int(cnt_ref) == n_set
        np.testing.assert_array_equal(np.asarray(ep), np.asarray(ep_ref))
        # values past the count are don't-care in the wire (frame_plane
        # slices [:n_esc]); compare only the live prefix
        np.testing.assert_array_equal(np.asarray(ev)[:n_set],
                                      np.asarray(ev_ref)[:n_set])


def test_escape_compact_overflow_count_exact():
    """count stays exact past ESC_MAX (the overflow detector's input),
    even when the list prefix is no longer guaranteed."""
    rng = np.random.default_rng(0)
    n = 100000
    mask = rng.random(n) < 0.02           # ~2000 escapes
    sym = rng.integers(-100, 100, n).astype(np.int32)
    _, _, cnt = tpu_rans.escape_compact(
        jnp.asarray(sym), jnp.asarray(mask), fill_pos=n)
    assert int(cnt) == int(mask.sum())


def test_masked_compact_position_fill():
    n = 1000
    mask = np.zeros(n, bool)
    mask[[3, 500, 999]] = True
    iota = np.arange(n, dtype=np.int32)
    out, count = tpu_rans.masked_compact(
        jnp.asarray(iota), jnp.asarray(mask), 16, fill=n)
    assert int(count) == 3
    np.testing.assert_array_equal(np.asarray(out)[:3], [3, 500, 999])
    np.testing.assert_array_equal(np.asarray(out)[3:], n)


def test_compact_merge_mode_roundtrip(monkeypatch, gt):
    """Full encode/decode with the merge compactor: same bytes, same
    symbols as the nonzero path."""
    from hyres_tpu.entropy import get_scale_table
    rng = np.random.default_rng(5)
    n = 30000
    idx = rng.integers(0, 64, n).astype(np.int32)
    sigma = np.asarray(get_scale_table())[idx]
    sym = np.round(rng.normal(0, sigma)).astype(np.int32)
    sym[::5000] = 32000  # a few escapes
    got0, data0 = _gt_roundtrip(sym, idx, gt, lanes=128)
    monkeypatch.setattr(tpu_rans, "COMPACT_MODE", "merge")
    got1, data1 = _gt_roundtrip(sym, idx, gt, lanes=128)
    np.testing.assert_array_equal(got0, sym)
    np.testing.assert_array_equal(got1, sym)
    assert data0 == data1


@pytest.mark.parametrize("dtype,density", [(np.int8, 0.02), (np.int16, 0.9)])
def test_pull_encs_merge_compactor_same_bytes(monkeypatch, gauss_tables,
                                              dtype, density):
    """The merge compactor must produce the same pulled frames and extra
    payload as the nonzero path, through the full pull_encs pipeline."""
    from hyres_tpu.models.codec import pull_encs

    _, dev = gauss_tables
    rng = np.random.default_rng(9)
    B, n = 2, 20000
    idx = rng.integers(0, 64, (B, n)).astype(np.int32)
    sigma = np.asarray(get_scale_table())[idx]
    sym = np.round(rng.normal(0, sigma)).astype(np.int32)
    lanes = 64
    extra = (rng.random((B, 4096)) < density) * rng.integers(
        -100, 100, (B, 4096))
    extra = jnp.asarray(extra.astype(dtype))

    def run():
        enc = jax.jit(jax.vmap(
            lambda s, i: tpu_rans.rans_encode(s, i, dev, lanes)))(
            jnp.asarray(sym), jnp.asarray(idx))
        encs_host, extra_np = pull_encs([enc], extra)
        frames = [tpu_rans.frame_plane(
            encs_host[0]["states"][i], encs_host[0]["stream"][i],
            int(encs_host[0]["n_renorm"][i]), encs_host[0]["esc_pos"][i],
            encs_host[0]["esc_val"][i], int(encs_host[0]["n_esc"][i]))
            for i in range(B)]
        return frames, np.asarray(extra_np)

    f0, e0 = run()
    monkeypatch.setattr(tpu_rans, "COMPACT_MODE", "merge")
    f1, e1 = run()
    assert f0 == f1
    np.testing.assert_array_equal(e0, e1)
    np.testing.assert_array_equal(e1, np.asarray(extra))
