"""Pallas gaussian-decode kernel vs the XLA lax.scan reference.

The v2 segment-table coder has no recomputed f32 rounding in its wire
contract (see coding/tpu_rans.py), so XLA-framed streams are decodable
by the Pallas kernel BIT-FOR-BIT on any backend — these tests run the
kernel in interpret mode on CPU; scripts/coder_microbench.py exercises
the same cross-decode on-chip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyres_tpu.coding import tpu_rans as tr
from hyres_tpu.coding import pallas_rans as pr


def _scale_table():
    return np.exp(np.linspace(np.log(0.11), np.log(256.0), 64))


def _plane(rng, n, wide=False):
    st = _scale_table()
    hi = 64 if wide else 40
    idx = rng.integers(5, hi, n).astype(np.int32)
    sigma = st[idx]
    sym = np.round(rng.normal(0, sigma, n)).astype(np.int32)
    sym = np.clip(sym, -30000, 30000)
    return sym, idx


def _encode_and_unframe(sym, idx, gt, lanes):
    B, n = sym.shape
    enc = tr.gauss_encode_batch(jnp.asarray(sym), jnp.asarray(idx),
                                gt, lanes)
    ups = [tr.unframe_plane(tr.frame_plane(
        np.asarray(enc["states"][i]), np.asarray(enc["stream"][i]),
        int(enc["n_renorm"][i]), np.asarray(enc["esc_pos"][i]),
        np.asarray(enc["esc_val"][i]), int(enc["n_esc"][i])), n)
        for i in range(B)]
    smax = max(u[2].shape[0] for u in ups)
    stream_b = np.zeros((B, smax), np.uint16)
    for i, u in enumerate(ups):
        stream_b[i, : u[2].shape[0]] = u[2]
    return (jnp.asarray(stream_b),
            jnp.asarray(np.stack([u[1] for u in ups])),
            jnp.asarray(np.stack([u[3] for u in ups])),
            jnp.asarray(np.stack([u[4] for u in ups])))


@pytest.mark.parametrize("B,n,wide,lanes", [
    (1, 1000, False, 128), (3, 5000, False, 128), (8, 40000, True, 128),
    (2, 9000, True, 64)])
def test_pallas_decodes_xla_stream(B, n, wide, lanes):
    """XLA encode -> frame -> unframe -> Pallas decode recovers the
    symbols bit-exactly, wide trained stats and escapes included —
    both kernel lane tiers (128 = full VPU row; 64 = ELIC-slice tier)."""
    rng = np.random.default_rng(1)
    gt = tr.build_gauss_tables(_scale_table())
    pairs = [_plane(rng, n, wide) for _ in range(B)]
    sym = np.stack([p[0] for p in pairs])
    idx = np.stack([p[1] for p in pairs])
    # force a few escapes in image 0
    sym[0, :5] = np.array([31000, -31000, 29000, -29000, 28000])
    idx[0, :5] = 5

    stream_b, states_b, esc_pos_b, esc_val_b = _encode_and_unframe(
        sym, idx, gt, lanes)
    dec = pr.gauss_decode_batch(stream_b, states_b, jnp.asarray(idx),
                                esc_pos_b, esc_val_b, gt, lanes, n)
    np.testing.assert_array_equal(np.asarray(dec), sym)


def test_pallas_matches_xla_decode():
    """Pallas and XLA decoders produce identical symbols from the same
    frames (same exact-integer arithmetic, different lowerings)."""
    rng = np.random.default_rng(2)
    lanes, n, B = 128, 20000, 2
    gt = tr.build_gauss_tables(_scale_table())
    pairs = [_plane(rng, n, wide=True) for _ in range(B)]
    sym = np.stack([p[0] for p in pairs])
    idx = np.stack([p[1] for p in pairs])

    stream_b, states_b, esc_pos_b, esc_val_b = _encode_and_unframe(
        sym, idx, gt, lanes)
    dec_p = pr.gauss_decode_batch(stream_b, states_b, jnp.asarray(idx),
                                  esc_pos_b, esc_val_b, gt, lanes, n)
    dec_x = jax.vmap(
        lambda st, sa, ix, ep, ev: tr.gauss_decode(
            st, sa, ix, ep, ev, gt, lanes, n)
    )(stream_b, states_b, jnp.asarray(idx), esc_pos_b, esc_val_b)
    np.testing.assert_array_equal(np.asarray(dec_p), np.asarray(dec_x))
    np.testing.assert_array_equal(np.asarray(dec_p), sym)


def test_batch_dispatch_flag(monkeypatch):
    """gauss_decode_batch dispatches on GAUSS_IMPL and falls back to XLA
    for unsupported lane counts."""
    rng = np.random.default_rng(3)
    lanes, n, B = 256, 4000, 2  # 256 lanes: pallas unsupported -> XLA
    gt = tr.build_gauss_tables(_scale_table())
    pairs = [_plane(rng, n) for _ in range(B)]
    sym = np.stack([p[0] for p in pairs])
    idx = np.stack([p[1] for p in pairs])
    stream_b, states_b, esc_pos_b, esc_val_b = _encode_and_unframe(
        sym, idx, gt, lanes)
    monkeypatch.setattr(tr, "GAUSS_IMPL", "pallas")
    dec = tr.gauss_decode_batch(stream_b, states_b, jnp.asarray(idx),
                                esc_pos_b, esc_val_b, gt, lanes, n)
    np.testing.assert_array_equal(np.asarray(dec), sym)


def test_plane_coder_rides_pallas(monkeypatch):
    """TpuPlaneCoder's jitted decode_gauss dispatches through the Pallas
    kernel when GAUSS_IMPL=pallas (fresh coder instance => fresh trace),
    producing the same symbols as the XLA lowering — and an awkward
    batch (B=9 > MAX_G) exercises the kernel's batch padding."""
    from hyres_tpu.models.codec import TpuPlaneCoder

    monkeypatch.setattr(tr, "GAUSS_IMPL", "pallas")
    rng = np.random.default_rng(4)
    B, H, W, C = 9, 64, 64, 32          # n = 131072 -> the 128-lane tier
    n = H * W * C
    lanes = min(tr.GAUSS_LANES, tr.lanes_for(n))
    assert lanes == 128 and pr.supported(lanes)
    st = _scale_table()
    # trained-like scales: the big-plane stream cap budgets 4 bits/sym
    # (uniform-over-all-rows synthetic data legitimately overflows it
    # and would take the host-fallback path instead)
    idx = rng.integers(0, 36, (B, H, W, C)).astype(np.int32)
    sym = np.clip(np.round(rng.normal(0, st[idx])), -30000, 30000
                  ).astype(np.int16)

    # minimal factorized tables (the gauss path is what's under test)
    import types
    pmf = np.exp(-0.5 * ((np.arange(31) - 15) / 3.0) ** 2)
    freqs = np.maximum(1, np.round(pmf / pmf.sum() * 65000)).astype(np.int64)
    freqs = np.concatenate([freqs, [65536 - freqs.sum()]])
    bounds = np.concatenate([[0], np.cumsum(freqs)])
    eb = types.SimpleNamespace(
        quantized_cdf=np.tile(bounds, (C, 1)).astype(np.int32),
        cdf_length=np.full(C, bounds.size, np.int32),
        offset=np.full(C, -15, np.int32))

    tc = TpuPlaneCoder(None, eb)
    enc = tc.encode_gauss(jnp.asarray(sym), jnp.asarray(idx))
    frames = TpuPlaneCoder.frames_from_enc(
        jax.tree_util.tree_map(np.asarray, enc))
    u = TpuPlaneCoder.unframe_batch(frames, n)
    got = tc.decode_gauss(u[2], u[1], jnp.asarray(idx), u[3], u[4], u[0])
    np.testing.assert_array_equal(np.asarray(got), sym)


def test_auto_impl_probe(monkeypatch):
    """GAUSS_IMPL=auto: the probe passes in interpret mode on CPU, but
    auto only ROUTES through the kernel on a native Mosaic backend —
    interpret emulation is orders of magnitude slower than the XLA
    scans, so a CPU-forced production host must get the scans (the
    kernel lowering is pinned unreachable here by making it raise)."""
    monkeypatch.setattr(tr, "GAUSS_IMPL", "auto")
    monkeypatch.setattr(pr, "_PROBE_OK", None)
    assert pr.probe() is True
    if jax.default_backend() == "cpu":
        monkeypatch.setattr(pr, "gauss_decode_batch",
                            lambda *a, **k: (_ for _ in ()).throw(
                                AssertionError("auto took interpret-mode "
                                               "pallas on CPU")))
    rng = np.random.default_rng(5)
    lanes, n, B = 128, 20000, 2
    gt = tr.build_gauss_tables(_scale_table())
    pairs = [_plane(rng, n) for _ in range(B)]
    sym = np.stack([p[0] for p in pairs])
    idx = np.stack([p[1] for p in pairs])
    stream_b, states_b, esc_pos_b, esc_val_b = _encode_and_unframe(
        sym, idx, gt, lanes)
    dec = tr.gauss_decode_batch(stream_b, states_b, jnp.asarray(idx),
                                esc_pos_b, esc_val_b, gt, lanes, n)
    np.testing.assert_array_equal(np.asarray(dec), sym)


def _eb_tables(C=8):
    import types
    pmf = np.exp(-0.5 * ((np.arange(31) - 15) / 3.0) ** 2)
    freqs = np.maximum(1, np.round(pmf / pmf.sum() * 65000)).astype(np.int64)
    freqs = np.concatenate([freqs, [65536 - freqs.sum()]])
    bounds = np.concatenate([[0], np.cumsum(freqs)])
    host = types.SimpleNamespace(
        quantized_cdf=np.tile(bounds, (C, 1)).astype(np.int32),
        cdf_length=np.full(C, bounds.size, np.int32),
        offset=np.full(C, -15, np.int32))
    return tr.build_device_tables(host)


@pytest.mark.parametrize("B,n,lanes", [(1, 6000, 32), (3, 20000, 64)])
def test_eb_pallas_decodes_xla_stream(B, n, lanes):
    """Factorized-prior planes: XLA encode -> EB kernel decode, exact,
    escapes included (the EB escape is the row's last bin)."""
    rng = np.random.default_rng(6)
    tables = _eb_tables()
    idx = rng.integers(0, 8, (B, n)).astype(np.int32)
    sym = np.clip(rng.normal(0, 4, (B, n)).round(), -15, 14).astype(np.int32)
    sym[0, :4] = [99, -99, 40, -40]     # out-of-support -> escapes

    enc = jax.vmap(lambda s, i: tr.rans_encode(s, i, tables, lanes)
                   )(jnp.asarray(sym), jnp.asarray(idx))
    ups = [tr.unframe_plane(tr.frame_plane(
        np.asarray(enc["states"][i]), np.asarray(enc["stream"][i]),
        int(enc["n_renorm"][i]), np.asarray(enc["esc_pos"][i]),
        np.asarray(enc["esc_val"][i]), int(enc["n_esc"][i])), n)
        for i in range(B)]
    smax = max(u[2].shape[0] for u in ups)
    stream_b = np.zeros((B, smax), np.uint16)
    for i, u in enumerate(ups):
        stream_b[i, : u[2].shape[0]] = u[2]

    dec = pr.eb_decode_batch(
        jnp.asarray(stream_b), jnp.asarray(np.stack([u[1] for u in ups])),
        jnp.asarray(idx), jnp.asarray(np.stack([u[3] for u in ups])),
        jnp.asarray(np.stack([u[4] for u in ups])), tables, lanes, n)
    np.testing.assert_array_equal(np.asarray(dec), sym)


def test_eb_auto_dispatch(monkeypatch):
    """rans_decode_batch auto-dispatch: the EB probe passes on CPU, but
    auto routes to the XLA scan on interpret backends (see
    test_auto_impl_probe) and still decodes exactly."""
    monkeypatch.setattr(tr, "GAUSS_IMPL", "auto")
    monkeypatch.setattr(pr, "_EB_PROBE_OK", None)
    assert pr.probe_eb() is True
    if jax.default_backend() == "cpu":
        monkeypatch.setattr(pr, "eb_decode_batch",
                            lambda *a, **k: (_ for _ in ()).throw(
                                AssertionError("auto took interpret-mode "
                                               "pallas on CPU")))
    rng = np.random.default_rng(7)
    B, n, lanes = 2, 12288, 32
    tables = _eb_tables()
    idx = rng.integers(0, 8, (B, n)).astype(np.int32)
    sym = np.clip(rng.normal(0, 4, (B, n)).round(), -15, 14).astype(np.int32)
    enc = jax.vmap(lambda s, i: tr.rans_encode(s, i, tables, lanes)
                   )(jnp.asarray(sym), jnp.asarray(idx))
    ups = [tr.unframe_plane(tr.frame_plane(
        np.asarray(enc["states"][i]), np.asarray(enc["stream"][i]),
        int(enc["n_renorm"][i]), np.asarray(enc["esc_pos"][i]),
        np.asarray(enc["esc_val"][i]), int(enc["n_esc"][i])), n)
        for i in range(B)]
    smax = max(u[2].shape[0] for u in ups)
    stream_b = np.zeros((B, smax), np.uint16)
    for i, u in enumerate(ups):
        stream_b[i, : u[2].shape[0]] = u[2]
    dec = tr.rans_decode_batch(
        jnp.asarray(stream_b), jnp.asarray(np.stack([u[1] for u in ups])),
        jnp.asarray(idx), jnp.asarray(np.stack([u[3] for u in ups])),
        jnp.asarray(np.stack([u[4] for u in ups])), tables, lanes, n)
    np.testing.assert_array_equal(np.asarray(dec), sym)


@pytest.mark.parametrize("B,n,wide,lanes", [
    (2, 20000, True, 128), (3, 9000, False, 64)])
def test_pallas_encode_matches_xla(B, n, wide, lanes, monkeypatch):
    """The encode kernel (reverse scan + in-kernel backward compaction)
    reproduces the XLA encode dict BIT-FOR-BIT — stream bytes, states,
    counts, and escapes — across lane tiers and partial last chunks."""
    rng = np.random.default_rng(8)
    gt = tr.build_gauss_tables(_scale_table())
    pairs = [_plane(rng, n, wide) for _ in range(B)]
    sym = np.stack([p[0] for p in pairs])
    idx = np.stack([p[1] for p in pairs])
    sym[0, :3] = [31000, -31000, 29000]
    idx[0, :3] = 5

    ref = jax.vmap(lambda s, i: tr.gauss_encode(s, i, gt, lanes)
                   )(jnp.asarray(sym), jnp.asarray(idx))
    out = pr.gauss_encode_batch(jnp.asarray(sym), jnp.asarray(idx),
                                gt, lanes)
    for k in ("states", "stream", "n_renorm", "esc_pos", "esc_val",
              "n_esc"):
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(out[k]), err_msg=k)


def test_eb_encode_kernel_matches_xla():
    """The shared encode kernel with k=0 (identity low push) reproduces
    the vmapped rans_encode output exactly, escapes included."""
    rng = np.random.default_rng(9)
    B, n, lanes = 2, 12288, 32
    tables = _eb_tables()
    idx = rng.integers(0, 8, (B, n)).astype(np.int32)
    sym = np.clip(rng.normal(0, 4, (B, n)).round(), -15, 14).astype(np.int32)
    sym[0, :4] = [99, -99, 40, -40]
    ref = jax.vmap(lambda s, i: tr.rans_encode(s, i, tables, lanes)
                   )(jnp.asarray(sym), jnp.asarray(idx))
    out = pr.eb_encode_batch(jnp.asarray(sym), jnp.asarray(idx),
                             tables, lanes)
    for k in ("states", "stream", "n_renorm", "esc_pos", "esc_val",
              "n_esc"):
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(out[k]), err_msg=k)


def test_fused_encode_matches_separate_ragged():
    """fused_encode_batch runs ragged planes (different n, lanes, and
    table kinds) as rows of ONE kernel launch, reconciling shapes with
    exact-identity steps (freq = 2^16) — every plane's output dict must
    be BIT-IDENTICAL to its separate per-plane kernel call (same wire,
    same escapes, same per-plane overflow caps)."""
    rng = np.random.default_rng(11)
    gt = tr.build_gauss_tables(_scale_table())
    eb = _eb_tables()

    z_sym = np.clip(rng.normal(0, 4, (2, 3000)).round(), -15, 14
                    ).astype(np.int32)
    z_idx = rng.integers(0, 8, (2, 3000)).astype(np.int32)
    a_sym, a_idx = zip(*[_plane(rng, 9000, wide=True) for _ in range(2)])
    n_sym, n_idx = zip(*[_plane(rng, 9000) for _ in range(2)])
    a_sym, a_idx = np.stack(a_sym), np.stack(a_idx)
    n_sym, n_idx = np.stack(n_sym), np.stack(n_idx)
    a_sym[0, :2] = [31000, -31000]  # escapes in one fused row
    a_idx[0, :2] = 5

    planes = [("eb", jnp.asarray(z_sym), jnp.asarray(z_idx), eb, 32),
              ("gauss", jnp.asarray(a_sym), jnp.asarray(a_idx), gt, 64),
              ("gauss", jnp.asarray(n_sym), jnp.asarray(n_idx), gt, 64)]
    fused = pr.fused_encode_batch(planes)
    seps = [pr.eb_encode_batch(planes[0][1], planes[0][2], eb, 32),
            pr.gauss_encode_batch(planes[1][1], planes[1][2], gt, 64),
            pr.gauss_encode_batch(planes[2][1], planes[2][2], gt, 64)]
    for got, ref in zip(fused, seps):
        for k in ("states", "stream", "n_renorm", "esc_pos", "esc_val",
                  "n_esc"):
            np.testing.assert_array_equal(
                np.asarray(ref[k]), np.asarray(got[k]), err_msg=k)


def test_encode_probe(monkeypatch):
    monkeypatch.setattr(pr, "_ENC_PROBE_OK", None)
    assert pr.probe_enc() is True


def test_probes_inside_jit_trace(monkeypatch):
    """The probes are reached lazily from the GAUSS_IMPL dispatch, i.e.
    INSIDE an active jit trace (first compress/decompress call traces
    encode_all/decode_gauss, whose body consults probe()). Under
    omnistaging the probe's own ops would be staged into the caller's
    jaxpr and its np.asarray pulls would see tracers — which used to
    raise TracerArrayConversionError, permanently latching the probe
    False and silently disabling the kernels ON TPU TOO. Pin that each
    probe evaluates eagerly (ensure_compile_time_eval) and reports the
    same verdict under a trace as outside one."""
    for cache, fn in (("_PROBE_OK", pr.probe),
                      ("_EB_PROBE_OK", pr.probe_eb),
                      ("_ENC_PROBE_OK", pr.probe_enc)):
        monkeypatch.setattr(pr, cache, None)
        outside = fn()
        monkeypatch.setattr(pr, cache, None)
        got = {}

        def f(x, fn=fn, got=got):
            got["val"] = fn()   # runs at trace time, inside the trace
            return x + 1

        jax.jit(f)(jnp.zeros((2,), jnp.float32))
        assert got["val"] == outside, cache
        # on CPU the kernels run in interpret mode: the probe must PASS
        # (a trace-time failure is exactly the regression this pins)
        assert got["val"] is True, cache
