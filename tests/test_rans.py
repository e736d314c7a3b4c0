"""rANS coder: encode→decode identity, bypass escape, rate sanity."""

import numpy as np
import pytest

from hyres_tpu.coding import BufferedRansEncoder, RansDecoder, RansEncoder, pmf_to_quantized_cdf


def _gaussian_cdf(sigma, support=20):
    xs = np.arange(-support, support + 1)
    pmf = np.exp(-0.5 * (xs / sigma) ** 2)
    pmf = pmf / pmf.sum() * (1 - 1e-4)
    tail = 1.0 - pmf.sum()
    return pmf_to_quantized_cdf(np.concatenate([pmf, [tail]]).astype(np.float32))


def _tables(sigmas, support=20):
    rows = [_gaussian_cdf(s, support) for s in sigmas]
    maxlen = max(len(r) for r in rows)
    cdfs = np.zeros((len(rows), maxlen), np.int32)
    for i, r in enumerate(rows):
        cdfs[i, : len(r)] = r
    lengths = np.array([len(r) for r in rows], np.int32)
    offsets = np.full(len(rows), -support, np.int32)
    return cdfs, lengths, offsets


def test_roundtrip_exact(rng_np):
    cdfs, lengths, offsets = _tables([0.5, 2.0, 8.0])
    n = 50000
    idx = rng_np.integers(0, 3, n).astype(np.int32)
    sig = np.array([0.5, 2.0, 8.0])[idx]
    sym = np.round(rng_np.normal(0, sig)).astype(np.int32)
    data = RansEncoder().encode_with_indexes(sym, idx, cdfs, lengths, offsets)
    out = RansDecoder(data).decode_stream(idx, cdfs, lengths, offsets)
    assert np.array_equal(out, sym)


def test_bypass_out_of_range(rng_np):
    cdfs, lengths, offsets = _tables([1.0], support=4)
    sym = np.array([-1000000, -100, -5, -4, 0, 4, 5, 100, 1000000, 2 ** 24], np.int32)
    idx = np.zeros_like(sym)
    data = RansEncoder().encode_with_indexes(sym, idx, cdfs, lengths, offsets)
    out = RansDecoder(data).decode_stream(idx, cdfs, lengths, offsets)
    assert np.array_equal(out, sym)


def test_rate_near_entropy(rng_np):
    sigma = 3.0
    cdfs, lengths, offsets = _tables([sigma], support=30)
    n = 200000
    sym = np.round(rng_np.normal(0, sigma, n)).astype(np.int32)
    idx = np.zeros(n, np.int32)
    data = RansEncoder().encode_with_indexes(sym, idx, cdfs, lengths, offsets)
    bits = len(data) * 8 / n
    entropy = 0.5 * np.log2(2 * np.pi * np.e * sigma ** 2)
    assert bits < entropy * 1.03 + 0.05


def test_buffered_multi_push(rng_np):
    """Multiple encode_with_indexes before one flush (cheng2020-style)."""
    cdfs, lengths, offsets = _tables([1.0, 4.0])
    a = rng_np.integers(-3, 4, 1000).astype(np.int32)
    b = rng_np.integers(-10, 11, 1000).astype(np.int32)
    ia = np.zeros(1000, np.int32)
    ib = np.ones(1000, np.int32)
    enc = BufferedRansEncoder()
    enc.encode_with_indexes(a, ia, cdfs, lengths, offsets)
    enc.encode_with_indexes(b, ib, cdfs, lengths, offsets)
    data = enc.flush()
    dec = RansDecoder(data)
    out_a = dec.decode_stream(ia, cdfs, lengths, offsets)
    out_b = dec.decode_stream(ib, cdfs, lengths, offsets)
    assert np.array_equal(out_a, a) and np.array_equal(out_b, b)


def test_empty_stream():
    cdfs, lengths, offsets = _tables([1.0])
    data = RansEncoder().encode_with_indexes(
        np.zeros(0, np.int32), np.zeros(0, np.int32), cdfs, lengths, offsets)
    out = RansDecoder(data).decode_stream(np.zeros(0, np.int32), cdfs, lengths, offsets)
    assert out.size == 0


def test_pmf_to_quantized_cdf_properties(rng_np):
    for _ in range(20):
        n = int(rng_np.integers(2, 300))
        pmf = rng_np.random(n).astype(np.float32)
        pmf[rng_np.random(n) < 0.3] = 0.0  # zero bins must get repaired
        cdf = pmf_to_quantized_cdf(pmf)
        assert cdf[0] == 0 and cdf[-1] == 1 << 16
        assert np.all(np.diff(cdf) >= 1)  # every bin has nonzero width


def test_chunk_framing_portable_across_core_counts(rng_np, monkeypatch):
    """Streams framed with multi-chunk splitting (many-core host) must
    decode on a host capped to 1 chunk, and vice versa — the framing is
    self-describing, so _MAX_CHUNKS only affects ENCODE-side splitting
    (ADVICE r2 / VERDICT r2 weak #8, models/codec.py:68-116)."""
    from hyres_tpu.models import codec as mcodec
    from hyres_tpu.entropy import build_gaussian_tables, get_scale_table

    t = build_gaussian_tables(get_scale_table())
    n = mcodec._CHUNK_SYMS * 3 + 17  # big enough for multi-chunk framing
    idx = rng_np.integers(0, 64, n).astype(np.int32)
    sigma = np.asarray(get_scale_table())[idx]
    sym = np.round(rng_np.normal(0, sigma)).astype(np.int32).reshape(1, -1)
    idx = idx.reshape(1, -1)

    monkeypatch.setattr(mcodec, "_MAX_CHUNKS", 4)
    multi = mcodec._encode_planes(sym, idx, t)
    assert multi[0][0] >= 3  # header chunk count: actually multi-chunk
    monkeypatch.setattr(mcodec, "_MAX_CHUNKS", 1)
    single = mcodec._encode_planes(sym, idx, t)
    assert single[0][0] == 1

    # decode each framing under the OPPOSITE encode-side cap
    monkeypatch.setattr(mcodec, "_MAX_CHUNKS", 1)
    np.testing.assert_array_equal(
        mcodec._decode_planes(multi, idx, t)[0], sym[0])
    monkeypatch.setattr(mcodec, "_MAX_CHUNKS", 4)
    np.testing.assert_array_equal(
        mcodec._decode_planes(single, idx, t)[0], sym[0])


_CAI_FIXTURE = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "..", "fixtures",
    "compressai_streams.npz")


@pytest.mark.skipif(not __import__("os").path.exists(_CAI_FIXTURE),
                    reason="CompressAI fixtures absent (zero-egress env); "
                           "produce with scripts/egress_fixtures.py")
def test_compressai_byte_interop():
    """Byte-level cross-decode vs real CompressAI streams (SURVEY §7
    hard-part 1). Activates when scripts/egress_fixtures.py has been run
    in a networked environment."""
    raw = np.load(_CAI_FIXTURE)
    for i in range(int(raw["n_cases"])):
        sym = raw[f"c{i}_symbols"]
        idx = raw[f"c{i}_indexes"]
        cdfs = raw[f"c{i}_cdfs"]
        lengths = raw[f"c{i}_lengths"]
        offsets = raw[f"c{i}_offsets"]
        cai_stream = raw[f"c{i}_stream"].tobytes()
        ours = RansEncoder().encode_with_indexes(
            sym, idx, cdfs, lengths, offsets)
        assert ours == cai_stream, f"case {i}: encode bytes differ"
        out = RansDecoder(cai_stream).decode_stream(
            idx, cdfs, lengths, offsets)
        assert np.array_equal(out, sym), f"case {i}: decode mismatch"
