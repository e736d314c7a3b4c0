"""JPEG engine: DCT golden vs scipy, rate/PSNR parity vs libjpeg (PIL)."""

import io

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.fft
from PIL import Image

from hyres_tpu.jpeg import JpegCodec, ParsedJpeg, jpeg_roundtrip
from hyres_tpu.jpeg import core, tables


def test_dct_matrix_orthonormal():
    d = np.asarray(core.dct_matrix())
    np.testing.assert_allclose(d @ d.T, np.eye(8), atol=1e-6)


def test_fdct_matches_scipy(rng_np):
    blocks = rng_np.random((1, 16, 16)).astype(np.float32) * 255
    d = np.asarray(core.dct_matrix())
    got = np.asarray(core._blockify(jnp.asarray(blocks)) - 128.0)
    got = np.einsum("ux,bijxy,vy->bijuv", d, got, d)
    want = scipy.fft.dctn(
        np.asarray(core._blockify(jnp.asarray(blocks))) - 128.0,
        axes=(-2, -1), norm="ortho")
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_quality_tables_match_ijg():
    # libjpeg at quality 50 returns the base tables unchanged
    qy, qc = tables.quality_to_qtables(50)
    assert np.array_equal(qy, tables.BASE_LUMA_QT)
    assert np.array_equal(qc, tables.BASE_CHROMA_QT)
    qy1, _ = tables.quality_to_qtables(1)
    assert qy1.max() == 255 and qy1.min() >= 1
    qy100, _ = tables.quality_to_qtables(100)
    assert np.all(qy100 == 1)


@pytest.mark.parametrize("quality", [1, 50, 90])
def test_rate_and_psnr_parity_vs_libjpeg(kodim01, quality):
    x = jnp.asarray(kodim01[None])
    codec = JpegCodec(quality)
    dec, bpp = codec(x)
    bufs = codec.compress(x)
    num_px = kodim01.shape[0] * kodim01.shape[1]
    real_bpp = len(bufs[0]) * 8 / num_px

    img = Image.fromarray((kodim01 * 255).astype(np.uint8))
    bio = io.BytesIO()
    img.save(bio, "JPEG", quality=quality)
    pil_bpp = len(bio.getvalue()) * 8 / num_px
    pil_dec = np.asarray(Image.open(io.BytesIO(bio.getvalue())), np.float32) / 255

    # on-device estimate within 1% of our real bytes; bytes within 2% of libjpeg
    assert abs(float(bpp) - real_bpp) / real_bpp < 0.01
    assert abs(real_bpp - pil_bpp) / pil_bpp < 0.02

    psnr = -10 * np.log10(np.mean((np.asarray(dec)[0] - kodim01) ** 2))
    pil_psnr = -10 * np.log10(np.mean((pil_dec - kodim01) ** 2))
    assert abs(psnr - pil_psnr) < 0.2


def test_bitstream_roundtrip_bit_consistent(kodim01):
    x = jnp.asarray(kodim01[None])
    codec = JpegCodec(10)
    dec_dev, _ = codec(x)
    dec_host = codec.decompress(codec.compress(x))
    np.testing.assert_allclose(np.asarray(dec_host), np.asarray(dec_dev), atol=1e-6)


def test_parse_libjpeg_stream(kodim01):
    img = Image.fromarray((kodim01 * 255).astype(np.uint8))
    bio = io.BytesIO()
    img.save(bio, "JPEG", quality=30)
    p = ParsedJpeg(bio.getvalue())
    assert (p.width, p.height) == (kodim01.shape[1], kodim01.shape[0])
    assert p.ncomp == 3 and p.sampling[0] == (2, 2)
    # decode PIL's coefficients through our TPU path; must match PIL's decode
    dec = core.decode_with_qtables(
        jnp.asarray(p.coeffs[0])[None], jnp.asarray(p.coeffs[1])[None],
        jnp.asarray(p.coeffs[2])[None], p.qtables[0], p.qtables[1],
        p.height, p.width)
    pil_dec = np.asarray(Image.open(io.BytesIO(bio.getvalue())), np.float32) / 255
    err = np.mean((np.asarray(dec)[0] - pil_dec) ** 2)
    assert -10 * np.log10(err) > 35  # only IDCT/upsample rounding differs


def test_corrupt_streams_rejected():
    for bad in (b"", b"\xff\xd8junkjunk", b"\xff\xd8\xff\xdb\x00\x04"):
        with pytest.raises(ValueError):
            ParsedJpeg(bad)


def test_odd_sizes(rng_np):
    x = jnp.asarray(rng_np.random((2, 37, 53, 3)).astype(np.float32))
    dec, bpp = jpeg_roundtrip(x, 50)
    assert dec.shape == x.shape
    codec = JpegCodec(50)
    out = codec.decompress(codec.compress(x))
    assert out.shape == x.shape


def test_golden_kodim01_q1_regression(kodim01):
    """Regression pin: known-good values measured against libjpeg
    (SURVEY §4e golden-file prescription)."""
    x = jnp.asarray(kodim01[None])
    dec, bpp = jpeg_roundtrip(x, 1)
    psnr = -10 * np.log10(np.mean((np.asarray(dec)[0] - kodim01) ** 2))
    assert abs(float(bpp[0]) - 0.1907) < 0.003
    assert abs(psnr - 19.96) < 0.1


def test_fuzz_parser_no_crash(kodim01, rng_np):
    """Mutated valid streams + random garbage must never crash the C++
    parser — either parse or raise ValueError."""
    import io
    from PIL import Image as _Image

    img = _Image.fromarray((kodim01[:64, :64] * 255).astype(np.uint8))
    bio = io.BytesIO()
    img.save(bio, "JPEG", quality=30)
    base = bytearray(bio.getvalue())
    for trial in range(300):
        buf = bytearray(base)
        for _ in range(int(rng_np.integers(1, 8))):
            pos = int(rng_np.integers(0, len(buf)))
            buf[pos] = int(rng_np.integers(0, 256))
        try:
            ParsedJpeg(bytes(buf))
        except ValueError:
            pass
    for trial in range(100):
        n = int(rng_np.integers(4, 400))
        junk = b"\xff\xd8" + bytes(rng_np.integers(0, 256, n).astype(np.uint8))
        try:
            ParsedJpeg(junk)
        except ValueError:
            pass


def test_fuzz_rans_decoder_no_crash(rng_np):
    """Random bytes through the rANS decoder: bounded reads, no crash."""
    from hyres_tpu.coding import RansDecoder
    from hyres_tpu.entropy import build_gaussian_tables, get_scale_table

    t = build_gaussian_tables(get_scale_table())
    idx = rng_np.integers(0, 64, 5000).astype(np.int32)
    for trial in range(50):
        n = int(rng_np.integers(0, 200))
        junk = bytes(rng_np.integers(0, 256, n).astype(np.uint8))
        out = RansDecoder(junk).decode_stream(
            idx, t.quantized_cdf, t.cdf_length, t.offset)
        assert out.shape == idx.shape  # garbage symbols, but no crash
