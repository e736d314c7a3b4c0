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


class TpuPlaneCoder:
    """Device-side rANS coder bound to one baked table set.

    Gaussian (y) planes use the TABLE-FREE analytic coder
    (tpu_rans.gauss_encode/gauss_decode): the 64x3133 scale-table CDFs
    would cost (n, 3133) f32 intermediates in bulk lookups and a
    per-symbol LUT gather in the decode scan — the analytic bounds are
    recomputed on the fly from (bin, sigma) instead, so batching scales.
    Factorized-prior (z) planes keep the baked per-channel tables (their
    densities are learned, not analytic; the tables are tiny).

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
        self.gauss_ana = tpu_rans.build_gauss_analytic(scale_table)
        self.eb_dev = tpu_rans.build_device_tables(eb_tables)

        gauss_ana, eb_dev = self.gauss_ana, self.eb_dev

        def _enc_eb(sym, idx):
            B = sym.shape[0]
            n = int(np.prod(sym.shape[1:]))
            lanes = tpu_rans.lanes_for(n)
            return jax.vmap(
                lambda s, i: tpu_rans.rans_encode(s, i, eb_dev, lanes)
            )(sym.astype(jnp.int32).reshape(B, -1),
              idx.astype(jnp.int32).reshape(B, -1))

        def _enc_gauss(sym, idx):
            B = sym.shape[0]
            n = int(np.prod(sym.shape[1:]))
            lanes = min(tpu_rans.GAUSS_LANES, tpu_rans.lanes_for(n))
            return jax.vmap(
                lambda s, i: tpu_rans.gauss_encode(s, i, gauss_ana, lanes)
            )(sym.astype(jnp.int32).reshape(B, -1),
              idx.astype(jnp.int32).reshape(B, -1))

        def _z_idx(z_sym):
            C = z_sym.shape[-1]
            return jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32), z_sym.shape)

        @jax.jit
        def encode_all(z_sym, a_sym, a_idx, n_sym, n_idx):
            return (_enc_eb(z_sym, _z_idx(z_sym)),
                    _enc_gauss(a_sym, a_idx),
                    _enc_gauss(n_sym, n_idx))

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
            sym = jax.vmap(
                lambda st, sa, ix, ep, ev: tpu_rans.gauss_decode(
                    st, sa, ix, ep, ev, gauss_ana, lanes, n)
            )(stream, states, idx.astype(jnp.int32).reshape(B, -1),
              esc_pos, esc_val)
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
            sym = jax.vmap(
                lambda st, sa, ix, ep, ev: tpu_rans.rans_decode(
                    st, sa, ix, ep, ev, eb_dev, lanes, n)
            )(stream, states, idx, esc_pos, esc_val)
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
        frame is host-coder format, which forces the host decode path)."""
        if not all(tpu_rans.is_tpu_frame(s) for s in strings):
            return None
        parts = [tpu_rans.unframe_plane(s, n) for s in strings]
        lanes = parts[0][0]
        if any(p[0] != lanes for p in parts):
            return None
        return (lanes,
                np.stack([p[1] for p in parts]),
                np.stack([p[2] for p in parts]),
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
        """Single-sync encode: the stage programs and all three rANS
        encode scans are enqueued back-to-back (device-to-device), then
        ONE host transfer pulls the compacted streams (and the caller's
        `extra` device arrays — e.g. HyRES's JPEG coefficients — so the
        whole compress has exactly one sync).

        If ANY plane's escape side list overflows (pathological stats,
        e.g. untrained models), the WHOLE batch re-frames with the host
        coder — formats are never mixed within a compressed payload (the
        decode path picks one choreography for the batch)."""
        tc = self.tpu_coder
        lp, a_idx, ma_p, a_sym = self._dec_stage1(z_sym, y)
        _, n_idx, mn_p, n_sym = self._dec_stage2(lp, a_sym, ma_p, y)
        enc_z, enc_a, enc_n = tc.encode_all(z_sym, a_sym, a_idx, n_sym, n_idx)
        # the single device->host sync
        enc_z, enc_a, enc_n, extra_np = jax.device_get(
            (enc_z, enc_a, enc_n, extra))

        try:
            z_strings = tc.frames_from_enc(enc_z)
            anchor_strings = tc.frames_from_enc(enc_a)
            nonanchor_strings = tc.frames_from_enc(enc_n)
        except OverflowError:
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
        self._require_tables()
        start = time.time()
        stages = self._decode_latent_stages(strings, shape)
        x_hat = self._dec_stage3(*stages)
        if size is not None:
            x_hat = x_hat[:, : size[0], : size[1], :]
        x_hat.block_until_ready()
        return {"x_hat": x_hat, "time": time.time() - start}

    def _decode_latent_stages(self, strings, shape):
        """Shared decode choreography up to (y_anchor_hat, n_sym, mn_p)."""
        tpu = (self._decode_latent_stages_tpu(strings, shape)
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
        return y_anchor_hat, jnp.asarray(n_sym), mn_p

    def _decode_latent_stages_tpu(self, strings, shape):
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
        # pack the three planes' buffers into ONE upload per dtype (each
        # host->device transfer costs ~10s of ms of tunnel latency);
        # device-side slices reuse the per-plane compiled programs
        d_stream = jnp.asarray(
            np.concatenate([ua[2], un[2], uz[2]], axis=1))
        d_states = jnp.asarray(
            np.concatenate([ua[1], un[1], uz[1]], axis=1))
        d_esc = jnp.asarray(
            np.stack([ua[3], ua[4], un[3], un[4], uz[3], uz[4]], axis=1))
        capA, capN = ua[2].shape[1], un[2].shape[1]
        lanesA, lanesN = ua[1].shape[1], un[1].shape[1]
        sA, sN, sZ = (d_stream[:, :capA], d_stream[:, capA:capA + capN],
                      d_stream[:, capA + capN:])
        stA, stN, stZ = (d_states[:, :lanesA],
                         d_states[:, lanesA:lanesA + lanesN],
                         d_states[:, lanesA + lanesN:])
        z_sym = tc.decode_eb(sZ, stZ, d_esc[:, 4], d_esc[:, 5], zshape, uz[0])
        y_zero = jnp.zeros((B, shape[0] * 4, shape[1] * 4, self.model.M),
                           jnp.float32)
        lp, a_idx, ma_p, _ = self._dec_stage1(z_sym, y_zero)
        a_sym = tc.decode_gauss(sA, stA, a_idx, d_esc[:, 0], d_esc[:, 1], ua[0])
        y_anchor_hat, n_idx, mn_p, _ = self._dec_stage2(lp, a_sym, ma_p, y_zero)
        n_sym = tc.decode_gauss(sN, stN, n_idx, d_esc[:, 2], d_esc[:, 3], un[0])
        return y_anchor_hat, n_sym, mn_p
