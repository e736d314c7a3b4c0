"""Cheng2020Codec: two-pass coding over ONE buffered rANS stream.

Mirrors the reference coder exactly (/root/reference/models/
cheng2020.py:106-192): both passes' symbols are pushed into a single
BufferedRansEncoder and flushed once, so ``strings`` is
``[[y_string], z_strings]``; decode reads the same stream sequentially.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..coding import BufferedRansEncoder, RansDecoder
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
from .base import CodecBase
from .cheng2020 import CHENG_ANCHOR, CHENG_NONANCHOR
from .codec import (_encode_planes, _lut_for, count_host_fallback,
                    pad_to_multiple)


class Cheng2020Codec(CodecBase):
    def _build_jits(self):
        model, params = self.model, self.params
        table = jnp.asarray(get_scale_table())

        def apply(method, *args):
            return model.apply(params, *args, method=method)

        @jax.jit
        def enc_analysis(x):
            y, z = apply(model.analysis, x)
            med = apply(model.eb_medians)
            return y, quantize_symbols_i16(z, med)

        @jax.jit
        def dec_anchor(z_sym):
            med = apply(model.eb_medians)
            z_hat = z_sym.astype(jnp.float32) + med
            hyper = apply(model.hyper_synthesis, z_hat)
            zeros_ctx = jnp.zeros(hyper.shape[:-1] + (2 * model.N,), hyper.dtype)
            scales, means = apply(model.entropy_params, zeros_ctx, hyper)
            sa_p = checkerboard.pack(scales, CHENG_ANCHOR)
            ma_p = checkerboard.pack(means, CHENG_ANCHOR)
            return hyper, build_indexes(sa_p, table).astype(jnp.uint8), ma_p

        @jax.jit
        def dec_nonanchor(hyper, a_sym, ma_p):
            y_anchor_hat = checkerboard.unpack(
                a_sym.astype(ma_p.dtype) + ma_p, CHENG_ANCHOR)
            ctx = apply(model.context, y_anchor_hat)
            H, W = ctx.shape[1], ctx.shape[2]
            ctx = ctx * checkerboard.parity_mask(H, W, CHENG_NONANCHOR, ctx.dtype)
            scales, means = apply(model.entropy_params, ctx, hyper)
            sn_p = checkerboard.pack(scales, CHENG_NONANCHOR)
            mn_p = checkerboard.pack(means, CHENG_NONANCHOR)
            return y_anchor_hat, build_indexes(sn_p, table).astype(jnp.uint8), mn_p

        clamp = self.clamp

        @jax.jit
        def dec_synthesis(y_anchor_hat, n_sym, mn_p):
            y_hat = y_anchor_hat + checkerboard.unpack(
                n_sym.astype(mn_p.dtype) + mn_p, CHENG_NONANCHOR)
            x_hat = apply(model.synthesis, y_hat)
            if clamp is not None:
                x_hat = jnp.clip(x_hat, clamp[0], clamp[1])
            return x_hat

        @functools.partial(jax.jit, static_argnums=(2,))
        def enc_symbols(y, means_packed, parity):
            return quantize_symbols_i16(checkerboard.pack(y, parity),
                                        means_packed)

        self._enc_analysis = enc_analysis
        self._enc_symbols = enc_symbols
        self._dec_anchor = dec_anchor
        self._dec_nonanchor = dec_nonanchor
        self._dec_synthesis = dec_synthesis

    def compress(self, x: jax.Array) -> Dict:
        return self._compress_finish(self._compress_dispatch(x))

    def _compress_dispatch(self, x: jax.Array):
        """Async half of compress for the pipelined serving path
        (CodecBase.inference_stream): analysis + both passes' stage
        programs + encode scans + the pull's pack program enqueue with
        no host sync under the TPU coder. The symbol/index arrays ride
        the state so an OverflowError at pull time can re-code on the
        host single-stream coder without recomputing the stages."""
        self._require_tables()
        start = time.time()
        size = (int(x.shape[1]), int(x.shape[2]))
        x = pad_to_multiple(x, 64)
        y, z_sym = self._enc_analysis(x)
        hyper, a_idx, ma_p = self._dec_anchor(z_sym)
        a_sym = self._enc_symbols(y, ma_p, CHENG_ANCHOR)
        _, n_idx, mn_p = self._dec_nonanchor(hyper, a_sym, ma_p)
        n_sym = self._enc_symbols(y, mn_p, CHENG_NONANCHOR)

        syms = (z_sym, a_sym, a_idx, n_sym, n_idx)
        if self.tpu_coder is None:
            return ("host", (syms, size, start))
        from .codec import pull_encs_dispatch

        encs = self.tpu_coder.encode_all(z_sym, a_sym, a_idx, n_sym, n_idx)
        finish_pull = pull_encs_dispatch(
            encs, cap_state=self.__dict__.setdefault("_enc_cap_state", {}))
        return ("tpu", (finish_pull, syms, size, start))

    def _compress_finish(self, state) -> Dict:
        kind, payload = state
        if kind == "tpu":
            finish_pull, syms, size, start = payload
            z_sym = syms[0]
            tc = self.tpu_coder
            try:
                (enc_z, enc_a, enc_n), _ = finish_pull()
                # TPU mode: the two passes are separate per-image frame
                # LISTS (like the checkerboard layout) instead of the
                # reference's single flushed stream; decode dispatches on
                # the nesting structure
                y_strings = [tc.frames_from_enc(enc_a),
                             tc.frames_from_enc(enc_n)]
                z_strings = tc.frames_from_enc(enc_z)
                return {
                    "strings": [y_strings, z_strings],
                    "shape": (int(z_sym.shape[1]), int(z_sym.shape[2])),
                    "size": size,
                    "time": time.time() - start,
                }
            except OverflowError as e:
                count_host_fallback(e)
                # fall through to the host single-stream coder
        else:
            syms, size, start = payload
        z_sym, a_sym, a_idx, n_sym, n_idx = syms

        gt = self.gauss_tables
        a_sym_np, a_idx_np = np.asarray(a_sym), np.asarray(a_idx)
        n_sym_np, n_idx_np = np.asarray(n_sym), np.asarray(n_idx)
        y_strings = []
        for i in range(a_sym_np.shape[0]):
            enc = BufferedRansEncoder()
            enc.encode_with_indexes(a_sym_np[i].ravel(), a_idx_np[i].ravel(),
                                    gt.quantized_cdf, gt.cdf_length, gt.offset)
            enc.encode_with_indexes(n_sym_np[i].ravel(), n_idx_np[i].ravel(),
                                    gt.quantized_cdf, gt.cdf_length, gt.offset)
            y_strings.append(enc.flush())
        z_strings = self._eb_encode(np.asarray(z_sym))
        return {
            "strings": [y_strings, z_strings],
            "shape": (int(z_sym.shape[1]), int(z_sym.shape[2])),
            "size": size,
            "time": time.time() - start,
        }

    def decompress(self, strings, shape, size=None) -> Dict:
        self._require_tables()
        if (self.tpu_coder is not None and strings[0]
                and not isinstance(strings[0][0], (bytes, bytearray))):
            return self._decompress_tpu(strings, shape, size)
        from ..coding import tpu_rans
        if strings[1] and tpu_rans.is_tpu_frame(strings[1][0]):
            raise ValueError(
                "payload is TPU-coder framed but this codec decodes with "
                "the host coder; construct the codec with coder='tpu'")
        start = time.time()
        z_sym = narrow_symbols_i16(self._eb_decode(strings[1], shape))
        hyper, a_idx, ma_p = self._dec_anchor(jnp.asarray(z_sym))

        gt = self.gauss_tables
        a_idx_np = np.asarray(a_idx)
        decoders = [RansDecoder(s) for s in strings[0]]
        a_sym = np.stack([
            d.decode_stream(a_idx_np[i], gt.quantized_cdf, gt.cdf_length,
                            gt.offset, lut=_lut_for(gt))
            for i, d in enumerate(decoders)])
        y_anchor_hat, n_idx, mn_p = self._dec_nonanchor(
            hyper, jnp.asarray(narrow_symbols_i16(a_sym)), ma_p)
        n_idx_np = np.asarray(n_idx)
        n_sym = np.stack([
            d.decode_stream(n_idx_np[i], gt.quantized_cdf, gt.cdf_length,
                            gt.offset, lut=_lut_for(gt))
            for i, d in enumerate(decoders)])
        x_hat = self._dec_synthesis(
            y_anchor_hat, jnp.asarray(narrow_symbols_i16(n_sym)), mn_p)
        if size is not None:
            x_hat = x_hat[:, : size[0], : size[1], :]
        x_hat.block_until_ready()
        return {"x_hat": x_hat, "time": time.time() - start}

    def _decompress_dispatch(self, strings, shape, size=None):
        """Async half of decompress (pipelined serving): returns
        (x_hat, start) WITHOUT the final sync for TPU-framed payloads;
        host-framed payloads degrade to the eager decompress."""
        if (self.tpu_coder is not None and strings[0]
                and not isinstance(strings[0][0], (bytes, bytearray))):
            return self._decompress_tpu_dispatch(strings, shape, size)
        start = time.time()
        return self.decompress(strings, shape, size)["x_hat"], start

    def _decompress_tpu(self, strings, shape, size=None) -> Dict:
        x_hat, start = self._decompress_tpu_dispatch(strings, shape, size)
        x_hat.block_until_ready()
        return {"x_hat": x_hat, "time": time.time() - start}

    def _decompress_tpu_dispatch(self, strings, shape, size=None):
        """All-device decode chain, no host sync (caller syncs on x_hat)."""
        from .codec import TpuPlaneCoder

        tc = self.tpu_coder
        start = time.time()
        B = len(strings[1])
        C = self.eb_tables.cdf_length.shape[0]
        n_z = shape[0] * shape[1] * C
        n_y = shape[0] * 4 * shape[1] * 2 * self.model.N  # packed half-width
        uz = TpuPlaneCoder.unframe_batch(strings[1], n_z)
        ua = TpuPlaneCoder.unframe_batch(strings[0][0], n_y)
        un = TpuPlaneCoder.unframe_batch(strings[0][1], n_y)
        if uz is None or ua is None or un is None:
            raise ValueError("mixed/unknown stream framing in cheng payload")
        from .codec import upload_frames

        # ONE host->device transfer for all planes' decode inputs
        (ua, un, uz), _ = upload_frames((ua, un, uz))
        z_sym = tc.decode_eb(uz[2], uz[1], uz[3], uz[4],
                             (B, shape[0], shape[1], C), uz[0])
        hyper, a_idx, ma_p = self._dec_anchor(z_sym)
        a_sym = tc.decode_gauss(ua[2], ua[1], a_idx, ua[3], ua[4], ua[0])
        y_anchor_hat, n_idx, mn_p = self._dec_nonanchor(hyper, a_sym, ma_p)
        n_sym = tc.decode_gauss(un[2], un[1], n_idx, un[3], un[4], un[0])
        x_hat = self._dec_synthesis(y_anchor_hat, n_sym, mn_p)
        if size is not None:
            x_hat = x_hat[:, : size[0], : size[1], :]
        return x_hat, start
