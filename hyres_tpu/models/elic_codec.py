"""ElicCodec: per-slice entropy-coded compress/decompress.

Host choreography for LightWeightELIC mirroring the reference's coder
(/root/reference/models/elic.py:410-594): per slice, anchor pass then
non-anchor pass, each coding a width-halved dense packing of the parity
class. Returns the reference contract:

  compress -> {"strings": [y_strings(anchor/non-anchor interleaved),
               z_strings], "shape", "time" + per-stage timers}
  decompress(strings, shape) -> {"x_hat", "time"}

Same bit-exactness invariant as CheckerboardCodec: every coder-facing
tensor comes from decoder-side compiled programs that the encoder reuses.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
from .codec import (_decode_planes, _encode_planes,
                    count_host_fallback, pad_to_multiple)


class ElicCodec(CodecBase):
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
        def dec_hyper(z_sym):
            med = apply(model.eb_medians)
            z_hat = z_sym.astype(jnp.float32) + med
            means, scales = apply(model.hyper_synthesis, z_hat)
            return means, scales

        @functools.partial(jax.jit, static_argnums=(0,))
        def dec_support(i, y_first, y_prev, means, scales):
            return apply(model.slice_support, i, y_first, y_prev, means, scales)

        @functools.partial(jax.jit, static_argnums=(0,))
        def dec_anchor(i, support):
            m, s = apply(model.slice_anchor_params, i, support)
            m_p = checkerboard.pack(m, ANCHOR)
            idx = build_indexes(checkerboard.pack(s, ANCHOR), table).astype(jnp.uint8)
            return idx, m_p

        @functools.partial(jax.jit, static_argnums=(0,))
        def dec_nonanchor(i, support, a_sym, ma_p):
            y_anchor_hat = checkerboard.unpack(a_sym.astype(ma_p.dtype) + ma_p,
                                               ANCHOR)
            m, s = apply(model.slice_nonanchor_params, i, support, y_anchor_hat)
            m_p = checkerboard.pack(m, NON_ANCHOR)
            idx = build_indexes(checkerboard.pack(s, NON_ANCHOR), table).astype(jnp.uint8)
            return y_anchor_hat, idx, m_p

        @jax.jit
        def dec_combine(y_anchor_hat, n_sym, mn_p):
            return y_anchor_hat + checkerboard.unpack(
                n_sym.astype(mn_p.dtype) + mn_p, NON_ANCHOR)

        clamp = self.clamp

        @jax.jit
        def dec_synthesis(y_hat_slices):
            x_hat = apply(model.synthesis, jnp.concatenate(y_hat_slices, axis=-1))
            if clamp is not None:
                x_hat = jnp.clip(x_hat, clamp[0], clamp[1])
            return x_hat

        @functools.partial(jax.jit, static_argnums=(2,))
        def enc_symbols(y_slice, means_packed, parity):
            return quantize_symbols_i16(checkerboard.pack(y_slice, parity),
                                        means_packed)

        self._enc_analysis = enc_analysis
        self._enc_symbols = enc_symbols
        self._dec_hyper = dec_hyper
        self._dec_support = dec_support
        self._dec_anchor = dec_anchor
        self._dec_nonanchor = dec_nonanchor
        self._dec_combine = dec_combine
        self._dec_synthesis = dec_synthesis

    def _slice_bounds(self):
        bounds, acc = [], 0
        for g in self.model.groups[:-1]:
            acc += g
            bounds.append(acc)
        return bounds

    # -- public API -------------------------------------------------------------

    def compress(self, x: jax.Array) -> Dict:
        self._require_tables()
        if self.tpu_coder is not None:
            return self._compress_tpu(x)
        # per-stage timers are part of the reference's return contract
        # (elic.py:414-431: y_enc / z_enc / z_dec / params)
        t_start = time.time()
        size = (int(x.shape[1]), int(x.shape[2]))
        x = pad_to_multiple(x, 64)
        y, z_sym = self._enc_analysis(x)
        jax.block_until_ready(z_sym)
        t_y_enc = time.time() - t_start
        t0 = time.time()
        means, scales = self._dec_hyper(z_sym)
        jax.block_until_ready(means)
        t_z_dec = time.time() - t0
        t_params = time.time()
        y_slices = jnp.split(y, self._slice_bounds(), axis=-1)

        y_strings: List[List[bytes]] = []
        y_hat_slices: List[jax.Array] = []
        gt = self.gauss_tables
        for i, y_slice in enumerate(y_slices):
            support = self._dec_support(
                i, y_hat_slices[0] if y_hat_slices else means[..., :0],
                y_hat_slices[-1] if y_hat_slices else means[..., :0],
                means, scales)
            a_idx, ma_p = self._dec_anchor(i, support)
            a_sym = self._enc_symbols(y_slice, ma_p, ANCHOR)
            y_strings.append(_encode_planes(np.asarray(a_sym), np.asarray(a_idx), gt))

            y_anchor_hat, n_idx, mn_p = self._dec_nonanchor(i, support, a_sym, ma_p)
            n_sym = self._enc_symbols(y_slice, mn_p, NON_ANCHOR)
            y_strings.append(_encode_planes(np.asarray(n_sym), np.asarray(n_idx), gt))
            y_hat_slices.append(self._dec_combine(y_anchor_hat, n_sym, mn_p))

        t_params = time.time() - t_params
        t0 = time.time()
        z_strings = self._eb_encode(np.asarray(z_sym))
        t_z_enc = time.time() - t0
        return {
            "strings": [y_strings, z_strings],
            "shape": (int(z_sym.shape[1]), int(z_sym.shape[2])),
            "size": size,
            "time": time.time() - t_start,
            "stage_times": {"y_enc": t_y_enc, "z_enc": t_z_enc,
                            "z_dec": t_z_dec, "params": t_params},
        }

    def _compress_tpu(self, x: jax.Array) -> Dict:
        """Single-sync encode: the whole 21-program slice chain plus the
        11 per-plane rANS encode scans are enqueued async; ONE host
        transfer pulls every compacted stream (vs 22 host codings in the
        host path — the reference's per-slice CompressAI calls,
        /root/reference/models/elic.py:410-495)."""
        return self._compress_finish(self._compress_dispatch(x))

    def _compress_dispatch(self, x: jax.Array):
        """Async half of compress for the pipelined serving path
        (CodecBase.inference_stream): enqueue the slice chain, the rANS
        encode scans, and the pull's pack program — no host sync. The
        host-coder ELIC stays eager (its per-slice host codings are
        inherently synchronous)."""
        self._require_tables()
        if self.tpu_coder is None:
            return ("eager", self.compress(x))
        tc = self.tpu_coder
        t_start = time.time()
        size = (int(x.shape[1]), int(x.shape[2]))
        x = pad_to_multiple(x, 64)
        y, z_sym = self._enc_analysis(x)
        means, scales = self._dec_hyper(z_sym)
        y_slices = jnp.split(y, self._slice_bounds(), axis=-1)

        encs = []
        y_hat_slices: List[jax.Array] = []
        for i, y_slice in enumerate(y_slices):
            support = self._dec_support(
                i, y_hat_slices[0] if y_hat_slices else means[..., :0],
                y_hat_slices[-1] if y_hat_slices else means[..., :0],
                means, scales)
            a_idx, ma_p = self._dec_anchor(i, support)
            a_sym = self._enc_symbols(y_slice, ma_p, ANCHOR)
            encs.append(tc.encode_gauss(a_sym, a_idx))
            y_anchor_hat, n_idx, mn_p = self._dec_nonanchor(i, support, a_sym, ma_p)
            n_sym = self._enc_symbols(y_slice, mn_p, NON_ANCHOR)
            encs.append(tc.encode_gauss(n_sym, n_idx))
            y_hat_slices.append(self._dec_combine(y_anchor_hat, n_sym, mn_p))
        enc_z = tc.encode_eb(z_sym)

        from .codec import pull_encs_dispatch

        # all 11 planes ride one pull (one u8 wire blob at B==1; tiny
        # size pull + bucket-sliced blob at B>=2 — see codec.py's
        # two-phase notes; the unpacked pytree would otherwise be 66
        # separate ~25 ms-latency transfers)
        finish_pull = pull_encs_dispatch(
            encs + [enc_z], cap_state=self.__dict__.setdefault(
                "_enc_cap_state", {}))
        t_enqueue = time.time() - t_start
        z_shape = (int(z_sym.shape[1]), int(z_sym.shape[2]))
        return ("tpu", (finish_pull, x, z_shape, size, t_start, t_enqueue))

    def _compress_finish(self, state) -> Dict:
        kind, payload = state
        if kind == "eager":
            return payload
        finish_pull, x_padded, z_shape, size, t_start, t_enqueue = payload
        tc = self.tpu_coder
        try:
            unpacked, _ = finish_pull()
            t_sync = time.time() - t_start - t_enqueue
            encs, enc_z = unpacked[:-1], unpacked[-1]
            y_strings = [tc.frames_from_enc(e) for e in encs]
            z_strings = tc.frames_from_enc(enc_z)
        except OverflowError as e:
            count_host_fallback(e)
            # x is already padded here; the host path would recompute
            # "size" from the padded shape, so the true size is forced
            return self._compress_host_fallback(x_padded, size)
        return {
            "strings": [y_strings, z_strings],
            "shape": z_shape,
            "size": size,
            "time": time.time() - t_start,
            # the per-stage attribution of the host path (y_enc/z_enc/
            # z_dec/params, reference elic.py:414-431) does not exist in
            # single-sync mode: every stage is enqueued async and the one
            # sync covers all device work
            "stage_times": {"enqueue": t_enqueue, "sync": t_sync},
        }

    def _compress_host_fallback(self, x: jax.Array,
                                size: Tuple[int, int]) -> Dict:
        saved, self.tpu_coder = self.tpu_coder, None
        try:
            out = self.compress(x)
            out["size"] = size  # x may already be padded (see caller)
            return out
        finally:
            self.tpu_coder = saved

    def decompress(self, strings, shape, size=None) -> Dict:
        self._require_tables()
        if self.tpu_coder is not None:
            out = self._decompress_tpu(strings, shape, size)
            if out is not None:
                return out
        from ..coding import tpu_rans
        if strings[1] and tpu_rans.is_tpu_frame(strings[1][0]):
            raise ValueError(
                "payload is TPU-coder framed but this codec decodes with "
                "the host coder; construct the codec with coder='tpu'")
        t_start = time.time()
        z_sym = narrow_symbols_i16(self._eb_decode(strings[1], shape))
        means, scales = self._dec_hyper(jnp.asarray(z_sym))

        y_strings = strings[0]
        y_hat_slices: List[jax.Array] = []
        gt = self.gauss_tables
        for i in range(len(self.model.groups)):
            support = self._dec_support(
                i, y_hat_slices[0] if y_hat_slices else means[..., :0],
                y_hat_slices[-1] if y_hat_slices else means[..., :0],
                means, scales)
            a_idx, ma_p = self._dec_anchor(i, support)
            a_sym = jnp.asarray(narrow_symbols_i16(_decode_planes(
                y_strings[2 * i], np.asarray(a_idx), gt)))
            y_anchor_hat, n_idx, mn_p = self._dec_nonanchor(i, support, a_sym, ma_p)
            n_sym = jnp.asarray(narrow_symbols_i16(_decode_planes(
                y_strings[2 * i + 1], np.asarray(n_idx), gt)))
            y_hat_slices.append(self._dec_combine(y_anchor_hat, n_sym, mn_p))

        x_hat = self._dec_synthesis(y_hat_slices)
        if size is not None:
            x_hat = x_hat[:, : size[0], : size[1], :]
        x_hat.block_until_ready()
        return {"x_hat": x_hat, "time": time.time() - t_start}

    def _decompress_dispatch(self, strings, shape, size=None):
        """Async half of decompress (pipelined serving): host unframe +
        ONE upload + the all-device decode chain, returned WITHOUT the
        final sync as (x_hat, start). Host-coder codecs and host-framed
        payloads degrade to the eager decompress (already synced)."""
        if self.tpu_coder is not None:
            disp = self._decompress_tpu_dispatch(strings, shape, size)
            if disp is not None:
                return disp
        start = time.time()
        return self.decompress(strings, shape, size)["x_hat"], start

    def _decompress_tpu(self, strings, shape, size=None) -> Dict | None:
        disp = self._decompress_tpu_dispatch(strings, shape, size)
        if disp is None:
            return None
        x_hat, t_start = disp
        x_hat.block_until_ready()
        return {"x_hat": x_hat, "time": time.time() - t_start}

    def _decompress_tpu_dispatch(self, strings, shape, size=None):
        """All-device decode: 10 per-slice rANS scans interleaved with the
        shared stage programs, no host sync at all (the caller syncs on
        x_hat). Returns None for host-framed payloads."""
        from .codec import TpuPlaneCoder

        tc = self.tpu_coder
        t_start = time.time()
        B = len(strings[1])
        C = self.eb_tables.cdf_length.shape[0]
        n_z = shape[0] * shape[1] * C
        H, W = shape[0] * 4, shape[1] * 4
        uz = TpuPlaneCoder.unframe_batch(strings[1], n_z)
        if uz is None:
            return None
        uys = []
        for i, g in enumerate(self.model.groups):
            n_plane = H * (W // 2) * g
            for k in (0, 1):
                u = TpuPlaneCoder.unframe_batch(strings[0][2 * i + k], n_plane)
                if u is None:
                    return None
                uys.append(u)

        from .codec import upload_frames

        # ONE host->device transfer for all 11 planes' decode inputs
        # (states + escape lists + streams: 44 arrays otherwise)
        uploaded, _ = upload_frames(list(uys) + [uz])
        uys, uz = uploaded[:-1], uploaded[-1]
        z_sym = tc.decode_eb(uz[2], uz[1], uz[3], uz[4],
                             (B, shape[0], shape[1], C), uz[0])
        means, scales = self._dec_hyper(z_sym)
        y_hat_slices: List[jax.Array] = []
        for i in range(len(self.model.groups)):
            support = self._dec_support(
                i, y_hat_slices[0] if y_hat_slices else means[..., :0],
                y_hat_slices[-1] if y_hat_slices else means[..., :0],
                means, scales)
            a_idx, ma_p = self._dec_anchor(i, support)
            ua = uys[2 * i]
            a_sym = tc.decode_gauss(ua[2], ua[1], a_idx, ua[3], ua[4], ua[0])
            y_anchor_hat, n_idx, mn_p = self._dec_nonanchor(i, support, a_sym, ma_p)
            un = uys[2 * i + 1]
            n_sym = tc.decode_gauss(un[2], un[1], n_idx, un[3], un[4], un[0])
            y_hat_slices.append(self._dec_combine(y_anchor_hat, n_sym, mn_p))

        x_hat = self._dec_synthesis(y_hat_slices)
        if size is not None:
            x_hat = x_hat[:, : size[0], : size[1], :]
        return x_hat, t_start
