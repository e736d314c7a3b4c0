"""HyRES composite codec: JPEG base layer + neural residual + refinement.

Re-implements the capability of the reference's
``ResidualJPEGCompression`` (/root/reference/models/hyres.py:9-181):

  forward:  jpeg encode/decode -> residual = x - jpeg(x) -> residual
            codec -> x_hat = clamp(jpeg + res_hat + refine(jpeg + res_hat))
  compress: real JPEG buffers + residual codec strings
  decompress: rebuild from buffers + strings

TPU-first difference: the reference computes the JPEG pass on CPU through
a per-image libturbojpeg loop and ships tensors device<->host every step
(hyres.py:39-53). Here the JPEG transform path is jnp (jpeg/core.py), so
the ENTIRE training forward — JPEG included — is one jit-compiled XLA
graph with exact on-device JPEG rate accounting; real bytes are emitted
only in compress().

Note (SURVEY Q3): the reference accepts an unused ``se_reduction`` arg and
routes nonexistent ``se_block.*`` keys; the SE block actually lives inside
MultiScaleRefine. We keep only the real structure.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..jpeg import (
    assemble_jfif,
    decode_from_coefficients,
    encode_to_coefficients,
    jpeg_roundtrip,
)
from ..jpeg.bitstream import ParsedJpeg
from ..jpeg.tables import quality_to_qtables


def _coef_fit_int8(quality: int) -> bool:
    """True when the quality's quant tables bound every coefficient to
    int8: |DCT coeff| of a level-shifted 8x8 block is < 1024, so a
    minimum quant step of 9 guarantees |quantized| <= 113 < 128."""
    qy, qc = quality_to_qtables(quality)
    return int(min(qy.min(), qc.min())) >= 9
from ..nn import MultiScaleRefine
from .base import CodecBase
from .checkerboard import LightWeightCheckerboard
from .codec import CheckerboardCodec


class ResidualJPEGCompression(nn.Module):
    """JPEG base + checkerboard residual codec + multi-scale refinement.

    Returns the reference forward contract (hyres.py:70-77):
    ``{x_hat, likelihoods, jpeg_bpp_loss, jpeg_decoded, residual,
    residual_hat}``.
    """

    N: int = 128
    M: int = 192
    jpeg_quality: int = 1
    # bf16 activation policy, threaded through the residual codec and the
    # refinement CNN; the JPEG transform path stays f32 (exact DCT rate).
    compute_dtype: Any = None

    def setup(self):
        self.residual_model = LightWeightCheckerboard(
            self.N, self.M, compute_dtype=self.compute_dtype)
        self.refine = MultiScaleRefine(mid_channels=64)

    def refine_stage(self, x_initial: jax.Array) -> jax.Array:
        xc = (x_initial if self.compute_dtype is None
              else x_initial.astype(self.compute_dtype))
        delta = self.refine(xc).astype(jnp.float32)
        return jnp.clip(x_initial + delta, 0.0, 1.0)

    def aux_loss(self) -> jax.Array:
        return self.residual_model.aux_loss()

    def __call__(self, x, noisequant: bool = False,
                 rng: jax.Array | None = None) -> Dict:
        # JPEG base layer — stays on device, no gradients (Q12: the JPEG
        # rate enters the loss as an observed constant).
        jpeg_decoded, jpeg_bpp = jpeg_roundtrip(x, self.jpeg_quality)
        jpeg_decoded = jax.lax.stop_gradient(jpeg_decoded)
        residual = x - jpeg_decoded

        res_out = self.residual_model(residual, noisequant=noisequant, rng=rng)
        residual_hat = res_out["x_hat"]

        x_initial = jpeg_decoded + residual_hat
        x_hat = self.refine_stage(x_initial)

        return {
            "x_hat": x_hat,
            "likelihoods": res_out["likelihoods"],
            "jpeg_bpp_loss": jnp.mean(jpeg_bpp),
            "jpeg_decoded": jpeg_decoded,
            "residual": residual,
            "residual_hat": residual_hat,
        }


class HyresCodec:
    """Deployment wrapper: real JPEG buffers + residual strings.

    API mirrors reference hyres.py:79-134 (`compress` returns the residual
    codec dict plus ``jpeg_buffers``; ``decompress`` takes that dict).
    """

    def __init__(self, model: ResidualJPEGCompression, params,
                 coder: str = "host"):
        self.model = model
        self.params = params
        res_params = {"params": params["params"]["residual_model"]}
        # clamp=None: the inner codec carries a signed residual (the
        # reference's unconditional (0,1) clamp at checkerboard.py:235
        # would zero all negative residual content on decode)
        self._residual = CheckerboardCodec(
            LightWeightCheckerboard(model.N, model.M,
                                    compute_dtype=model.compute_dtype),
            res_params, clamp=None, coder=coder)

        residual = self._residual

        @jax.jit
        def enc_front(x):
            """One fused program: JPEG coefficients + on-device JPEG decode
            + residual + g_a/h_a analysis. None of this is recomputed by
            the decoder, so fusing it does not touch the bit-exactness
            invariant (the shared dec_stage1/2 handle the entropy params).
            """
            coef = encode_to_coefficients(x, model.jpeg_quality)
            dec = decode_from_coefficients(
                coef.y, coef.cb, coef.cr, model.jpeg_quality,
                x.shape[1], x.shape[2])
            res = x - dec
            from .codec import pad_to_multiple

            res64 = pad_to_multiple(res, 64)
            y, z = residual.model.apply(residual.params, res64,
                                        method=residual.model.analysis)
            med = residual.model.apply(residual.params,
                                       method=residual.model.eb_medians)
            from ..entropy import quantize_symbols_i16

            z_sym = quantize_symbols_i16(z, med)
            # coefficients cross to the host for JFIF assembly; when the
            # quant tables bound every |coeff| <= 127 (|DCT coeff| of a
            # level-shifted 8x8 block is <= 1024, so min quant step >= 9
            # guarantees it — true for the production low qualities),
            # int8 halves that transfer. Statically decided: no runtime
            # flag, no extra sync.
            dt = jnp.int8 if _coef_fit_int8(model.jpeg_quality) else jnp.int16
            coef_t = (coef.y.astype(dt), coef.cb.astype(dt),
                      coef.cr.astype(dt))
            B = x.shape[0]
            # one flat buffer for the host hop (a single transfer in the
            # compress sync); the per-plane arrays carry the shapes
            coef_flat = jnp.concatenate(
                [c.reshape(B, -1) for c in coef_t], axis=1)
            return coef_t, coef_flat, y, z_sym

        from ..nn import checkerboard
        from ..nn.checkerboard import NON_ANCHOR

        def _final(y_anchor_hat, n_sym, mn_p, jpeg_decoded):
            # fused residual synthesis + refinement: one device roundtrip
            # instead of two (residual g_s, then refine)
            y_nonanchor_hat = checkerboard.unpack(
                n_sym.astype(mn_p.dtype) + mn_p, NON_ANCHOR)
            res_hat = residual.model.apply(
                residual.params, y_anchor_hat + y_nonanchor_hat,
                method=residual.model.synthesis)
            H, W = jpeg_decoded.shape[1], jpeg_decoded.shape[2]
            x_init = jpeg_decoded + res_hat[:, :H, :W, :]
            return model.apply(self.params, x_init, method=model.refine_stage)

        import functools

        from ..jpeg.core import dequant_idct, upsample_420, ycbcr_to_rgb

        @functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10))
        def dec_final_packed(y_anchor_hat, n_sym, mn_p, coef_u8, qy, qc,
                             itemsize: int, shapes, height: int, width: int,
                             sparse_cap: int | None = None):
            """Fully fused decode tail: the JPEG coefficients arrive as the
            raw byte slice that rode the coder's single upload (see
            codec.py packed wire format) — bitcast + split + dequant/IDCT
            + residual synthesis + refine in ONE program.

            sparse_cap: when set, the byte slice is a sparse coefficient
            layout [pos i32 * cap][val i16 * cap] (positions padded with
            n, dropped by the scatter) instead of the dense plane — JPEG
            coefficients at production qualities are mostly zero, so the
            sparse upload is several times smaller than even the int8
            dense plane."""
            B = coef_u8.shape[0]
            if sparse_cap is not None:
                n_total = sum(int(np.prod(s[1:])) for s in shapes)
                pos = jax.lax.bitcast_convert_type(
                    coef_u8[:, : 4 * sparse_cap].reshape(B, sparse_cap, 4),
                    jnp.int32)
                val = jax.lax.bitcast_convert_type(
                    coef_u8[:, 4 * sparse_cap: 6 * sparse_cap].reshape(
                        B, sparse_cap, 2), jnp.int16)
                coef = jax.vmap(
                    lambda p, v: jnp.zeros((n_total,), jnp.int16)
                    .at[p].set(v, mode="drop"))(pos, val)
            elif itemsize == 1:
                coef = jax.lax.bitcast_convert_type(coef_u8, jnp.int8)
            else:
                coef = jax.lax.bitcast_convert_type(
                    coef_u8.reshape(B, -1, 2), jnp.int16)
            sizes = [int(np.prod(s[1:])) for s in shapes]
            o1, o2 = sizes[0], sizes[0] + sizes[1]
            cy = coef[:, :o1].reshape((B,) + shapes[0][1:]).astype(jnp.int16)
            ccb = coef[:, o1:o2].reshape((B,) + shapes[1][1:]).astype(jnp.int16)
            ccr = coef[:, o2:].reshape((B,) + shapes[2][1:]).astype(jnp.int16)
            y = dequant_idct(cy, qy)
            cb = upsample_420(dequant_idct(ccb, qc))
            cr = upsample_420(dequant_idct(ccr, qc))
            jpeg_decoded = ycbcr_to_rgb(y, cb, cr)[:, :height, :width, :]
            return _final(y_anchor_hat, n_sym, mn_p, jpeg_decoded)

        self._enc_front = enc_front
        self._dec_final_packed = dec_final_packed

    def update(self, scale_table=None, force: bool = False) -> bool:
        return self._residual.update(scale_table=scale_table, force=force)

    def install_tables(self, tables: dict) -> None:
        self._residual.install_tables(tables)

    def compress(self, x: jax.Array) -> Dict:
        return self._compress_finish(self._compress_dispatch(x))

    def _compress_dispatch(self, x: jax.Array):
        """Async half of compress (pipelined serving,
        CodecBase.inference_stream): JPEG front + residual stages +
        encode scans + pull pack enqueue with NO host sync under the TPU
        coder; the JPEG coefficients ride the same pull as ``extra``."""
        start = time.time()
        size = (int(x.shape[1]), int(x.shape[2]))
        (cy, ccb, ccr), coef_flat, y, z_sym = self._enc_front(x)
        shapes = tuple(tuple(c.shape[1:]) for c in (cy, ccb, ccr))
        r = self._residual
        if r.tpu_coder is None:
            return ("host", ((y, z_sym, coef_flat), shapes, size, start))
        r._require_tables()
        disp = r._latents_dispatch_tpu(y, z_sym, extra=coef_flat)
        return ("tpu", ((disp, coef_flat), shapes, size, start))

    def _compress_finish(self, state) -> Dict:
        kind, (enc, shapes, size, start) = state
        r = self._residual
        if kind == "host":
            y, z_sym, coef_flat = enc
            # residual coding + coefficient download share ONE device sync
            out, coefs = r._compress_from_latents(
                y, z_sym, size, start, extra=coef_flat)
        else:
            disp, coef_flat = enc
            out, coefs = r._latents_finish_tpu(disp, size, start,
                                               extra=coef_flat)
        q = self.model.jpeg_quality
        splits = np.cumsum([int(np.prod(s)) for s in shapes[:2]])
        ynp, cbnp, crnp = (
            part.reshape((-1,) + shp).astype(np.int16)
            for part, shp in zip(np.split(coefs, splits, axis=1), shapes))
        jpeg_buffers: List[bytes] = [
            assemble_jfif(ynp[i], cbnp[i], crnp[i], size[1], size[0], q)
            for i in range(ynp.shape[0])
        ]
        out["jpeg_buffers"] = jpeg_buffers
        out["time"] = time.time() - start
        return out

    def decompress(self, compressed: Dict) -> Dict:
        x_hat, start = self._dec_dispatch_from_comp(compressed)
        x_hat.block_until_ready()
        return {"x_hat": x_hat, "time": time.time() - start}

    def _dec_dispatch_from_comp(self, compressed: Dict):
        """Async half of decompress: JFIF parse + ONE upload + the fused
        all-device decode chain; no final sync (pipelined serving)."""
        start = time.time()
        buffers = compressed["jpeg_buffers"]
        planes = [ParsedJpeg(b) for b in buffers]
        p0 = planes[0]
        # the JPEG coefficients ride the residual coder's SINGLE
        # host->device upload as raw bytes (transfer latency is per array
        # over the tunnel), int8 when the values fit; bitcast + split +
        # dequant/IDCT + synthesis + refine all fuse device-side
        stacked = [np.stack([p.coeffs[k] for p in planes]) for k in range(3)]
        flat = np.concatenate([c.reshape(len(planes), -1) for c in stacked],
                              axis=1)
        flat = flat.astype(np.int8 if np.abs(flat).max() <= 127 else np.int16)

        # sparse vs dense upload: coefficients at production qualities are
        # mostly zero, so [pos i32][val i16] pairs beat even the int8
        # dense plane whenever nnz < n/6 (bucketed cap bounds recompiles)
        from .codec import _COEF_BUCKET, _bucket

        B, n = flat.shape
        nnz = int((flat != 0).sum(axis=1).max()) if B else 0
        cap = min(n, _bucket(nnz, _COEF_BUCKET))
        sparse_cap = cap if 6 * cap < n * flat.dtype.itemsize else None
        if sparse_cap is not None:
            pos = np.full((B, sparse_cap), n, np.int32)
            val = np.zeros((B, sparse_cap), np.int16)
            for i in range(B):
                (pi,) = np.nonzero(flat[i])
                pos[i, : pi.size] = pi
                val[i, : pi.size] = flat[i, pi]
            flat_u8 = np.concatenate(
                [pos.view(np.uint8), val.view(np.uint8)], axis=1)
        else:
            flat_u8 = np.ascontiguousarray(flat).view(np.uint8)

        # inline the residual codec's decode stages so the final program
        # fuses JPEG decode + residual synthesis + refinement
        r = self._residual
        r._require_tables()
        y_anchor_hat, n_sym, mn_p, d_coef = r._decode_latent_stages(
            compressed["strings"], compressed["shape"], extra_bytes=flat_u8)
        x_hat = self._dec_final_packed(
            y_anchor_hat, n_sym, mn_p, d_coef,
            jnp.asarray(p0.qtables[0]), jnp.asarray(p0.qtables[1]),
            flat.dtype.itemsize,
            tuple(tuple(s.shape) for s in stacked), p0.height, p0.width,
            sparse_cap)
        return x_hat, start

    def inference(self, x: jax.Array) -> Dict:
        comp = self.compress(x)
        dec = self.decompress(comp)
        return {
            "x_hat": dec["x_hat"],
            "compressed": comp,
            "time": {
                "compression": comp["time"],
                "decompression": dec["time"],
                "total": comp["time"] + dec["time"],
            },
        }

    def inference_stream(self, xs, depth: int = 2) -> List[Dict]:
        """Pipelined roundtrips (see CodecBase.inference_stream — shared
        implementation; HyresCodec composes rather than inherits, so the
        unbound call wires the same hooks)."""
        return CodecBase.inference_stream(self, xs, depth)
