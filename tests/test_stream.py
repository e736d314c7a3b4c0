"""Pipelined serving (inference_stream) == sequential inference, bit-exact.

The stream path reorders only the host<->device interleaving (image i's
pull/framing overlap image i+1's dispatch); the compiled programs and
their inputs are identical, so streams and reconstructions must match
sequential ``inference`` byte-for-byte. Covers both coders and both the
composed HyresCodec and the plain CheckerboardCodec, plus the eager
fallback used by families without a dispatch split (ELIC).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _flat_bytes(obj):
    if isinstance(obj, (bytes, bytearray)):
        return [bytes(obj)]
    out = []
    for o in obj:
        out.extend(_flat_bytes(o))
    return out


def _mk(model_name, coder):
    from hyres_tpu.models.hyres import HyresCodec, ResidualJPEGCompression
    from hyres_tpu.models import (
        CheckerboardCodec, Cheng2020Codec, Cheng2020withCheckerboard,
        ElicCodec, LightWeightCheckerboard, LightWeightELIC,
    )

    if model_name == "hyres":
        model = ResidualJPEGCompression(N=16, M=24, jpeg_quality=10)
        wrap = HyresCodec
    elif model_name == "checkerboard":
        model = LightWeightCheckerboard(N=16, M=24)
        wrap = CheckerboardCodec
    elif model_name == "elic":
        model = LightWeightELIC(N=16, M=24, groups=(4, 4, 8, 8))
        wrap = ElicCodec
    else:
        model = Cheng2020withCheckerboard(N=24)
        wrap = Cheng2020Codec
    codec = wrap(model, model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
        noisequant=True, rng=jax.random.key(1)), coder=coder)
    codec.update(force=True)
    return codec


@pytest.mark.parametrize("model_name,coder", [
    ("hyres", "host"), ("hyres", "tpu"),
    ("checkerboard", "host"), ("checkerboard", "tpu"),
    ("elic", "host"),  # eager fallback path (host per-slice codings)
    ("elic", "tpu"),  # 11-plane single-pull dispatch split
    ("cheng2020", "tpu"),  # 3-plane dispatch split + host-fallback syms
])
def test_stream_matches_sequential(model_name, coder, kodim01):
    codec = _mk(model_name, coder)
    xs = [jnp.asarray(kodim01[None, 64 * i: 64 * (i + 1), :64])
          for i in range(3)]

    seq = [codec.inference(x) for x in xs]
    # reset the speculative-pull state so the stream starts cold like the
    # sequential pass did (content must be identical either way; this
    # just makes the comparison independent of pull-slicing history)
    codec.__dict__.pop("_enc_cap_state", None)
    if hasattr(codec, "_residual"):
        codec._residual.__dict__.pop("_enc_cap_state", None)
    stream = codec.inference_stream(xs, depth=2)

    assert len(stream) == len(seq)
    for s, q in zip(stream, seq):
        assert _flat_bytes(s["compressed"]["strings"]
                           if "compressed" in s else s["strings"]) == \
            _flat_bytes(q["compressed"]["strings"]
                        if "compressed" in q else q["strings"])
        if "compressed" in q and "jpeg_buffers" in q["compressed"]:
            assert (s["compressed"]["jpeg_buffers"]
                    == q["compressed"]["jpeg_buffers"])
        np.testing.assert_array_equal(np.asarray(s["x_hat"]),
                                      np.asarray(q["x_hat"]))


def test_stream_depth_one_and_large(kodim01):
    """depth=1 (no overlap) and depth > len(xs) both preserve order."""
    codec = _mk("checkerboard", "tpu")
    xs = [jnp.asarray(kodim01[None, 64 * i: 64 * (i + 1), :64])
          for i in range(3)]
    ref = [np.asarray(codec.inference(x)["x_hat"]) for x in xs]
    for depth in (1, 8):
        got = codec.inference_stream(xs, depth=depth)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(g["x_hat"]), r)


def test_stream_batched_tensors(kodim01):
    """inference_stream over BATCHED tensors (the CLI's --batch+--stream
    composition): pipelined 2-image batches are bit-identical to
    sequential batched inference on the same tensors."""
    codec = _mk("hyres", "tpu")
    xs = [jnp.stack([jnp.asarray(kodim01[64 * i: 64 * (i + 1), :64]),
                     jnp.asarray(kodim01[64 * i: 64 * (i + 1), 64:128])])
          for i in range(2)]

    seq = [codec.inference(x) for x in xs]
    codec._residual.__dict__.pop("_enc_cap_state", None)
    stream = codec.inference_stream(xs, depth=2)

    for s, q in zip(stream, seq):
        assert _flat_bytes(s["compressed"]["strings"]) == \
            _flat_bytes(q["compressed"]["strings"])
        assert (s["compressed"]["jpeg_buffers"]
                == q["compressed"]["jpeg_buffers"])
        np.testing.assert_array_equal(np.asarray(s["x_hat"]),
                                      np.asarray(q["x_hat"]))
