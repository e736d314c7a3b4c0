"""End-to-end verify drive on the REAL chip (the /verify recipe).

1. rANS gaussian roundtrip at trained-rate stats with forced escapes
   (exercises escape_compact + frame/unframe + kernel decode) — EXACT.
2. Full HyRES codec roundtrip on kodim19 with the trained artifact and
   the TPU coder (exercises the whole serving path incl. the
   column-sparse coefficient pull): PSNR floor, zero host fallbacks,
   warm roundtrip wall time.
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import numpy as np
from PIL import Image

# 1. rANS with escapes: exact roundtrip through the changed escape path
from hyres_tpu.coding import tpu_rans as tr
st = np.exp(np.linspace(np.log(0.11), np.log(256.0), 64))
gt = tr.build_gauss_tables(st)
rng = np.random.default_rng(7)
n = 100000
idx = np.minimum(rng.geometric(0.25, (1, n)) - 1 + 8, 40).astype(np.int32)
sym = np.clip(np.round(rng.normal(0, st[idx])), -30000, 30000).astype(np.int32)
sym[0, rng.choice(n, 40, replace=False)] = 31000   # forced escapes
enc = jax.jit(lambda s, i: tr.gauss_encode_batch(s, i, gt, 128))(
    jnp.asarray(sym), jnp.asarray(idx))
f = tr.frame_plane(np.asarray(enc["states"][0]), np.asarray(enc["stream"][0]),
                   int(enc["n_renorm"][0]), np.asarray(enc["esc_pos"][0]),
                   np.asarray(enc["esc_val"][0]), int(enc["n_esc"][0]))
_, states, stream, ep, ev = tr.unframe_plane(f, n)
dec = jax.jit(lambda a,b,c,d,e: tr.gauss_decode_batch(a,b,c,d,e, gt, 128, n))(
    jnp.asarray(stream[None]), jnp.asarray(states[None]), jnp.asarray(idx),
    jnp.asarray(ep[None]), jnp.asarray(ev[None]))
assert np.array_equal(np.asarray(dec), sym), "rANS escape roundtrip FAILED"
H = np.mean(np.log2(np.maximum(st[idx], 0.3)) + 2.05)
print(f"rANS escape roundtrip EXACT; {len(f)*8/n:.3f} bits/sym "
      f"(n_esc={int(enc['n_esc'][0])})", flush=True)

# 2. full HyRES codec roundtrip on kodim19 (trained artifact, TPU coder)
from bench import _load_params
from hyres_tpu.models.hyres import HyresCodec, ResidualJPEGCompression
from hyres_tpu.models import codec as codec_mod
model = ResidualJPEGCompression(N=128, M=192, jpeg_quality=1,
                                compute_dtype=jnp.bfloat16)
params = _load_params(model)
codec = HyresCodec(model, params, coder="tpu")
codec.update(force=True)
x = jnp.asarray(np.asarray(Image.open("/root/reference/data/test/kodim19.png")
                           .convert("RGB"), np.float32)[None] / 255.0)
codec_mod.reset_wire_stats()
comp = codec.compress(x)
dec = codec.decompress(comp)
xh = np.asarray(dec["x_hat"])
mse = float(np.mean((xh - np.asarray(x)) ** 2))
psnr = -10 * np.log10(mse)
print(f"HyRES roundtrip: psnr={psnr:.2f} dB  "
      f"fallbacks={codec_mod.WIRE_STATS['host_fallbacks']}", flush=True)
assert psnr > 25, "roundtrip PSNR floor failed"
assert codec_mod.WIRE_STATS["host_fallbacks"] == 0, "unexpected host fallback"

# timed warm roundtrips (the headline path)
for _ in range(2):
    comp = codec.compress(x); dec = codec.decompress(comp)
    jax.block_until_ready(dec["x_hat"])
ts = []
for _ in range(3):
    t0 = time.time()
    comp = codec.compress(x); dec = codec.decompress(comp)
    jax.block_until_ready(dec["x_hat"])
    ts.append(time.time() - t0)
print(f"warm enc+dec roundtrip: min {min(ts):.4f} s", flush=True)
print("VERIFY OK", flush=True)
