"""On-chip microbenchmark of the TPU rANS coder's device programs.

Answers VERDICT r2 #3's "done" criterion directly: time the decode scan
for a production-sized gaussian plane (295k symbols, 256 lanes — the
768x512 y-plane of HyRES N=128/M=192) and the z bottleneck plane
(49k symbols, 64 lanes), warm, block_until_ready, on whatever backend
jax selects (run on the real chip with the tunnel idle).

Usage: python scripts/coder_microbench.py [--lanes 256] [--n 294912]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hyres_tpu.coding import tpu_rans as tr  # noqa: E402


def _time(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def bench_gauss(n: int, lanes: int, rng: np.random.Generator):
    """Gaussian-conditional plane: encode + decode, report ms + check."""
    scale_table = np.exp(np.linspace(np.log(0.11), np.log(256.0), 64))
    ga = tr.build_gauss_tables(scale_table)
    idx = rng.integers(8, 40, n).astype(np.int32)
    sigma = scale_table[idx]
    sym = np.clip(np.round(rng.normal(0, sigma)), -1000, 1000).astype(np.int32)

    enc_j = jax.jit(lambda s, i: tr.gauss_encode(s, i, ga, lanes))
    t_enc, enc = _time(enc_j, jnp.asarray(sym), jnp.asarray(idx))

    frame = tr.frame_plane(*(np.asarray(enc[k]) for k in
                             ("states", "stream", "n_renorm",
                              "esc_pos", "esc_val", "n_esc")))
    lanes_r, states, stream, esc_pos, esc_val = tr.unframe_plane(frame, n)
    dec_j = jax.jit(lambda st, sa, i, ep, ev: tr.gauss_decode(
        st, sa, i, ep, ev, ga, lanes, n))
    t_dec, dec = _time(dec_j, jnp.asarray(stream), jnp.asarray(states),
                       jnp.asarray(idx), jnp.asarray(esc_pos),
                       jnp.asarray(esc_val))
    ok = bool(np.array_equal(np.asarray(dec), sym))
    T = -(-n // lanes)
    print(f"gauss plane n={n} lanes={lanes} T={T}: "
          f"encode {1e3 * t_enc:.2f} ms  decode {1e3 * t_dec:.2f} ms "
          f"({1e9 * t_dec / n:.1f} ns/sym)  roundtrip_exact={ok}")
    return t_dec


def bench_lut(n: int, lanes: int, rng: np.random.Generator):
    """Factorized (z) plane through the table-driven coder."""
    import types

    pmf = np.exp(-0.5 * ((np.arange(63) - 31) / 6.0) ** 2)
    freqs = np.maximum(1, np.round(pmf / pmf.sum() * 65504)).astype(np.int64)
    freqs = np.concatenate([freqs, [65536 - freqs.sum()]])  # escape bin
    assert freqs[-1] >= 1
    bounds = np.concatenate([[0], np.cumsum(freqs)])        # 65 bounds
    t = types.SimpleNamespace(
        quantized_cdf=bounds[None, :].astype(np.int32),
        cdf_length=np.array([65], np.int32),
        offset=np.array([-31], np.int32))
    tab = tr.build_device_tables(t)
    sym = np.clip(np.round(rng.normal(0, 6.0, n)), -31, 31).astype(np.int32)
    idx = np.zeros(n, np.int32)

    enc_j = jax.jit(lambda s, i: tr.rans_encode(s, i, tab, lanes))
    t_enc, enc = _time(enc_j, jnp.asarray(sym), jnp.asarray(idx))
    frame = tr.frame_plane(*(np.asarray(enc[k]) for k in
                             ("states", "stream", "n_renorm",
                              "esc_pos", "esc_val", "n_esc")))
    _, states, stream, esc_pos, esc_val = tr.unframe_plane(frame, n)
    dec_j = jax.jit(lambda st, sa, i, ep, ev: tr.rans_decode(
        st, sa, i, ep, ev, tab, lanes, n))
    t_dec, dec = _time(dec_j, jnp.asarray(stream), jnp.asarray(states),
                       jnp.asarray(idx), jnp.asarray(esc_pos),
                       jnp.asarray(esc_val))
    ok = bool(np.array_equal(np.asarray(dec), sym))
    print(f"lut   plane n={n} lanes={lanes}: "
          f"encode {1e3 * t_enc:.2f} ms  decode {1e3 * t_dec:.2f} ms "
          f"({1e9 * t_dec / n:.1f} ns/sym)  roundtrip_exact={ok}")
    return t_dec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=294912)   # 96*128*24? no:
    # 768x512 image -> y latent 48*32*192 = 294912 symbols per pass half
    ap.add_argument("--lanes", type=int, default=256)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke testing)")
    ap.add_argument("--sweep", action="store_true",
                    help="sweep lane counts x (prefix, stream-read) "
                         "lowerings for the gaussian plane")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    if args.sweep:
        for lanes in (128, 256, 512):
            for prefix in ("matmul", "ladder"):
                for read in ("slice", "shift"):
                    tr.PREFIX_MODE = prefix
                    tr.STREAM_READ = read
                    print(f"--- lanes={lanes} prefix={prefix} read={read}")
                    bench_gauss(args.n, lanes, rng)
        tr.PREFIX_MODE = "matmul"
        tr.STREAM_READ = "slice"
        return
    bench_gauss(args.n, args.lanes, rng)
    bench_lut(49152, 64, rng)   # z plane: 12*8*512? -> 49k symbols


if __name__ == "__main__":
    main()
