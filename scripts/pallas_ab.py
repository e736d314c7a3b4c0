"""On-chip A/B of the gaussian decode lowerings (XLA scan vs Pallas).

Run on the real TPU. For Kodak-sized y planes at batch 1 and 8:
  1. EXACTNESS: XLA-encoded frames must decode bit-identically through
     both lowerings (v2's exact-integer wire contract, including wide
     trained stats and escapes).
  2. LATENCY: per-plane decode wall time for each lowering — the number
     that decides the GAUSS_IMPL default (the Pallas kernel decodes up
     to 8 images in VPU-sublane lockstep; the XLA scan pays its
     while-loop overhead per image).

Usage: python scripts/pallas_ab.py [--n 294912] [--reps 20]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hyres_tpu.coding import tpu_rans as tr  # noqa: E402
from hyres_tpu.coding import pallas_rans as pr  # noqa: E402


def _planes(rng, B, n, wide):
    """Synthetic planes at TRAINED-plane rates (2-3 bits/sym).

    A uniform draw over all 64 scale bins averages >4 bits/sym and
    overflows the big-plane stream cap (stream_cap: avg-rate buffer,
    overflow -> host-coder fallback by design) — that is the fallback
    path, not the kernel path this script measures. Skew the scale
    index geometrically toward the low bins like real latents; wide=1
    still covers every bin (up to sigma 256) plus forced escapes."""
    st = np.exp(np.linspace(np.log(0.11), np.log(256.0), 64))
    hi = 64 if wide else 40
    idx = np.minimum(rng.geometric(0.12, (B, n)) - 1, hi - 1
                     ).astype(np.int32)
    sym = np.clip(np.round(rng.normal(0, st[idx])), -30000, 30000
                  ).astype(np.int32)
    if wide:  # exercise the escape side-list on every image
        pos = rng.choice(n, 8, replace=False)
        sym[:, pos] = rng.integers(20000, 30000, (B, 8)) * \
            rng.choice([-1, 1], (B, 8))
    return sym, idx


def _unframe(enc, B, n):
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


def _time(fn, *args, reps):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=294912)  # 768x512 y plane
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    lanes = 128
    gt = tr.build_gauss_tables(
        np.exp(np.linspace(np.log(0.11), np.log(256.0), 64)))
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}  n={args.n} lanes={lanes}",
          flush=True)

    for B in (1, 8):
        for wide in (False, True):
            sym, idx = _planes(rng, B, args.n, wide)

            # --- encode A/B: XLA (scan + compaction) vs kernel --------
            enc_x_j = jax.jit(lambda s, i: jax.vmap(
                lambda s2, i2: tr.gauss_encode(s2, i2, gt, lanes)
            )(s, i))
            enc_p_j = jax.jit(lambda s, i: pr.gauss_encode_batch(
                s, i, gt, lanes))
            te_x, enc = _time(enc_x_j, jnp.asarray(sym),
                              jnp.asarray(idx), reps=args.reps)
            te_p, enc_p = _time(enc_p_j, jnp.asarray(sym),
                                jnp.asarray(idx), reps=args.reps)
            enc_same = all(np.array_equal(np.asarray(enc[k]),
                                          np.asarray(enc_p[k]))
                           for k in ("states", "stream", "n_renorm",
                                     "esc_pos", "esc_val", "n_esc"))
            print(f"B={B} wide={int(wide)} ENC: "
                  f"xla {1e3 * te_x:8.2f} ms  "
                  f"pallas {1e3 * te_p:8.2f} ms  "
                  f"bit-identical={enc_same}", flush=True)
            try:
                stream_b, states_b, ep_b, ev_b = _unframe(enc, B, args.n)
            except OverflowError as e:
                # avg-rate stream cap exceeded: production falls back to
                # the host coder at framing time (tpu_rans.frame_plane);
                # nothing to decode on the device path for this config
                print(f"B={B} wide={int(wide)}: stream-cap overflow "
                      f"({e}) -> host-coder fallback case, decode A/B "
                      "skipped", flush=True)
                continue
            idx_j = jnp.asarray(idx)

            dec_x = jax.jit(lambda st, sa, ix, ep, ev: jax.vmap(
                lambda s2, a2, i2, p2, v2: tr.gauss_decode(
                    s2, a2, i2, p2, v2, gt, lanes, args.n)
            )(st, sa, ix, ep, ev))
            dec_p = jax.jit(lambda st, sa, ix, ep, ev:
                            pr.gauss_decode_batch(
                                st, sa, ix, ep, ev, gt, lanes, args.n))

            t_x, out_x = _time(dec_x, stream_b, states_b, idx_j, ep_b,
                               ev_b, reps=args.reps)
            t_p, out_p = _time(dec_p, stream_b, states_b, idx_j, ep_b,
                               ev_b, reps=args.reps)
            ok_x = bool(np.array_equal(np.asarray(out_x), sym))
            ok_p = bool(np.array_equal(np.asarray(out_p), sym))
            cross = bool(np.array_equal(np.asarray(out_x),
                                        np.asarray(out_p)))
            print(f"B={B} wide={int(wide)}: xla {1e3 * t_x:8.2f} ms "
                  f"({1e3 * t_x / B:7.2f} ms/img, exact={ok_x})   "
                  f"pallas {1e3 * t_p:8.2f} ms "
                  f"({1e3 * t_p / B:7.2f} ms/img, exact={ok_p})   "
                  f"cross-identical={cross}", flush=True)


if __name__ == "__main__":
    main()
