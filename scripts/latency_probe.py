"""Stage-level latency attribution for the single-image HyRES roundtrip.

profile_breakdown.py gives per-call rows (enc_wall / enc_sync / dec_wall);
this probe splits those further to find the r4 gap (bench 0.3355 s vs the
r2 capture 0.2201 s): which device program, transfer, or host step owns
the time. Pauses the unattended chain (same mechanism as bench.py) so the
numbers are idle-chip.

Timing method: the encode chain is dispatched stage by stage; timing
successive block_until_ready calls yields per-stage device cost (programs
execute in enqueue order on the single TPU stream). Tunnel costs are
measured directly with trivial programs.

Usage: python scripts/latency_probe.py [--reps 3]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from PIL import Image

    from bench import _load_params, _pause_measurement_chain
    from hyres_tpu.models import codec as codec_mod
    from hyres_tpu.models.hyres import HyresCodec, ResidualJPEGCompression

    print(f"backend: {jax.devices()[0].platform}", flush=True)

    model = ResidualJPEGCompression(N=128, M=192, jpeg_quality=1,
                                    compute_dtype=jnp.bfloat16)
    params = _load_params(model)
    codec = HyresCodec(model, params, coder="tpu")
    codec.update(force=True)

    kodak = sorted(Path("/root/reference/data/test").glob("kodim*.png"))
    wide = next(p for p in kodak if Image.open(p).size == (768, 512))
    x = jnp.asarray(np.asarray(Image.open(wide).convert("RGB"),
                               np.float32)[None] / 255.0)

    # warm every stage (and the speculative pull's high-water marks)
    for _ in range(3):
        jax.block_until_ready(codec.inference(x)["x_hat"])

    _pause_measurement_chain()

    # ---- raw tunnel characteristics ----
    # h2d: fresh host buffers each rep (device_put of a seen buffer can
    # be elided); d2h: a DEVICE-COMPUTED array via the codec's own warm
    # pack program, so device_get can't return a cached host copy.
    dev = jax.devices()[0]
    ts = []
    for i in range(5):
        h_big = np.full(300 * 1024, i, np.uint8)
        t0 = time.time()
        jax.block_until_ready(jax.device_put(h_big, dev))
        ts.append(time.time() - t0)
    print(f"tunnel h2d 300KB: min {min(ts)*1e3:.1f} ms  "
          f"med {sorted(ts)[2]*1e3:.1f} ms", flush=True)

    r = codec._residual
    tc = r.tpu_coder

    for rep in range(args.reps):
        rows = []
        t0 = time.time()

        (cy, ccb, ccr), coef_flat, y, z_sym = codec._enc_front(x)
        jax.block_until_ready(y)
        rows.append(("enc_front (JPEG+analysis)", time.time() - t0))

        t = time.time()
        lp, a_idx, ma_p, a_sym = r._dec_stage1(z_sym, y)
        _, n_idx, mn_p, n_sym = r._dec_stage2(lp, a_sym, ma_p, y)
        jax.block_until_ready(n_sym)
        rows.append(("ctx stages 1+2", time.time() - t))

        t = time.time()
        enc_z, enc_a, enc_n = tc.encode_all(z_sym, a_sym, a_idx,
                                            n_sym, n_idx)
        jax.block_until_ready(enc_z)
        rows.append(("rANS encode scans (z+a+n)", time.time() - t))

        t = time.time()
        finish_pull = codec_mod.pull_encs_dispatch(
            (enc_z, enc_a, enc_n), coef_flat,
            cap_state=r.__dict__.setdefault("_enc_cap_state", {}))
        (enc_z2, enc_a2, enc_n2), extra_np = finish_pull()
        rows.append(("pack + pull (device_get)", time.time() - t))

        t = time.time()
        z_strings = tc.frames_from_enc(enc_z2)
        a_strings = tc.frames_from_enc(enc_a2)
        n_strings = tc.frames_from_enc(enc_n2)
        rows.append(("host framing", time.time() - t))

        t = time.time()
        from hyres_tpu.jpeg.bitstream import assemble_jfif
        shapes = tuple(tuple(c.shape) for c in (cy, ccb, ccr))
        splits = np.cumsum([int(np.prod(s[1:])) for s in shapes[:2]])
        ynp, cbnp, crnp = (
            part.reshape((-1,) + shp[1:]).astype(np.int16)
            for part, shp in zip(np.split(extra_np, splits, axis=1),
                                 shapes))
        buf = assemble_jfif(ynp[0], cbnp[0], crnp[0],
                            x.shape[2], x.shape[1], model.jpeg_quality)
        rows.append(("JFIF assembly", time.time() - t))
        enc_total = time.time() - t0

        comp = {
            "strings": [[a_strings, n_strings], z_strings],
            "shape": (int(z_sym.shape[1]), int(z_sym.shape[2])),
            "size": (int(x.shape[1]), int(x.shape[2])),
            "jpeg_buffers": [buf],
        }

        # ---- decode side ----
        t0d = time.time()
        out = codec.decompress(comp)
        jax.block_until_ready(out["x_hat"])
        dec_total = time.time() - t0d
        rows.append(("decompress total", dec_total))

        print(f"--- rep {rep}: enc {enc_total*1e3:.1f} ms  "
              f"dec {dec_total*1e3:.1f} ms", flush=True)
        for name, dt in rows:
            print(f"  {name:<28} {dt*1e3:8.1f} ms", flush=True)

    # decode sub-split: dispatch wall (host unframe+upload+enqueue) vs
    # device drain
    for rep in range(args.reps):
        comp2 = codec.compress(x)
        t0 = time.time()
        x_hat, start = codec._dec_dispatch_from_comp(comp2)
        t1 = time.time()
        jax.block_until_ready(x_hat)
        t2 = time.time()
        print(f"dec rep {rep}: dispatch (unframe+upload+enqueue) "
              f"{(t1-t0)*1e3:.1f} ms  device drain {(t2-t1)*1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
