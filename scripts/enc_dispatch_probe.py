"""Which lowering does production encode_all actually take, and what does
each cost? Times the HyRES encode scans under GAUSS_IMPL in
{auto, pallas, xla} in separate subprocesses (GAUSS_IMPL and the probe
latches are process-global), printing the dispatch decision and the warm
per-call wall. Diagnoses the latency_probe.py finding that the scans cost
174 ms when the A/B says the kernels do a full plane in 41 ms."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import os, sys, time
from pathlib import Path
import jax
jax.config.update("jax_compilation_cache_dir", sys.argv[2] + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, sys.argv[2])

impl = sys.argv[1]
os.environ["HYRES_GAUSS_IMPL"] = impl
from hyres_tpu.coding import tpu_rans, pallas_rans
tpu_rans.GAUSS_IMPL = impl

from PIL import Image
from bench import _load_params, _pause_measurement_chain
from hyres_tpu.models.hyres import HyresCodec, ResidualJPEGCompression

model = ResidualJPEGCompression(N=128, M=192, jpeg_quality=1,
                                compute_dtype=jnp.bfloat16)
params = _load_params(model)
codec = HyresCodec(model, params, coder="tpu")
codec.update(force=True)
kodak = sorted(Path("/root/reference/data/test").glob("kodim*.png"))
wide = next(p for p in kodak if Image.open(p).size == (768, 512))
x = jnp.asarray(np.asarray(Image.open(wide).convert("RGB"),
                           np.float32)[None] / 255.0)

r = codec._residual
tc = r.tpu_coder
(cy, ccb, ccr), coef_flat, y, z_sym = codec._enc_front(x)
lp, a_idx, ma_p, a_sym = r._dec_stage1(z_sym, y)
_, n_idx, mn_p, n_sym = r._dec_stage2(lp, a_sym, ma_p, y)
jax.block_until_ready(n_sym)
print(f"impl={impl}: plane shapes z={z_sym.shape} a={a_sym.shape} "
      f"n={n_sym.shape}", flush=True)

# what does the dispatch decide for the production lane tiers?
for probe_name, lanes in (("probe_enc", 128), ("probe_enc", 32),
                          ("probe", 128)):
    mod = tpu_rans._kernel_module(probe_name, lanes)
    print(f"  _kernel_module({probe_name}, lanes={lanes}) -> "
          f"{'PALLAS' if mod is not None else 'XLA'}", flush=True)

_pause_measurement_chain()
# warm + time the exact production encode program
enc = tc.encode_all(z_sym, a_sym, a_idx, n_sym, n_idx)
jax.block_until_ready(enc[0])
ts = []
for _ in range(5):
    t0 = time.time()
    enc = tc.encode_all(z_sym, a_sym, a_idx, n_sym, n_idx)
    jax.block_until_ready(enc)
    ts.append(time.time() - t0)
print(f"impl={impl}: encode_all warm min {min(ts)*1e3:.1f} ms "
      f"med {sorted(ts)[2]*1e3:.1f} ms", flush=True)

# and the three scans individually (separate jits, same lowerings)
for name, fn in (("enc_eb(z)", lambda: tc.encode_eb(z_sym)),
                 ("enc_gauss(anchor)", lambda: tc.encode_gauss(a_sym, a_idx)),
                 ("enc_gauss(nonanchor)", lambda: tc.encode_gauss(n_sym, n_idx))):
    out = fn(); jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.time(); out = fn(); jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"  {name:<22} min {min(ts)*1e3:7.1f} ms", flush=True)
"""


def main() -> None:
    impls = sys.argv[1:] or ["auto", "pallas", "xla"]
    for impl in impls:
        print(f"===== GAUSS_IMPL={impl}", flush=True)
        r = subprocess.run([sys.executable, "-c", CHILD, impl, str(REPO)],
                           timeout=1800)
        if r.returncode != 0:
            print(f"  child rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()
