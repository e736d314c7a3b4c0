"""HyRES-TPU: a TPU-native hybrid image compression framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
HyRES-Residual-Enhanced-Hybrid-Image-Compression (reference:
/root/reference, PyTorch/CUDA):

- classical JPEG base layer computed on-TPU (blockwise DCT as MXU matmuls,
  exact Huffman bit accounting on device, JFIF bitstream assembly in C++),
- a learned hyperprior residual codec with a two-pass checkerboard spatial
  context model (masked half-lattice updates, fully jit-compiled),
- a frozen-codec multi-scale refinement CNN,
- stand-alone Cheng2020-checkerboard and LightWeight-ELIC baselines,
- rate-distortion training (data-parallel over a `jax.sharding.Mesh`,
  bf16 compute, grad accumulation, two-optimizer CompressAI convention),
- a C++ rANS range coder with CompressAI-compatible stream semantics.

Layout (NHWC everywhere; images are float32 in [0, 1]):
  entropy/   EntropyBottleneck, GaussianConditional, scale tables
  coding/    host C++ rANS + CDF quantizer + JFIF bitstream (ctypes)
  nn/        GDN/IGDN, conv/deconv kit, attention, checkerboard conv, refine
  jpeg/      on-device JPEG transform path + rate accounting
  models/    LightWeightCheckerboard, HyRES composite, ELIC, Cheng2020
  losses/    rate-distortion + VGG perceptual + metrics
  train/     engine, optimizers, checkpointing, data pipeline
  parallel/  mesh / sharding helpers
  cli/       training, inference, refine_training, refine_inference, updata
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("HYRES_PLATFORM"):
    # Serving hosts without a TPU (and CI) need a way to force the JAX
    # backend. The plain JAX_PLATFORMS env var is not enough on images
    # whose TPU plugin registers itself with an explicit
    # jax.config.update("jax_platforms", ...) at interpreter start
    # (config beats env, so e.g. a downed TPU tunnel hangs every CLI);
    # this override is applied after those and therefore wins. It must
    # run before the first backend initialization, i.e. before any
    # hyres_tpu submodule touches jax.devices().
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["HYRES_PLATFORM"])
