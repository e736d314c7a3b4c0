"""Test config: run on CPU with 8 virtual devices (SURVEY §4d).

Multi-device sharding paths are tested on a faked 8-device CPU mesh —
the standard way to exercise pjit/shard_map without TPU hardware. Model
math is platform-agnostic JAX, so CPU correctness transfers to TPU.
"""

import os

# NOTE: the JAX_PLATFORMS env var is overridden in this image (the axon TPU
# plugin wins); jax.config.update is authoritative. XLA_FLAGS must still be
# set before the CPU backend initializes.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# The shipped COMPACT default is "merge" (dense merge-tree — sub-ms on
# the TPU VPU, but ~100M element-ops per encode on this 1-core CPU test
# host, ~2.5x suite wall time). Tests pin the fast CPU lowering; the
# dedicated merge tests monkeypatch COMPACT_MODE and assert the two
# lowerings produce identical bytes, which is what makes this pin sound.
os.environ.setdefault("HYRES_COMPACT", "nonzero")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# XLA:CPU compiles the codec backward graph very slowly (~2.5 min); cache
# compiled programs across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def kodim01():
    from PIL import Image

    img = Image.open("/root/reference/data/test/kodim01.png").convert("RGB")
    return np.asarray(img, np.float32) / 255.0


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(1234)
