"""Multi-host initialization hooks.

The reference is strictly single-process (SURVEY §2.5 — no
torch.distributed anywhere); multi-host TPU is optional headroom. These
hooks make the same training entry points work on a pod slice: call
``maybe_initialize_distributed()`` before any jax usage and the mesh
helpers in parallel/mesh.py automatically span all global devices, with
gradient psum riding ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import os


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when pod-slice env vars are present.

    Returns True if multi-host mode was activated. Controlled by the
    standard JAX coordination variables (COORDINATOR_ADDRESS / process
    counts) or HYRES_MULTIHOST=1 to force auto-detection.
    """
    import jax

    want = os.environ.get("HYRES_MULTIHOST", "")
    coord = os.environ.get("COORDINATOR_ADDRESS", "")
    if not want and not coord:
        return False
    kwargs = {}
    if coord:
        kwargs["coordinator_address"] = coord
        if "NUM_PROCESSES" in os.environ:
            kwargs["num_processes"] = int(os.environ["NUM_PROCESSES"])
        if "PROCESS_ID" in os.environ:
            kwargs["process_id"] = int(os.environ["PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


def local_batch_slice(global_batch: int) -> int:
    """Per-process batch size for a host-sharded input pipeline."""
    import jax

    assert global_batch % jax.process_count() == 0
    return global_batch // jax.process_count()
