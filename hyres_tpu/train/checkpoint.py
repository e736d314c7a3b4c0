"""Checkpointing: msgpack pytree snapshots + rolling retention.

Capability-parity with the reference's checkpoint subsystem (SURVEY §5.4):
- training checkpoint = {epoch, params, main_state, aux_state, lr, loss}
  (reference src/training.py:271-280 stores epoch + both optimizers +
  scheduler),
- loader unwraps several formats (reference checkpoint_utils.py:14-24),
- rolling retention: exactly one ``checkpoint_last_*`` and one
  ``checkpoint_best_*`` via prefix-delete (reference DelfileList,
  checkpoint_utils.py:7-11),
- refine checkpoints store only the ``refine`` subtree
  (reference refine_training.py:136-149).

Serialization is flax msgpack (pure pytrees of arrays — no pickle), with
the tree structure restored against a live template.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict

import flax.serialization
import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(state_dict: Dict[str, Any], path: str):
    # to_state_dict flattens custom pytree nodes (optax states, TrainState)
    # into plain dicts that msgpack can serialize
    state_dict = flax.serialization.to_state_dict(state_dict)
    data = flax.serialization.msgpack_serialize(_to_numpy(state_dict))
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Returns the raw dict-of-dicts (arrays as numpy). Structure-free
    restore; use flax.serialization.from_state_dict against a template to
    rebuild custom nodes (e.g. optimizer states)."""
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def restore_into(template, state_dict):
    """Rebuild a typed pytree (e.g. TrainState) from a raw restore."""
    return flax.serialization.from_state_dict(template, state_dict)


def delete_by_prefix(directory: str, prefix: str):
    """Rolling retention (reference DelfileList behavior)."""
    d = Path(directory)
    if not d.is_dir():
        return
    for p in d.iterdir():
        if p.name.startswith(prefix):
            p.unlink()


def unwrap_params(raw: Dict[str, Any]) -> Dict[str, Any]:
    """Unwrap {network|state_dict|params|raw} checkpoint formats
    (reference checkpoint_utils.py:14-24)."""
    for key in ("network", "state_dict", "params"):
        if isinstance(raw, dict) and key in raw:
            return raw[key]
    return raw


def extract_variables(raw: Dict[str, Any]) -> Dict[str, Any]:
    """Any checkpoint flavor -> flax variables dict {"params": tree}."""
    v = unwrap_params(raw)
    if isinstance(v, dict) and set(v.keys()) == {"params"}:
        return v
    return {"params": v}
