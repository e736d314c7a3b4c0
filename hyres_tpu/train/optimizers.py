"""Two-optimizer split (CompressAI convention).

Re-implements the capability of the reference's ``configure_optimizers``
(/root/reference/src/utils/optimizers.py:4-35): parameters named
``quantiles`` go to an auxiliary Adam (default lr 1e-3) that minimizes
the entropy bottleneck's quantile-fitting loss; everything else goes to
the main Adam (default lr 1e-4). The partition is asserted disjoint and
complete, like the reference.

In optax this is two multi_transform partitions over the same tree (each
optimizer is a hard no-op outside its own partition), so a single train
step applies both updates in one compiled program (the reference runs a
second backward pass + optimizer step per batch,
src/utils/engine.py:87-90).
"""

from __future__ import annotations

from typing import Tuple

import jax
import optax


def quantile_mask(params) -> dict:
    """True for every leaf under a 'quantiles' key."""

    def walk(tree, in_q=False):
        if isinstance(tree, dict):
            return {k: walk(v, in_q or k == "quantiles") for k, v in tree.items()}
        return in_q

    return walk(params)


def configure_optimizers(params, learning_rate: float = 1e-4,
                         aux_learning_rate: float = 1e-3,
                         clip_max_norm: float = 1.0,
                         ) -> Tuple[optax.GradientTransformation,
                                    optax.GradientTransformation]:
    """Returns (main_tx, aux_tx) masked over the parameter tree.

    The main chain clips by global norm (reference engine.py:57-76) and
    exposes its learning rate through inject_hyperparams so the host-side
    schedulers (MultiStep / ReduceLROnPlateau, reference training.py:215,
    236) can adjust it without rebuilding optimizer state.
    """
    mask = quantile_mask(params)
    inv_mask = jax.tree.map(lambda b: not b, mask)
    # completeness + disjointness (mirrors the reference's assertions)
    leaves_m = jax.tree.leaves(mask)
    leaves_i = jax.tree.leaves(inv_mask)
    assert len(leaves_m) == len(leaves_i)
    assert all(a != b for a, b in zip(leaves_m, leaves_i))

    main_inner = optax.chain(
        optax.clip_by_global_norm(clip_max_norm) if clip_max_norm else optax.identity(),
        optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate),
    )
    # NOTE: optax.masked alone is WRONG for this split — it passes the
    # gradients of non-masked leaves through UNCHANGED as updates, i.e.
    # apply_updates would do gradient *ascent* on the other partition
    # (caught by tests/test_train.py::test_optimizer_partition_is_hard).
    # multi_transform + set_to_zero makes each optimizer a no-op outside
    # its own partition, matching the reference's disjoint param groups
    # (src/utils/optimizers.py:13-25).
    labels = jax.tree.map(lambda b: "aux" if b else "main", mask)
    main_tx = optax.multi_transform(
        {"main": main_inner, "aux": optax.set_to_zero()}, labels)
    aux_tx = optax.multi_transform(
        {"aux": optax.inject_hyperparams(optax.adam)(
            learning_rate=aux_learning_rate),
         "main": optax.set_to_zero()}, labels)
    return main_tx, aux_tx


def _main_hyperparams(main_opt_state) -> dict:
    # MultiTransformState.inner_states["main"] is a MaskedState wrapping
    # the (clip, inject_hyperparams(adam)) chain state
    return main_opt_state.inner_states["main"].inner_state[1].hyperparams


def get_main_lr(main_opt_state) -> float:
    return float(_main_hyperparams(main_opt_state)["learning_rate"])


def set_main_lr(main_opt_state, lr: float):
    """Functionally replace the main optimizer's learning rate."""
    import jax.numpy as jnp

    _main_hyperparams(main_opt_state)["learning_rate"] = jnp.asarray(
        lr, jnp.float32)
    return main_opt_state
