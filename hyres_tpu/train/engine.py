"""Training engine: jit'd RD train step, eval loop, DP over a device mesh.

Capability-parity with the reference's engine
(/root/reference/src/utils/engine.py:8-202) redesigned TPU-first:

- the ENTIRE step — forward (JPEG included), RD loss, backward, NaN
  guard, gradient clip, main update AND aux (quantile) update — is one
  compiled XLA program; the reference runs two backward passes and a
  Python-side AMP/NaN dance per batch (engine.py:50-90).
- gradient accumulation is a lax.scan over microbatches inside the same
  program (reference divides the loss and steps every N batches,
  engine.py:39,56).
- data parallelism: params are replicated and the batch is sharded over
  the 'data' axis of a jax.sharding.Mesh; XLA inserts the psum for the
  gradient all-reduce over ICI (replaces nn.DataParallel,
  /root/reference/src/utils/dataset_utils.py:76-82).
- NaN guard: non-finite main grads skip the whole update (reference
  engine.py:60-74), folded into the program via jnp.where selects.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..losses import AverageMeter, rate_distortion_loss


@flax.struct.dataclass
class TrainState:
    params: Any
    main_state: Any
    aux_state: Any
    step: jax.Array


def create_train_state(params, main_tx, aux_tx) -> TrainState:
    return TrainState(
        params=params,
        main_state=main_tx.init(params),
        aux_state=aux_tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _tree_finite(tree) -> jax.Array:
    leaves = [jnp.all(jnp.isfinite(l)) for l in jax.tree.leaves(tree)]
    return jnp.stack(leaves).all()


def _where_tree(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def make_train_step(model, main_tx, aux_tx, lmbda: float, alpha: float = 0.0,
                    vgg_fn: Callable | None = None, accum_steps: int = 1,
                    remat: bool = False):
    """Build the jit'd train step.

    step(state, batch, rng, noisequant) -> (state, metrics)
    batch: (accum_steps * B, H, W, C) NHWC in [0,1].
    remat=True rematerializes the forward in the backward pass
    (jax.checkpoint): trades ~30% more FLOPs for activation memory, which
    lifts the max batch per chip.
    """

    def forward(params, batch, rng, noisequant):
        return model.apply(params, batch, noisequant=noisequant, rng=rng)

    if remat:
        forward = jax.checkpoint(forward, static_argnums=(3,))

    def loss_fn(params, batch, rng, noisequant):
        out = forward(params, batch, rng, noisequant)
        d = rate_distortion_loss(out, batch, lmbda=lmbda, alpha=alpha, vgg_fn=vgg_fn)
        return d["loss"], d

    def aux_loss_fn(params):
        return model.apply(params, method=model.aux_loss)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @functools.partial(jax.jit, static_argnums=(3,))
    def step(state: TrainState, batch, rng, noisequant: bool):
        if accum_steps > 1:
            micro = batch.reshape(accum_steps, -1, *batch.shape[1:])
            rngs = jax.random.split(rng, accum_steps)

            def body(carry, xs):
                g_acc, m_acc = carry
                mb, r = xs
                (_, m), g = grad_fn(state.params, mb, r, noisequant)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                m_acc = jax.tree.map(jnp.add, m_acc, m)
                return (g_acc, m_acc), None

            zero_g = jax.tree.map(jnp.zeros_like, state.params)
            zero_m = {k: jnp.zeros((), jnp.float32) for k in (
                "loss", "mse_loss", "vgg_loss", "bpp_loss", "residual_bpp_loss",
                "jpeg_bpp_loss", "y_bpp_loss", "z_bpp_loss")}
            (grads, metrics), _ = jax.lax.scan(body, (zero_g, zero_m), (micro, rngs))
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            metrics = jax.tree.map(lambda m: m / accum_steps, metrics)
        else:
            (_, metrics), grads = grad_fn(state.params, batch, rng, noisequant)

        finite = _tree_finite(grads)
        safe_grads = _where_tree(finite, grads, jax.tree.map(jnp.zeros_like, grads))

        upd, new_main = main_tx.update(safe_grads, state.main_state, state.params)
        params1 = optax.apply_updates(state.params, upd)

        aux_val, aux_grads = jax.value_and_grad(aux_loss_fn)(params1)
        aux_upd, new_aux = aux_tx.update(aux_grads, state.aux_state, params1)
        params2 = optax.apply_updates(params1, aux_upd)

        new_state = TrainState(
            params=_where_tree(finite, params2, state.params),
            main_state=_where_tree(finite, new_main, state.main_state),
            aux_state=_where_tree(finite, new_aux, state.aux_state),
            step=state.step + 1,
        )
        metrics = dict(metrics)
        metrics["aux_loss"] = aux_val
        metrics["skipped_nonfinite"] = (~finite).astype(jnp.float32)
        return new_state, metrics

    return step


def make_eval_step(model, lmbda: float, alpha: float = 0.0,
                   vgg_fn: Callable | None = None):
    @jax.jit
    def eval_step(params, batch):
        out = model.apply(params, batch, noisequant=False)
        d = rate_distortion_loss(out, batch, lmbda=lmbda, alpha=alpha, vgg_fn=vgg_fn)
        mse = jnp.mean((out["x_hat"] - batch) ** 2, axis=(1, 2, 3))
        d["psnr"] = jnp.mean(-10.0 * jnp.log10(mse))
        return d, out

    return eval_step


def run_eval(eval_step, params, batches) -> Dict[str, float]:
    """test_epoch equivalent (reference engine.py:118-202): averaged
    metrics over the validation set."""
    meters: Dict[str, AverageMeter] = {}
    for batch in batches:
        d, _ = eval_step(params, batch)
        n = batch.shape[0]
        for k, v in d.items():
            meters.setdefault(k, AverageMeter()).update(float(v), n)
    return {k: m.avg for k, m in meters.items()}
