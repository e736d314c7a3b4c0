"""Refine-training CLI — frozen-codec refinement phase.

Mirrors the reference's PostProcessTrainer
(/root/reference/src/refine_training.py:18-292): build the full HyRES
model, load the codec checkpoint, FREEZE everything except the
``refine.*`` (MultiScaleRefine) subtree, train with plain MSE*255^2
(reference refine_engine.py:32-34), ReduceLROnPlateau, and save
refine-only checkpoints.

TPU-first: freezing = optax.masked over the refine subtree, so the whole
step (forward through the frozen codec + refine backward) is still one
compiled program.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="HyRES-TPU refinement training")
    p.add_argument("-d", "--dataset", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True,
                   help="codec checkpoint (full model weights)")
    p.add_argument("--resume", type=str, default=None,
                   help="refine-only checkpoint to resume from")
    p.add_argument("--N", type=int, default=128)
    p.add_argument("--M", type=int, default=192)
    p.add_argument("--jpeg-quality", type=int, default=1)
    p.add_argument("-e", "--epochs", type=int, default=100)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--patch-size", type=int, nargs=2, default=(256, 256))
    p.add_argument("--seed", type=int, default=1926)
    p.add_argument("--savepath", type=str, default="./refine_checkpoints")
    p.add_argument("--steps-per-epoch", type=int, default=None)
    return p.parse_args(argv)


def refine_mask(params) -> dict:
    """True only for leaves under the top-level 'refine' module."""

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return "refine" in path

    return walk(params)


def main(argv=None):
    args = parse_args(argv)
    from ..models.hyres import ResidualJPEGCompression
    from ..parallel import data_parallel_mesh, replicate, shard_batch
    from ..train import (DataLoader, ImageFolder, delete_by_prefix,
                         load_checkpoint, restore_into, save_checkpoint)
    from ..train.checkpoint import extract_variables

    save_dir = Path(args.savepath)
    save_dir.mkdir(parents=True, exist_ok=True)

    model = ResidualJPEGCompression(N=args.N, M=args.M,
                                    jpeg_quality=args.jpeg_quality)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, *args.patch_size, 3)),
                        noisequant=False)
    params = restore_into(
        params, extract_variables(load_checkpoint(args.checkpoint)))
    if args.resume:
        refine_tree = extract_variables(load_checkpoint(args.resume))["params"]
        merged = dict(params["params"])
        merged["refine"] = refine_tree.get("refine", refine_tree)
        params = {"params": merged}

    mask = refine_mask(params)
    n_train = sum(l.size for l, m in zip(jax.tree.leaves(params),
                                         jax.tree.leaves(mask)) if m)
    print(f"training {n_train/1e6:.3f}M refine params (codec frozen)")

    # multi_transform, NOT optax.masked: masked passes frozen leaves'
    # gradients through as raw updates (i.e. the "frozen" codec would be
    # updated by gradient ascent — see train/optimizers.py note)
    labels = jax.tree.map(lambda b: "train" if b else "freeze", mask)
    tx = optax.multi_transform(
        {"train": optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.adam(learning_rate)))(
            learning_rate=args.learning_rate),
         "freeze": optax.set_to_zero()}, labels)
    opt_state = tx.init(params)

    def loss_fn(p, batch):
        out = model.apply(p, batch, noisequant=False)
        return jnp.mean((out["x_hat"] - batch) ** 2) * 255.0 ** 2

    @jax.jit
    def step(p, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch)
        upd, new_opt_state = tx.update(grads, opt_state, p)
        new_p = optax.apply_updates(p, upd)
        # NaN guard (same policy as the main engine, train/engine.py),
        # applied to the UPDATED params: extreme gradients can overflow
        # even the clip's norm computation, so checking grads alone is
        # not sufficient — skip the whole update if anything went
        # non-finite anywhere in the chain.
        finite = jnp.stack([jnp.all(jnp.isfinite(l))
                            for l in jax.tree.leaves(new_p)]).all()
        sel = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(finite, x, y), a, b)
        return sel(new_p, p), sel(new_opt_state, opt_state), loss

    @jax.jit
    def eval_step(p, batch):
        out = model.apply(p, batch, noisequant=False)
        mse = jnp.mean((out["x_hat"] - batch) ** 2)
        return mse * 255.0 ** 2, -10.0 * jnp.log10(mse)

    train_set = ImageFolder(args.dataset, "train", tuple(args.patch_size), train=True)
    test_set = ImageFolder(args.dataset, "test", None, train=False)
    loader = DataLoader(train_set, args.batch_size, seed=args.seed)
    test_imgs = [test_set.load(i, np.random.default_rng(0))[None]
                 for i in range(len(test_set))]

    mesh = data_parallel_mesh(batch_size=args.batch_size)
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)

    best = float("inf")
    plateau_best, plateau_bad = float("inf"), 0
    lr = args.learning_rate
    for epoch in range(args.epochs):
        t0 = time.time()
        run = n = 0
        for bi, batch in enumerate(loader):
            if args.steps_per_epoch and bi >= args.steps_per_epoch:
                break
            params, opt_state, loss = step(
                params, opt_state, shard_batch(mesh, jnp.asarray(batch)))
            run += float(loss); n += 1
        val = float(np.mean([float(eval_step(params, jnp.asarray(b))[0])
                             for b in test_imgs]))
        psnr = float(np.mean([float(eval_step(params, jnp.asarray(b))[1])
                              for b in test_imgs]))
        print(f"epoch {epoch}: train_mse={run/max(n,1):.3f} val_mse={val:.3f} "
              f"val_psnr={psnr:.2f} lr={lr:.2e} ({time.time()-t0:.1f}s)", flush=True)

        if val < plateau_best - 1e-6:
            plateau_best, plateau_bad = val, 0
        else:
            plateau_bad += 1
            if plateau_bad > 5:
                # floored like the main CLI's --min-lr: unfloored decay
                # reaches numerical zero within a few hundred short epochs
                lr = max(lr * 0.3, 1e-6)
                opt_state.inner_states["train"].inner_state.hyperparams[
                    "learning_rate"] = jnp.asarray(lr)
                plateau_bad = 0

        ckpt = {"epoch": epoch,
                "params": {"refine": params["params"]["refine"]},
                "loss": val}
        delete_by_prefix(save_dir, "refine_last_")
        save_checkpoint(ckpt, save_dir / f"refine_last_{epoch}.msgpack")
        if val < best:
            best = val
            delete_by_prefix(save_dir, "refine_best_")
            save_checkpoint(ckpt, save_dir / f"refine_best_{epoch}.msgpack")
    print("refine training done")


if __name__ == "__main__":
    main()
