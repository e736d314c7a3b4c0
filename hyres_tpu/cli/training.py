"""Training CLI — full RD training of the HyRES composite codec.

Flag surface mirrors the reference (/root/reference/src/training.py:28-142):
dataset/N/M/jpeg-quality/epochs/learning-rate/aux-learning-rate/lambda/
alpha/batch-size/test-batch-size/patch-size/seed/clip_max_norm/pretrained/
gradient-accumulation-steps/savepath/checkpoint. Device flags (--cuda,
--gpu-id, --mps) are accepted for drop-in compatibility and ignored: JAX
picks up the TPU (or CPU) automatically and data parallelism spans all
visible devices through a jax.sharding.Mesh.

Behavioral parity:
- noise quantization until epoch 400, then STE (reference training.py:238-243)
- MultiStep LR decay at epoch 400 (x0.1) in fresh runs; ReduceLROnPlateau
  in --pretrained (phase-chaining) runs (training.py:215,236)
- rolling checkpoint_last/checkpoint_best retention (training.py:269-307)
- per-100-step stdout logging + CSV of best metrics (engine.py:92-104,193)
"""

from __future__ import annotations

import argparse
import csv
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="HyRES-TPU training")
    p.add_argument("-d", "--dataset", type=str, required=True,
                   help="root with train/ and test/ image folders")
    p.add_argument("--model", type=str, default="hyres",
                   choices=["hyres", "checkerboard", "elic", "cheng2020"],
                   help="model family (hyres = JPEG base + residual codec)")
    p.add_argument("--N", type=int, default=128)
    p.add_argument("--M", type=int, default=192)
    p.add_argument("--jpeg-quality", type=int, default=1)
    p.add_argument("-e", "--epochs", type=int, default=4000)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("--aux-learning-rate", type=float, default=1e-3)
    p.add_argument("--lambda", dest="lmbda", type=float, default=0.015)
    p.add_argument("--alpha", type=float, default=0.0,
                   help="VGG perceptual weight; the production recipe uses 0 "
                        "(reference train.sh:9). alpha>0 requires pretrained "
                        "VGG16 weights (HYRES_VGG16_WEIGHTS) unless "
                        "--allow-random-vgg is passed.")
    p.add_argument("--allow-random-vgg", action="store_true",
                   help="permit alpha>0 with random (untrained) VGG features")
    p.add_argument("-n", "--num-workers", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--test-batch-size", type=int, default=8)
    p.add_argument("--patch-size", type=int, nargs=2, default=(256, 256))
    p.add_argument("--seed", type=int, default=1926)
    p.add_argument("--clip_max_norm", type=float, default=1.0)
    p.add_argument("--pretrained", action="store_true",
                   help="phase-continuation: reset epoch/lr, plateau scheduler")
    p.add_argument("--gradient-accumulation-steps", type=int, default=1)
    p.add_argument("--mixed-precision", action="store_true",
                   help="bf16 activations through g_a/g_s/h_a/h_s (+refine) "
                        "with f32 master params and f32 entropy tails "
                        "(TPU-native equivalent of the reference AMP path, "
                        "src/utils/engine.py:22-82)")
    p.add_argument("--cuda", action="store_true", help="ignored (auto device)")
    p.add_argument("--mps", action="store_true", help="ignored (auto device)")
    p.add_argument("--gpu-id", type=str, default="0", help="ignored (auto device)")
    p.add_argument("--savepath", type=str, default="./checkpoints")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--logdir", type=str, default=None,
                   help="TensorBoard log directory (reference training.py:210)")
    p.add_argument("--noise-epochs", type=int, default=400,
                   help="epochs of noise quantization before STE switch")
    p.add_argument("--steps-per-epoch", type=int, default=None,
                   help="cap steps per epoch (useful for small runs)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the forward in backward (activation "
                        "memory for ~30%% extra FLOPs; lifts max batch)")
    p.add_argument("--min-lr", type=float, default=1e-6,
                   help="floor for the plateau scheduler in --pretrained "
                        "runs (with few steps per epoch the reference's "
                        "unfloored ReduceLROnPlateau can decay the LR to "
                        "numerical zero and dead-lock the phase)")
    p.add_argument("--save-every", type=int, default=1,
                   help="checkpoint every N epochs (device->host transfer "
                        "of the full state is expensive over the TPU tunnel)")
    p.add_argument("--eval-every", type=int, default=1,
                   help="run the held-out eval every N epochs. With a "
                        "small dataset an 'epoch' is a handful of steps "
                        "and the reference's eval-every-epoch cadence "
                        "(training.py:229) spends most wall time "
                        "evaluating; N>1 shifts it back to training. "
                        "Checkpoints/plateau-LR only happen on eval epochs "
                        "(they need the eval loss), so make --save-every "
                        "a multiple of this")
    p.add_argument("--augment", action="store_true",
                   help="dihedral (flip/rotate) crop augmentation; not in "
                        "the reference recipe, useful on small datasets")
    p.add_argument("--augment-scale", type=float, nargs=2, default=None,
                   metavar=("LO", "HI"),
                   help="random-rescale augmentation: resample each source "
                        "image by a log-uniform factor in [LO, HI] before "
                        "cropping (e.g. 0.6 1.0), so crops sample several "
                        "texture scales; not in the reference recipe")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from ..losses import VGGLoss
    from ..models.hyres import ResidualJPEGCompression
    from ..parallel import data_parallel_mesh, replicate, shard_batch
    from ..train import (
        DataLoader, ImageFolder, configure_optimizers, create_train_state,
        delete_by_prefix, load_checkpoint, make_eval_step, make_train_step,
        restore_into, run_eval, save_checkpoint, set_main_lr, get_main_lr,
    )

    from ..utils.logging import ScalarLogger

    logger = ScalarLogger(args.logdir)
    save_dir = Path(args.savepath)
    save_dir.mkdir(parents=True, exist_ok=True)

    train_set = ImageFolder(args.dataset, "train", tuple(args.patch_size),
                            train=True, augment=args.augment,
                            scale_range=(tuple(args.augment_scale)
                                         if args.augment_scale else None))
    test_set = ImageFolder(args.dataset, "test", None, train=False)
    train_loader = DataLoader(train_set, args.batch_size, seed=args.seed,
                              num_workers=args.num_workers)

    cd = jnp.bfloat16 if args.mixed_precision else None
    if args.model == "hyres":
        model = ResidualJPEGCompression(N=args.N, M=args.M,
                                        jpeg_quality=args.jpeg_quality,
                                        compute_dtype=cd)
    elif args.model == "checkerboard":
        from ..models import LightWeightCheckerboard
        model = LightWeightCheckerboard(N=args.N, M=args.M, compute_dtype=cd)
    elif args.model == "elic":
        from ..models import LightWeightELIC
        model = LightWeightELIC(N=args.N if args.N != 128 else 192,
                                M=args.M if args.M != 192 else 320,
                                compute_dtype=cd)
    else:
        from ..models import Cheng2020withCheckerboard
        model = Cheng2020withCheckerboard(N=args.N if args.N != 128 else 192,
                                          compute_dtype=cd)
    rng = jax.random.key(args.seed)
    init_shape = (1, args.patch_size[0], args.patch_size[1], 3)
    params = model.init(jax.random.key(0), jnp.zeros(init_shape),
                        noisequant=True, rng=jax.random.key(1))
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"model: N={model.N} M={getattr(model, 'M', model.N)} "
          f"q={args.jpeg_quality} "
          f"({n_params/1e6:.2f}M params) devices={jax.device_count()}")

    main_tx, aux_tx = configure_optimizers(
        params, args.learning_rate, args.aux_learning_rate, args.clip_max_norm)
    state = create_train_state(params, main_tx, aux_tx)

    start_epoch = 0
    best_loss = float("inf")
    if args.checkpoint:
        raw = load_checkpoint(args.checkpoint)
        if args.pretrained:
            # phase chaining: weights only, fresh epoch/optimizers (stemode)
            state = state.replace(params=restore_into(state.params, raw["params"]))
            print(f"loaded pretrained weights from {args.checkpoint} (stemode)")
        else:
            state = restore_into(state, {k: raw[k] for k in
                                         ("params", "main_state", "aux_state", "step")})
            start_epoch = int(raw.get("epoch", 0)) + 1
            best_loss = float(raw.get("best_loss", best_loss))
            print(f"resumed from {args.checkpoint} at epoch {start_epoch}")

    vgg_fn = VGGLoss() if args.alpha else None
    if vgg_fn is not None and not vgg_fn.pretrained:
        if not args.allow_random_vgg:
            raise SystemExit(
                "alpha>0 but no pretrained VGG16 weights are available "
                "(HYRES_VGG16_WEIGHTS unset or missing). Training a "
                "'perceptual' loss against random features is almost "
                "certainly not what you want — set HYRES_VGG16_WEIGHTS to "
                "a torch-layout .npz, use --alpha 0 (the production "
                "recipe, reference train.sh:9), or pass --allow-random-vgg "
                "to override.")
        print("WARNING: no VGG16 weights (HYRES_VGG16_WEIGHTS unset); "
              "perceptual term uses random features (--allow-random-vgg)")
    step_fn = make_train_step(model, main_tx, aux_tx, lmbda=args.lmbda,
                              alpha=args.alpha, vgg_fn=vgg_fn,
                              accum_steps=args.gradient_accumulation_steps,
                              remat=args.remat)
    eval_fn = make_eval_step(model, lmbda=args.lmbda, alpha=args.alpha, vgg_fn=vgg_fn)

    mesh = data_parallel_mesh(batch_size=args.batch_size)
    state = replicate(mesh, state)

    # eval batches: full test images padded to common shape is wasteful;
    # evaluate per-image (test_batch 1..N same-size groups). Kodak is uniform.
    test_batches = []
    buf = []
    for i in range(len(test_set)):
        buf.append(test_set.load(i, np.random.default_rng(0)))
        if len(buf) == args.test_batch_size:
            if len({b.shape for b in buf}) == 1:
                test_batches.append(np.stack(buf))
            else:
                test_batches.extend(b[None] for b in buf)
            buf = []
    if buf:
        test_batches.extend(b[None] for b in buf)

    plateau_best = float("inf")
    plateau_bad = 0
    best_saved_loss = best_loss
    micro = args.batch_size * args.gradient_accumulation_steps

    for epoch in range(start_epoch, args.epochs):
        noisequant = (epoch < args.noise_epochs) and not args.pretrained
        # MultiStep LR decay at the STE switch in fresh runs (training.py:215)
        if not args.pretrained and epoch == args.noise_epochs:
            state = state.replace(main_state=set_main_lr(
                state.main_state, args.learning_rate * 0.1))

        t0 = time.time()
        n_steps = 0
        # accumulate metrics ON DEVICE; a float() every step would force a
        # host sync per step (expensive over the TPU tunnel)
        run_loss = run_bpp = run_mse = jnp.float32(0.0)
        for bi, batch in enumerate(train_loader):
            if args.steps_per_epoch and bi >= args.steps_per_epoch:
                break
            if batch.shape[0] != micro:
                continue
            rng, sub = jax.random.split(rng)
            state, m = step_fn(state, shard_batch(mesh, jnp.asarray(batch)),
                               sub, noisequant)
            n_steps += 1
            run_loss = run_loss + m["loss"]
            run_bpp = run_bpp + m["bpp_loss"]
            run_mse = run_mse + m["mse_loss"]
            if bi % 100 == 0:
                print(f"epoch {epoch} [{bi}/{len(train_loader)}] "
                      f"loss={float(m['loss']):.4f} mse={float(m['mse_loss']):.4f} "
                      f"bpp={float(m['bpp_loss']):.4f} aux={float(m['aux_loss']):.1f} "
                      f"lr={get_main_lr(state.main_state):.2e} "
                      f"noise={noisequant}", flush=True)

        run_loss = float(run_loss); run_mse = float(run_mse); run_bpp = float(run_bpp)
        logger.log("Train", {"loss": run_loss / max(n_steps, 1),
                             "mse": run_mse / max(n_steps, 1),
                             "bpp": run_bpp / max(n_steps, 1)}, epoch)
        if epoch % args.eval_every and epoch != args.epochs - 1:
            print(f"epoch {epoch}: train_loss={run_loss/max(n_steps,1):.4f} "
                  f"({time.time()-t0:.1f}s)", flush=True)
            continue
        eval_metrics = run_eval(eval_fn, state.params, test_batches)
        loss = eval_metrics["loss"]
        logger.log("Test", eval_metrics, epoch)
        print(f"epoch {epoch}: train_loss={run_loss/max(n_steps,1):.4f} "
              f"test_loss={loss:.4f} test_psnr={eval_metrics['psnr']:.2f} "
              f"test_bpp={eval_metrics['bpp_loss']:.4f} "
              f"({time.time()-t0:.1f}s)", flush=True)

        if args.pretrained:  # ReduceLROnPlateau(patience=10, factor=0.3)
            if loss < plateau_best - 1e-6:
                plateau_best = loss
                plateau_bad = 0
            else:
                plateau_bad += 1
                if plateau_bad > 10:
                    new_lr = max(get_main_lr(state.main_state) * 0.3, args.min_lr)
                    state = state.replace(main_state=set_main_lr(
                        state.main_state, new_lr))
                    plateau_bad = 0
                    print(f"plateau: lr -> {new_lr:.2e}")

        # best-checkpoint retention under --save-every N: compare against
        # the best SAVED loss, not the global minimum — otherwise a new
        # best between save points is never written, and later save-point
        # epochs that beat the saved best aren't marked best either
        best_loss = min(best_loss, loss)
        do_save = (epoch % args.save_every == 0) or epoch == args.epochs - 1
        if not do_save:
            continue
        is_best = loss < best_saved_loss
        if is_best:
            best_saved_loss = loss
        ckpt = {
            "epoch": epoch,
            "params": state.params,
            "main_state": state.main_state,
            "aux_state": state.aux_state,
            "step": state.step,
            "loss": loss,
            "best_loss": best_loss,
        }
        delete_by_prefix(save_dir, "checkpoint_last_")
        save_checkpoint(ckpt, save_dir / f"checkpoint_last_{epoch}.msgpack")
        if is_best:
            delete_by_prefix(save_dir, "checkpoint_best_")
            save_checkpoint(ckpt, save_dir / f"checkpoint_best_{epoch}.msgpack")
            with open(save_dir / "best_metrics.csv", "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(sorted(eval_metrics))
                w.writerow([eval_metrics[k] for k in sorted(eval_metrics)])
            # best-model reconstruction dumps of the first val images
            # (reference engine.py:157-180: original/recon/jpeg/residual/
            # residual_hat, residuals visualized as x*0.5+0.5)
            from ..train import save_image
            img_dir = save_dir / "best_images"
            img_dir.mkdir(exist_ok=True)
            _, out = eval_fn(state.params, jnp.asarray(test_batches[0]))
            for i in range(min(6, test_batches[0].shape[0])):
                save_image(np.asarray(out["x_hat"][i]), img_dir / f"{i}_recon.png")
                save_image(test_batches[0][i], img_dir / f"{i}_original.png")
                if "jpeg_decoded" in out:
                    save_image(np.asarray(out["jpeg_decoded"][i]),
                               img_dir / f"{i}_jpeg.png")
                    save_image(np.asarray(out["residual"][i] * 0.5 + 0.5),
                               img_dir / f"{i}_residual.png")
                    save_image(np.asarray(out["residual_hat"][i] * 0.5 + 0.5),
                               img_dir / f"{i}_residual_hat.png")
    print("training done")


if __name__ == "__main__":
    main()
