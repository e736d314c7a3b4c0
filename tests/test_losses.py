"""Loss/metric tests: RD composition, PSNR/MS-SSIM properties."""

import jax
import jax.numpy as jnp
import numpy as np

from hyres_tpu.losses import AverageMeter, ms_ssim, psnr, rate_distortion_loss


def test_psnr_correct_formula():
    x = jnp.zeros((1, 8, 8, 3))
    y = jnp.full((1, 8, 8, 3), 0.1)
    # mse = 0.01 -> psnr = 20 (reference inference.py Q1 bug would give -28.13)
    assert abs(float(psnr(x, y)) - 20.0) < 1e-4


def test_ms_ssim_properties(rng_np):
    x = jnp.asarray(rng_np.random((1, 192, 192, 3)).astype(np.float32))
    assert abs(float(ms_ssim(x, x)) - 1.0) < 1e-5
    noisy = jnp.clip(x + 0.1 * jnp.asarray(rng_np.normal(0, 1, x.shape)), 0, 1)
    v = float(ms_ssim(x, noisy.astype(jnp.float32)))
    assert 0.0 < v < 1.0


def test_rate_distortion_composition():
    target = jnp.zeros((1, 16, 16, 3))
    lik = jnp.full((1, 2, 2, 4), 0.5)
    out = {
        "x_hat": jnp.full_like(target, 0.1),
        "likelihoods": {"y": lik, "z": lik},
        "jpeg_bpp_loss": jnp.float32(0.25),
    }
    d = rate_distortion_loss(out, target, lmbda=0.01, alpha=0.0)
    npx = 16 * 16
    want_y = 16 * 1.0 / npx  # 16 symbols at 1 bit each
    assert abs(float(d["y_bpp_loss"]) - want_y) < 1e-6
    assert abs(float(d["bpp_loss"]) - (2 * want_y + 0.25)) < 1e-6
    want_mse = 0.01 * 255 ** 2
    assert abs(float(d["mse_loss"]) - want_mse) < 1e-2
    assert abs(float(d["loss"]) - (0.01 * want_mse + float(d["bpp_loss"]))) < 1e-4


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.count == 2


def test_ms_ssim_bounded_on_near_identical(rng_np):
    """Regression: near-identical inputs must not push MS-SSIM above 1
    (variance cancellation in the E[x^2]-mu^2 form)."""
    x = jnp.asarray(rng_np.random((1, 192, 192, 3)).astype(np.float32))
    y = jnp.clip(x + 1e-4 * jnp.asarray(rng_np.normal(0, 1, x.shape)), 0, 1)
    v = float(ms_ssim(x, y.astype(jnp.float32)))
    assert 0.0 <= v <= 1.0


def test_load_vgg16_params_from_synthetic_npz(tmp_path, monkeypatch):
    """Mechanical check of the torch-layout .npz loading path (VERDICT r1
    item 7): a synthetic torchvision-keyed weight file must load with the
    right transposes and flip `pretrained` on."""
    import os
    import jax
    import jax.numpy as jnp

    from hyres_tpu.losses.vgg import (
        VGG16Features, _VGG16_CFG, _torch_conv_index, load_vgg16_params)

    rng = np.random.default_rng(0)
    chans = [c for c in _VGG16_CFG if c != "M"]
    arrays = {}
    cin = 3
    for i, cout in enumerate(chans):
        k = _torch_conv_index(i)
        arrays[f"features.{k}.weight"] = rng.normal(
            0, 0.05, (cout, cin, 3, 3)).astype(np.float32)
        arrays[f"features.{k}.bias"] = rng.normal(0, 0.05, (cout,)).astype(np.float32)
        cin = cout
    path = tmp_path / "vgg16.npz"
    np.savez(path, **arrays)

    monkeypatch.setenv("HYRES_VGG16_WEIGHTS", str(path))
    params, pretrained = load_vgg16_params(jax.random.key(0))
    assert pretrained

    # kernel layout: torch (O, I, kH, kW) -> flax (kH, kW, I, O)
    w0 = np.asarray(params["params"]["conv_0"]["kernel"])
    assert w0.shape == (3, 3, 3, 64)
    np.testing.assert_allclose(
        w0, np.transpose(arrays["features.0.weight"], (2, 3, 1, 0)))

    # forward runs and produces the 5 slices with halved resolutions
    feats = VGG16Features().apply(params, jnp.zeros((1, 64, 64, 3)))
    assert [f.shape[1] for f in feats] == [64, 32, 16, 8, 4]
    assert [f.shape[-1] for f in feats] == [64, 128, 256, 512, 512]

    monkeypatch.delenv("HYRES_VGG16_WEIGHTS")
    _, pretrained2 = load_vgg16_params(jax.random.key(0))
    assert not pretrained2


def test_training_cli_rejects_random_vgg(monkeypatch, tmp_path):
    """alpha>0 without VGG weights must hard-error unless overridden."""
    import pytest

    from hyres_tpu.cli import training as tcli

    monkeypatch.delenv("HYRES_VGG16_WEIGHTS", raising=False)
    from hyres_tpu.train import save_image

    for split in ("train", "test"):
        (tmp_path / split).mkdir()
        save_image(np.random.default_rng(0).random((64, 64, 3)).astype(np.float32),
                   tmp_path / split / "im.png")
    with pytest.raises(SystemExit, match="VGG16"):
        tcli.main(["-d", str(tmp_path), "--alpha", "0.001", "-e", "0",
                   "--N", "8", "--M", "8", "--patch-size", "64", "64",
                   "--savepath", str(tmp_path / "ckpt")])
