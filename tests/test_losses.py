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
