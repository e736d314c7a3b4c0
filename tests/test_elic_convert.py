"""ELIC .pth converter parity test — VERDICT r1 item 6.

Builds the reference's per-slice ELIC machinery in torch
(/root/reference/models/elic.py:89-116: cc_transforms, checkerboard
context_prediction, ParamAggregation with capitalized naming), converts
the state dict with utils.torch_convert.convert_elic, and asserts forward
parity of the slice-context paths — exactly where a silent transpose or
slice-ordering bug would hide.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from hyres_tpu.models import LightWeightELIC
from hyres_tpu.utils import torch_convert as tc

torch.manual_seed(0)

N, M = 8, 16
GROUPS = (4, 4, 8)  # 3 tiny slices summing to M


def tcc(cin, cout):
    """Reference cc_transform: 3x (5x5 stride-1 conv), 224/128 mids
    (elic.py:89-98)."""
    return tnn.Sequential(
        tnn.Conv2d(cin, 224, 5, padding=2), tnn.ReLU(),
        tnn.Conv2d(224, 128, 5, padding=2), tnn.ReLU(),
        tnn.Conv2d(128, cout, 5, padding=2))


def tpa(cin, cout):
    """Reference ParamAggregation: 1x1 stack -> 640 -> 512 -> 2g
    (elic.py:108-116)."""
    return tnn.Sequential(
        tnn.Conv2d(cin, 640, 1), tnn.ReLU(),
        tnn.Conv2d(640, 512, 1), tnn.ReLU(),
        tnn.Conv2d(512, cout, 1))


class TMaskedConv(tnn.Conv2d):
    """Reference CheckboardMaskedConv2d (checkerboard.py:26-49)."""

    def __init__(self, cin, cout):
        super().__init__(cin, cout, 5, padding=2)
        mask = torch.zeros(5, 5)
        mask[0::2, 1::2] = 1
        mask[1::2, 0::2] = 1
        self.register_buffer("mask", mask[None, None])

    def forward(self, x):
        return tnn.functional.conv2d(
            x, self.weight * self.mask, self.bias, padding=2)


def _build_state_dict():
    """Full torch ELIC state dict for GROUPS; transforms reuse the
    checkerboard topology (already parity-tested in test_torch_convert)."""
    from tests.test_torch_convert import (  # torch replicas
        build_torch_ga, build_torch_gs, tconv, tdeconv)

    sd = {}
    tga = build_torch_ga(N, M)
    tgs = build_torch_gs(N, M)
    th_a = tnn.Sequential(tnn.Conv2d(M, N, 3, padding=1), tnn.ReLU(),
                          tconv(N, N), tnn.ReLU(), tconv(N, N))
    th_s = tnn.Sequential(tdeconv(N, N), tnn.ReLU(), tdeconv(N, N * 3 // 2),
                          tnn.ReLU(), tnn.Conv2d(N * 3 // 2, 2 * M, 3, padding=1))
    modules = {"g_a": tga, "g_s": tgs, "h_a": th_a, "h_s": th_s}

    # per-slice machinery, reference channel arithmetic (elic.py:89-116)
    ccs, cps, pas = [], [], []
    for i in range(1, len(GROUPS)):
        cin = GROUPS[0] if i == 1 else GROUPS[0] + GROUPS[i - 1]
        ccs.append(tcc(cin, 2 * GROUPS[i]))
    for i, g in enumerate(GROUPS):
        cps.append(TMaskedConv(g, 2 * g))
        pas.append(tpa(2 * M + 2 * g + (2 * GROUPS[i] if i > 0 else 0), 2 * g))
    for i, m in enumerate(ccs):
        modules[f"cc_transforms.{i}"] = m
    for i, m in enumerate(cps):
        modules[f"context_prediction.{i}"] = m
    for i, m in enumerate(pas):
        modules[f"ParamAggregation.{i}"] = m

    for name, m in modules.items():
        for k, v in m.state_dict().items():
            if k.endswith("mask"):
                continue
            sd[f"{name}.{k}"] = v.numpy()

    # EB params, compressai naming
    filters = (1, 3, 3, 3, 3, 1)
    rng = np.random.default_rng(0)
    sd["entropy_bottleneck.quantiles"] = rng.normal(
        0, 1, (N, 1, 3)).astype(np.float32)
    for k in range(5):
        sd[f"entropy_bottleneck._matrices.{k}"] = rng.normal(
            0, 1, (N, filters[k + 1], filters[k])).astype(np.float32)
        sd[f"entropy_bottleneck._biases.{k}"] = rng.normal(
            0, 1, (N, filters[k + 1], 1)).astype(np.float32)
        if k < 4:
            sd[f"entropy_bottleneck._factors.{k}"] = rng.normal(
                0, 1, (N, filters[k + 1], 1)).astype(np.float32)
    return sd, modules


def _nchw(x):
    return torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))


def _nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def test_elic_converter_slice_paths_parity():
    sd, modules = _build_state_dict()
    tree = tc.convert_elic(sd, num_slices=len(GROUPS))
    model = LightWeightELIC(N=N, M=M, groups=GROUPS)
    params = {"params": tree}

    B, H, W = 1, 8, 8
    rng = np.random.default_rng(1)
    lm = jnp.asarray(rng.normal(0, 1, (B, H, W, M)).astype(np.float32))
    ls = jnp.asarray(rng.normal(0, 1, (B, H, W, M)).astype(np.float32))
    y_first = jnp.asarray(rng.normal(0, 1, (B, H, W, GROUPS[0])).astype(np.float32))
    y_prev = jnp.asarray(rng.normal(0, 1, (B, H, W, GROUPS[1])).astype(np.float32))

    for i in range(len(GROUPS)):
        # ---- slice_support (cc_transforms chunk order: mean, scale) ----
        sup = model.apply(params, i, y_first, y_prev, lm, ls,
                          method=model.slice_support)
        if i == 0:
            want = torch.cat([_nchw(lm), _nchw(ls)], dim=1)
        else:
            cc_in = (_nchw(y_first) if i == 1
                     else torch.cat([_nchw(y_first), _nchw(y_prev)], dim=1))
            cc = modules[f"cc_transforms.{i - 1}"](cc_in)
            m_, s_ = cc.chunk(2, 1)
            want = torch.cat([m_, s_, _nchw(lm), _nchw(ls)], dim=1)
        np.testing.assert_allclose(np.asarray(sup), _nhwc(want), atol=2e-4)

        # ---- anchor params: PA([zero ctx, support]), (means, scales) ----
        g = GROUPS[i]
        means, scales = model.apply(params, i, sup,
                                    method=model.slice_anchor_params)
        zctx = torch.zeros(B, 2 * g, H, W)
        p = modules[f"ParamAggregation.{i}"](torch.cat([zctx, want], dim=1))
        wm, ws = p.chunk(2, 1)
        np.testing.assert_allclose(np.asarray(means), _nhwc(wm), atol=2e-4)
        np.testing.assert_allclose(np.asarray(scales), _nhwc(ws), atol=2e-4)

        # ---- non-anchor params: masked-conv ctx then PA ----
        y_a = jnp.asarray(rng.normal(0, 1, (B, H, W, g)).astype(np.float32))
        means_n, scales_n = model.apply(params, i, sup, y_a,
                                        method=model.slice_nonanchor_params)
        ctx = modules[f"context_prediction.{i}"](_nchw(y_a))
        p = modules[f"ParamAggregation.{i}"](torch.cat([ctx, want], dim=1))
        wm, ws = p.chunk(2, 1)
        np.testing.assert_allclose(np.asarray(means_n), _nhwc(wm), atol=2e-4)
        np.testing.assert_allclose(np.asarray(scales_n), _nhwc(ws), atol=2e-4)


def test_elic_converter_full_forward_runs():
    """Converted params drive the full eval forward without shape errors
    and produce a finite rate."""
    sd, _ = _build_state_dict()
    tree = tc.convert_elic(sd, num_slices=len(GROUPS))
    model = LightWeightELIC(N=N, M=M, groups=GROUPS)
    x = jnp.asarray(np.random.default_rng(2).random((1, 64, 64, 3)),
                    jnp.float32)
    out = model.apply({"params": tree}, x, noisequant=False)
    assert out["x_hat"].shape == x.shape
    assert all(bool(jnp.all(jnp.isfinite(l)))
               for l in out["likelihoods"].values())
