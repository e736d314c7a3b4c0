"""Converter parity: torch modules (reference architecture) -> JAX.

Builds torch modules with the reference's layer structure and state-dict
naming (conv/GDN/RBB/attention stacks per
/root/reference/models/checkerboard.py:35-88, enhancement.py:55-113),
converts the weights, and checks forward-output parity torch vs flax.
This exercises the exact mapping the .pth importer uses.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from hyres_tpu.models.checkerboard import (
    AnalysisTransform,
    HyperAnalysis,
    HyperSynthesis,
    ParamAggregation,
    SynthesisTransform,
)
from hyres_tpu.nn import CheckboardMaskedConv, MultiScaleRefine
from hyres_tpu.utils import torch_convert as tc

torch.manual_seed(0)


# ---- torch reference-architecture building blocks (test-local) -----------


def tconv(cin, cout, k=5, s=2):
    return tnn.Conv2d(cin, cout, k, stride=s, padding=k // 2)


def tdeconv(cin, cout, k=5, s=2):
    return tnn.ConvTranspose2d(cin, cout, k, stride=s, padding=k // 2,
                               output_padding=s - 1)


class TGDN(tnn.Module):
    """CompressAI-style GDN with reparameterized storage."""

    def __init__(self, C, inverse=False):
        super().__init__()
        self.inverse = inverse
        ped = (2.0 ** -18) ** 2
        self.beta = tnn.Parameter(torch.sqrt(torch.ones(C) + ped))
        self.gamma = tnn.Parameter(torch.sqrt(0.1 * torch.eye(C) + ped))

    def forward(self, x):
        C = x.shape[1]
        ped = (2.0 ** -18) ** 2
        beta = torch.clamp(self.beta, min=(1e-6 + ped) ** 0.5) ** 2 - ped
        gamma = torch.clamp(self.gamma, min=(0 + ped) ** 0.5) ** 2 - ped
        norm = F.conv2d(x * x, gamma.view(C, C, 1, 1), beta)
        return x * torch.sqrt(norm) if self.inverse else x * torch.rsqrt(norm)


class TRBB(tnn.Module):
    def __init__(self, C):
        super().__init__()
        self.conv1 = tnn.Conv2d(C, C // 2, 1)
        self.conv2 = tnn.Conv2d(C // 2, C // 2, 3, padding=1)
        self.conv3 = tnn.Conv2d(C // 2, C, 1)

    def forward(self, x):
        h = F.relu(self.conv1(x))
        h = F.relu(self.conv2(h))
        return x + self.conv3(h)


class TRU(tnn.Module):
    def __init__(self, C):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv2d(C, C // 2, 1), tnn.ReLU(),
            tnn.Conv2d(C // 2, C // 2, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(C // 2, C, 1))

    def forward(self, x):
        return F.relu(x + self.conv(x))


class TAttention(tnn.Module):
    def __init__(self, C):
        super().__init__()
        self.conv_a = tnn.Sequential(TRU(C), TRU(C), TRU(C))
        self.conv_b = tnn.Sequential(TRU(C), TRU(C), TRU(C), tnn.Conv2d(C, C, 1))

    def forward(self, x):
        return x + self.conv_a(x) * torch.sigmoid(self.conv_b(x))


def build_torch_ga(N, M):
    return tnn.Sequential(tconv(3, N), TGDN(N), TRBB(N), TAttention(N),
                          tconv(N, N), TGDN(N), TRBB(N), tconv(N, M),
                          TAttention(M))


def build_torch_gs(N, M):
    return tnn.Sequential(TAttention(M), tdeconv(M, N), TRBB(N), TGDN(N, True),
                          tdeconv(N, N), TAttention(N), TRBB(N), TGDN(N, True),
                          tdeconv(N, 3))


def _cmp(t_out, j_out, atol=1e-4):
    t_np = t_out.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(j_out), t_np, atol=atol)


def test_analysis_transform_parity():
    N, M = 8, 12
    tga = build_torch_ga(N, M)
    x = torch.rand(1, 3, 32, 32)
    want = tga(x)

    tree = tc._convert_sequential(
        {k: v.numpy() for k, v in tga.state_dict().items()}, tc._GA_LAYERS)
    model = AnalysisTransform(N, M)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    ref = model.init(jax.random.key(0), xj)
    got = model.apply({"params": tree}, xj)
    _cmp(want, got)


def test_synthesis_transform_parity():
    N, M = 8, 12
    tgs = build_torch_gs(N, M)
    y = torch.rand(1, M, 4, 4)
    want = tgs(y)
    tree = tc._convert_sequential(
        {k: v.numpy() for k, v in tgs.state_dict().items()}, tc._GS_LAYERS)
    model = SynthesisTransform(N)
    yj = jnp.asarray(y.numpy().transpose(0, 2, 3, 1))
    got = model.apply({"params": tree}, yj)
    _cmp(want, got)


def test_hyper_and_aggregation_parity():
    N, M = 8, 12
    th_a = tnn.Sequential(tnn.Conv2d(M, N, 3, padding=1), tnn.ReLU(),
                          tconv(N, N), tnn.ReLU(), tconv(N, N))
    th_s = tnn.Sequential(tdeconv(N, N), tnn.ReLU(),
                          tdeconv(N, N * 3 // 2), tnn.ReLU(),
                          tnn.Conv2d(N * 3 // 2, 2 * M, 3, padding=1))
    tpa = tnn.Sequential(tnn.Conv2d(4 * M, 640, 1), tnn.ReLU(),
                         tnn.Conv2d(640, 512, 1), tnn.ReLU(),
                         tnn.Conv2d(512, 2 * M, 1))
    y = torch.rand(1, M, 8, 8)
    z = th_a(y)
    lp = th_s(z)
    pa_in = torch.cat([lp, torch.zeros_like(lp)], 1)
    want = tpa(pa_in)

    sd = lambda m: {k: v.numpy() for k, v in m.state_dict().items()}
    ha = HyperAnalysis(N)
    hs = HyperSynthesis(N, M)
    pa = ParamAggregation(M)
    yj = jnp.asarray(y.numpy().transpose(0, 2, 3, 1))
    zj = ha.apply({"params": tc._convert_sequential(sd(th_a), tc._HA_LAYERS)}, yj)
    _cmp(z, zj)
    lpj = hs.apply({"params": tc._convert_sequential(sd(th_s), tc._HS_LAYERS)}, zj)
    _cmp(lp, lpj, atol=2e-4)
    paj = pa.apply({"params": tc._convert_sequential(sd(tpa), tc._PA_LAYERS)},
                   jnp.concatenate([lpj, jnp.zeros_like(lpj)], axis=-1))
    _cmp(want, paj, atol=5e-4)


def test_masked_conv_parity():
    M = 12
    tcp = tnn.Conv2d(M, 2 * M, 5, padding=2)
    with torch.no_grad():
        mask = torch.zeros_like(tcp.weight)
        mask[:, :, 0::2, 1::2] = 1
        mask[:, :, 1::2, 0::2] = 1
        tcp.weight.mul_(mask)
    x = torch.rand(1, M, 8, 8)
    want = tcp(x)
    sub = {k: v.numpy() for k, v in tcp.state_dict().items()}
    tree = tc._deconv_like_masked(sub)
    model = CheckboardMaskedConv(2 * M)
    got = model.apply({"params": tree},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    _cmp(want, got)


class TSE(tnn.Module):
    def __init__(self, C, r=16):
        super().__init__()
        self.fc = tnn.Sequential(tnn.Linear(C, C // r, bias=False), tnn.ReLU(),
                                 tnn.Linear(C // r, C, bias=False), tnn.Sigmoid())

    def forward(self, x):
        b, c = x.shape[0], x.shape[1]
        y = x.mean(dim=(2, 3))
        return x * self.fc(y).view(b, c, 1, 1)


class TSpatialAtt(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv = tnn.Conv2d(2, 1, 7, padding=3, bias=False)

    def forward(self, x):
        avg = x.mean(dim=1, keepdim=True)
        mx = x.max(dim=1, keepdim=True)[0]
        return torch.sigmoid(self.conv(torch.cat([avg, mx], 1)))


class TRefine(tnn.Module):
    """Reference MultiScaleRefine structure with its state-dict names."""

    def __init__(self, mid=64):
        super().__init__()
        self.conv_in = tnn.Conv2d(3, mid, 3, padding=1)
        self.act_in = tnn.PReLU()
        self.se_block = TSE(mid)

        def block():
            return tnn.Sequential(
                tnn.Conv2d(mid, mid, 3, padding=1, dilation=1), tnn.PReLU(),
                tnn.Conv2d(mid, mid, 3, padding=2, dilation=2), tnn.PReLU())

        self.scale1, self.scale2, self.scale3 = block(), block(), block()
        self.spatial_att = TSpatialAtt()
        self.fusion = tnn.Sequential(tnn.Conv2d(mid * 3, mid, 1), tnn.PReLU(),
                                     tnn.Conv2d(mid, 3, 3, padding=1))

    def forward(self, x):
        f = self.se_block(self.act_in(self.conv_in(x)))
        f1 = self.scale1(f)
        f2 = F.interpolate(f, scale_factor=0.5, mode="bilinear",
                           align_corners=False)
        f2 = F.interpolate(self.scale2(f2), size=f.shape[2:], mode="bilinear",
                           align_corners=False)
        f3 = F.interpolate(f, scale_factor=0.25, mode="bilinear",
                           align_corners=False)
        f3 = F.interpolate(self.scale3(f3), size=f.shape[2:], mode="bilinear",
                           align_corners=False)
        multi = torch.cat([f1, f2, f3], 1)
        return self.fusion(multi * self.spatial_att(multi))


def test_refine_parity():
    tr = TRefine()
    x = torch.rand(1, 3, 32, 32)
    want = tr(x)
    tree = tc.convert_refine({k: v.numpy() for k, v in tr.state_dict().items()})
    model = MultiScaleRefine()
    got = model.apply({"params": tree},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    _cmp(want, got, atol=5e-4)


def test_export_roundtrip():
    """convert -> export -> convert is the identity."""
    N, M = 8, 12
    tga = build_torch_ga(N, M)
    sd = {f"g_a.{k}": v.numpy() for k, v in tga.state_dict().items()}
    # add the rest with minimal fake modules so convert_checkerboard runs
    tgs = build_torch_gs(N, M)
    sd.update({f"g_s.{k}": v.numpy() for k, v in tgs.state_dict().items()})
    th_a = tnn.Sequential(tnn.Conv2d(M, N, 3, padding=1), tnn.ReLU(),
                          tconv(N, N), tnn.ReLU(), tconv(N, N))
    sd.update({f"h_a.{k}": v.numpy() for k, v in th_a.state_dict().items()})
    th_s = tnn.Sequential(tdeconv(N, N), tnn.ReLU(), tdeconv(N, N * 3 // 2),
                          tnn.ReLU(), tnn.Conv2d(N * 3 // 2, 2 * M, 3, padding=1))
    sd.update({f"h_s.{k}": v.numpy() for k, v in th_s.state_dict().items()})
    tpa = tnn.Sequential(tnn.Conv2d(4 * M, 640, 1), tnn.ReLU(),
                         tnn.Conv2d(640, 512, 1), tnn.ReLU(),
                         tnn.Conv2d(512, 2 * M, 1))
    sd.update({f"param_aggregation.{k}": v.numpy()
               for k, v in tpa.state_dict().items()})
    tcp = tnn.Conv2d(M, 2 * M, 5, padding=2)
    sd.update({f"context_prediction.{k}": v.numpy()
               for k, v in tcp.state_dict().items()})
    # EB params with compressai naming
    sd["entropy_bottleneck.quantiles"] = np.random.randn(N, 1, 3).astype(np.float32)
    filters = (1, 3, 3, 3, 3, 1)
    for k in range(5):
        sd[f"entropy_bottleneck._matrices.{k}"] = np.random.randn(
            N, filters[k + 1], filters[k]).astype(np.float32)
        sd[f"entropy_bottleneck._biases.{k}"] = np.random.randn(
            N, filters[k + 1], 1).astype(np.float32)
        if k < 4:
            sd[f"entropy_bottleneck._factors.{k}"] = np.random.randn(
                N, filters[k + 1], 1).astype(np.float32)

    tree = tc.convert_checkerboard(sd)
    back = tc.export_checkerboard(tree)
    tree2 = tc.convert_checkerboard(back)
    for (p1, a), (p2, b) in zip(
            sorted(_flatten(tree)), sorted(_flatten(tree2))):
        assert p1 == p2
        np.testing.assert_allclose(a, b, atol=0)


def _flatten(tree, prefix=()):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out.extend(_flatten(v, prefix + (k,)))
        else:
            out.append(("/".join(prefix + (k,)), v))
    return out


# ---- Cheng2020 block replicas (compressai naming) -------------------------


class TRBS(tnn.Module):
    def __init__(self, cin, cout, stride=2):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride=stride, padding=1)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.gdn = TGDN(cout)
        if stride != 1 or cin != cout:
            self.skip = tnn.Conv2d(cin, cout, 1, stride=stride)
        else:
            self.skip = None

    def forward(self, x):
        h = F.leaky_relu(self.conv1(x), 0.01)
        h = self.gdn(self.conv2(h))
        return h + (self.skip(x) if self.skip is not None else x)


class TRB(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = tnn.Conv2d(c, c, 3, padding=1)
        self.conv2 = tnn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        h = F.leaky_relu(self.conv1(x), 0.01)
        h = F.leaky_relu(self.conv2(h), 0.01)
        return x + h


def tsubpel(cin, cout, r=2):
    return tnn.Sequential(tnn.Conv2d(cin, cout * r * r, 3, padding=1),
                          tnn.PixelShuffle(r))


class TRBU(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.subpel_conv = tsubpel(cin, cout)
        self.conv = tnn.Conv2d(cout, cout, 3, padding=1)
        self.igdn = TGDN(cout, inverse=True)
        self.upsample = tsubpel(cin, cout)

    def forward(self, x):
        h = F.leaky_relu(self.subpel_conv(x), 0.01)
        h = self.igdn(self.conv(h))
        return h + self.upsample(x)


def test_cheng2020_converter_parity():
    from hyres_tpu.models.cheng2020 import _GA, _GS

    N = 8
    tga = tnn.Sequential(TRBS(3, N), TRB(N), TRBS(N, N), TRB(N), TRBS(N, N),
                         TRB(N), tnn.Conv2d(N, N, 3, stride=2, padding=1))
    tgs = tnn.Sequential(TRB(N), TRBU(N, N), TRB(N), TRBU(N, N), TRB(N),
                         TRBU(N, N), TRB(N), tsubpel(N, 3))
    x = torch.rand(1, 3, 64, 64)
    y = torch.rand(1, N, 4, 4)
    want_ga = tga(x)
    want_gs = tgs(y)

    sd = {f"g_a.{k}": v.numpy() for k, v in tga.state_dict().items()}
    sd.update({f"g_s.{k}": v.numpy() for k, v in tgs.state_dict().items()})
    ga_tree = {name: fn(
        {kk[len(f"g_a.{idx}.") :]: vv for kk, vv in sd.items()
         if kk.startswith(f"g_a.{idx}.")})
        for idx, name, fn in tc._CHENG_GA}
    gs_tree = {name: fn(
        {kk[len(f"g_s.{idx}.") :]: vv for kk, vv in sd.items()
         if kk.startswith(f"g_s.{idx}.")})
        for idx, name, fn in tc._CHENG_GS}

    got_ga = _GA(N).apply({"params": ga_tree},
                          jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    _cmp(want_ga, got_ga, atol=5e-4)
    got_gs = _GS(N).apply({"params": gs_tree},
                          jnp.asarray(y.numpy().transpose(0, 2, 3, 1)))
    _cmp(want_gs, got_gs, atol=5e-4)


def test_elic_converter_parity():
    """Full-model ELIC converter parity (VERDICT r1 item 6): build the
    reference LightWeightELIC topology in torch with reference state-dict
    keys (/root/reference/models/elic.py:38-116 incl. the capitalized
    ``ParamAggregation``), convert, and compare a full deterministic
    forward — the per-slice cc_transforms / context_prediction /
    ParamAggregation wiring is exactly where a silent transpose or
    slice-index swap would hide."""
    from hyres_tpu.models import LightWeightELIC

    torch.manual_seed(7)
    N, M = 8, 16
    groups = (4, 4, 8)
    S = len(groups)

    tga = build_torch_ga(N, M)
    tgs = build_torch_gs(N, M)
    th_a = tnn.Sequential(tnn.Conv2d(M, N, 3, padding=1), tnn.ReLU(),
                          tconv(N, N), tnn.ReLU(), tconv(N, N))
    th_s = tnn.Sequential(tdeconv(N, N), tnn.ReLU(),
                          tdeconv(N, N * 3 // 2), tnn.ReLU(),
                          tnn.Conv2d(N * 3 // 2, 2 * M, 3, padding=1))
    tccs = [tnn.Sequential(
        tconv(groups[0] + (groups[i - 1] if i > 1 else 0), 224, s=1),
        tnn.ReLU(), tconv(224, 128, s=1), tnn.ReLU(),
        tconv(128, 2 * groups[i], s=1)) for i in range(1, S)]
    tcps = []
    for g in groups:
        cp = tnn.Conv2d(g, 2 * g, 5, padding=2)
        with torch.no_grad():  # anchor-tap mask (checkerboard.py:43-44)
            mask = torch.zeros_like(cp.weight)
            mask[:, :, 0::2, 1::2] = 1
            mask[:, :, 1::2, 0::2] = 1
            cp.weight.mul_(mask)
        tcps.append(cp)
    tpas = [tnn.Sequential(
        tnn.Conv2d(2 * M + (2 * g if i > 0 else 0) + 2 * g, 640, 1),
        tnn.ReLU(), tnn.Conv2d(640, 512, 1), tnn.ReLU(),
        tnn.Conv2d(512, 2 * g, 1)) for i, g in enumerate(groups)]

    C = N  # EB channels
    filters = (1, 3, 3, 3, 3, 1)
    eb_sd = {"entropy_bottleneck.quantiles":
             np.stack([np.array([[-6.0, 0.3, 6.0]], np.float32)] * C) +
             np.random.RandomState(0).uniform(-0.2, 0.2, (C, 1, 3)).astype(np.float32)}
    rs = np.random.RandomState(1)
    for k in range(5):
        eb_sd[f"entropy_bottleneck._matrices.{k}"] = rs.uniform(
            -1, 0, (C, filters[k + 1], filters[k])).astype(np.float32)
        eb_sd[f"entropy_bottleneck._biases.{k}"] = rs.uniform(
            -0.5, 0.5, (C, filters[k + 1], 1)).astype(np.float32)
        if k < 4:
            eb_sd[f"entropy_bottleneck._factors.{k}"] = rs.uniform(
                -0.1, 0.1, (C, filters[k + 1], 1)).astype(np.float32)

    sd = dict(eb_sd)
    for prefix, mod in [("g_a", tga), ("g_s", tgs), ("h_a", th_a), ("h_s", th_s)]:
        sd.update({f"{prefix}.{k}": v.numpy() for k, v in mod.state_dict().items()})
    for i, mod in enumerate(tccs):
        sd.update({f"cc_transforms.{i}.{k}": v.numpy()
                   for k, v in mod.state_dict().items()})
    for i, mod in enumerate(tcps):
        sd.update({f"context_prediction.{i}.{k}": v.numpy()
                   for k, v in mod.state_dict().items()})
    for i, mod in enumerate(tpas):
        sd.update({f"ParamAggregation.{i}.{k}": v.numpy()
                   for k, v in mod.state_dict().items()})

    tree = tc.convert_elic(sd, num_slices=S)

    # ---- torch deterministic (eval/STE) forward ----
    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        y = tga(x)
        z = th_a(y)
        med = torch.from_numpy(
            eb_sd["entropy_bottleneck.quantiles"][:, 0, 1]).view(1, C, 1, 1)
        z_hat = torch.round(z - med) + med
        lp = th_s(z_hat)
        lm, ls = lp.chunk(2, 1)
        H, W = y.shape[2], y.shape[3]
        ii = torch.arange(H)[:, None]
        jj = torch.arange(W)[None, :]
        mask_a = (((ii + jj) % 2) == 0).float().view(1, 1, H, W)
        y_slices = torch.split(y, list(groups), dim=1)
        y_hat_slices = []
        for i, ys in enumerate(y_slices):
            if i == 0:
                support = torch.cat([lm, ls], 1)
            else:
                cc_in = y_hat_slices[0] if i == 1 else torch.cat(
                    [y_hat_slices[0], y_hat_slices[-1]], 1)
                cc = tccs[i - 1](cc_in)
                ccm, ccs = cc.chunk(2, 1)
                support = torch.cat([ccm, ccs, lm, ls], 1)
            g = groups[i]
            pa_in = torch.cat([torch.zeros_like(ys.repeat(1, 2, 1, 1)[:, :2 * g]),
                               support], 1)
            means_a, scales_a = tpas[i](pa_in).chunk(2, 1)
            ya = (torch.round(ys * mask_a - means_a) + means_a) * mask_a
            ctx = tcps[i](ya)
            means_n, scales_n = tpas[i](torch.cat([ctx, support], 1)).chunk(2, 1)
            yn = (torch.round(ys * (1 - mask_a) - means_n) + means_n) * (1 - mask_a)
            y_hat_slices.append(ya + yn)
        x_hat = tgs(torch.cat(y_hat_slices, 1))

    # ---- converted JAX forward ----
    model = LightWeightELIC(N=N, M=M, groups=groups)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = model.apply({"params": tree}, xj, noisequant=False)
    _cmp(x_hat, out["x_hat"], atol=2e-3)
