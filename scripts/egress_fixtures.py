"""Produce the egress-blocked fixtures the moment a networked env exists.

This repo is built in a zero-egress environment, which blocks exactly
three external artifacts (VERDICT r2 "What's missing" #3/#4):

  1. torchvision VGG16 ImageNet weights  -> perceptual training loss
     (reference /root/reference/src/losses/vgg16.py:21)
  2. LPIPS AlexNet weights               -> LPIPS eval metric
     (reference /root/reference/src/utils/metrics.py:34-41)
  3. CompressAI byte-level stream fixtures -> cross-decode proof that
     our C++ rANS coder is byte-compatible with CompressAI's
     (SURVEY §7 hard-part 1)

Everything downstream of these files is already implemented and
mechanically tested (synthetic-npz loaders, same-construction rANS
equivalence). Run this script ONCE in an environment with internet +
torch/torchvision/lpips/compressai installed:

    python scripts/egress_fixtures.py --out fixtures/

then copy fixtures/ into the repo root here. Tests in
tests/test_losses.py and tests/test_rans.py activate automatically on
fixture presence (they skip otherwise), and training/eval pick the
weights up via:

    export HYRES_VGG16_WEIGHTS=fixtures/vgg16_imagenet.npz
    export HYRES_LPIPS_WEIGHTS=fixtures/lpips_alex.npz
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def export_vgg16(out_dir: str) -> None:
    """torchvision VGG16 -> npz in the load_vgg16_params layout
    (keys features.{idx}.weight/bias, torch (O, I, kH, kW) kernels)."""
    import torchvision

    model = torchvision.models.vgg16(
        weights=torchvision.models.VGG16_Weights.IMAGENET1K_V1)
    out = {}
    for name, tensor in model.features.state_dict().items():
        out[f"features.{name}"] = tensor.detach().cpu().numpy()
    path = os.path.join(out_dir, "vgg16_imagenet.npz")
    np.savez(path, **out)
    print(f"wrote {path} ({len(out)} tensors)")


def export_lpips(out_dir: str) -> None:
    """pip lpips AlexNet model -> npz in the losses/lpips.py layout."""
    import lpips as lpips_pkg

    model = lpips_pkg.LPIPS(net="alex")
    out = {}
    # AlexNet trunk convs live at net.slice{1..5}; torchvision indices of
    # the five convs inside alexnet.features are 0, 3, 6, 8, 10
    convs = [m for m in model.net.parameters()]
    sd = model.net.state_dict()
    conv_keys = sorted(
        {k.rsplit(".", 1)[0] for k in sd if k.endswith(".weight")},
        key=lambda k: [int(t) if t.isdigit() else t for t in k.split(".")])
    assert len(conv_keys) == 5, conv_keys
    for i, key in enumerate(conv_keys):
        out[f"net.conv{i}.weight"] = sd[f"{key}.weight"].cpu().numpy()
        out[f"net.conv{i}.bias"] = sd[f"{key}.bias"].cpu().numpy()
    for i in range(5):
        lin = model.lins[i].model[-1]  # dropout? -> conv1x1 is last
        out[f"lin{i}.weight"] = lin.weight.detach().cpu().numpy()
    path = os.path.join(out_dir, "lpips_alex.npz")
    np.savez(path, **out)
    print(f"wrote {path} ({len(out)} tensors)")


def export_compressai_streams(out_dir: str, seed: int = 1234) -> None:
    """CompressAI rANS byte-level fixtures: symbols/indexes/tables plus
    the exact bytes CompressAI's coder produces for them.

    The activated test (tests/test_rans.py::test_compressai_byte_interop)
    asserts our BufferedRansEncoder emits identical bytes AND our
    RansDecoder decodes CompressAI's bytes exactly.
    """
    from compressai import ans

    rng = np.random.default_rng(seed)
    cases = []
    for case_id, (rows, max_bins, n) in enumerate(
            [(4, 16, 1000), (64, 300, 50000), (8, 64, 1)]):
        cdfs, lengths, offsets = [], [], []
        maxlen = max_bins + 2
        for _ in range(rows):
            bins = int(rng.integers(2, max_bins))
            pmf = rng.random(bins) + 1e-3
            pmf /= pmf.sum()
            # quantize like CompressAI: _quantize_cdf over pmf + tail
            from compressai._CXX import pmf_to_quantized_cdf
            cdf = pmf_to_quantized_cdf(
                np.concatenate([pmf, [1e-9]]).tolist(), 16)
            cdfs.append(np.pad(cdf, (0, maxlen + 1 - len(cdf))))
            lengths.append(len(cdf))
            offsets.append(int(rng.integers(-10, 10)))
        cdfs = np.asarray(cdfs, np.int32)
        lengths = np.asarray(lengths, np.int32)
        offsets = np.asarray(offsets, np.int32)
        indexes = rng.integers(0, rows, n).astype(np.int32)
        # mix of in-support symbols and bypass escapes
        symbols = np.array([
            int(rng.integers(offsets[i], offsets[i] + lengths[i] - 2))
            for i in indexes], np.int32)
        esc = rng.random(n) < 0.01
        symbols[esc] += 1000
        enc = ans.RansEncoder()
        stream = enc.encode_with_indexes(
            symbols.tolist(), indexes.tolist(), cdfs.tolist(),
            lengths.tolist(), offsets.tolist())
        cases.append(dict(symbols=symbols, indexes=indexes, cdfs=cdfs,
                          lengths=lengths, offsets=offsets,
                          stream=np.frombuffer(stream, np.uint8)))
    path = os.path.join(out_dir, "compressai_streams.npz")
    np.savez(path, n_cases=len(cases),
             **{f"c{i}_{k}": v for i, c in enumerate(cases)
                for k, v in c.items()})
    print(f"wrote {path} ({len(cases)} cases)")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="fixtures")
    ap.add_argument("--skip-vgg", action="store_true")
    ap.add_argument("--skip-lpips", action="store_true")
    ap.add_argument("--skip-compressai", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if not args.skip_vgg:
        export_vgg16(args.out)
    if not args.skip_lpips:
        export_lpips(args.out)
    if not args.skip_compressai:
        export_compressai_streams(args.out)


if __name__ == "__main__":
    main()
