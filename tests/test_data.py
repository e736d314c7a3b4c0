"""Data pipeline tests: dihedral augmentation + eval-every cadence.

Augmentation is NOT in the reference's pipeline
(/root/reference/src/utils/dataset_utils.py uses RandomCrop only); it is
an opt-in flag for small-dataset runs, so the default path must remain
bit-identical to the unaugmented loader.
"""

import glob

import numpy as np

from hyres_tpu.train import save_image
from hyres_tpu.train.data import ImageFolder


def _make_ds(root, size=(64, 64), n=2):
    rng = np.random.default_rng(7)
    for split in ("train", "test"):
        d = root / "ds" / split
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            save_image(rng.random((*size, 3)).astype(np.float32),
                       d / f"im{i}.png")
    return root / "ds"


def test_augment_off_is_identity(tmp_path):
    ds = _make_ds(tmp_path)
    plain = ImageFolder(str(ds), "train", (32, 32), train=True)
    aug_off = ImageFolder(str(ds), "train", (32, 32), train=True,
                          augment=False)
    a = plain.load(0, np.random.default_rng(3))
    b = aug_off.load(0, np.random.default_rng(3))
    np.testing.assert_array_equal(a, b)


def test_augment_square_is_d4(tmp_path):
    """Every augmented square crop equals one of the 8 dihedral images of
    the unaugmented crop drawn with the same rng stream, and over many
    draws more than one element of the group occurs."""
    ds = _make_ds(tmp_path)
    plain = ImageFolder(str(ds), "train", (32, 32), train=True)
    aug = ImageFolder(str(ds), "train", (32, 32), train=True, augment=True)

    seen = set()
    for seed in range(24):
        base = plain.load(0, np.random.default_rng(seed))
        got = aug.load(0, np.random.default_rng(seed))
        variants = {}
        for k in range(8):
            v = base[:, ::-1] if k & 4 else base
            v = np.rot90(v, k & 3)
            variants[k] = v
        match = [k for k, v in variants.items() if np.array_equal(got, v)]
        assert match, f"augmented crop is not a dihedral image (seed {seed})"
        seen.add(match[0])
    assert len(seen) > 3, f"suspiciously few group elements drawn: {seen}"


def test_augment_nonsquare_flips_only(tmp_path):
    ds = _make_ds(tmp_path)
    aug = ImageFolder(str(ds), "train", (32, 48), train=True, augment=True)
    for seed in range(8):
        got = aug.load(0, np.random.default_rng(seed))
        assert got.shape == (32, 48, 3)  # rotations would transpose dims


def test_augment_eval_split_unaffected(tmp_path):
    ds = _make_ds(tmp_path)
    ev = ImageFolder(str(ds), "test", None, train=False, augment=True)
    a = ev.load(0, np.random.default_rng(0))
    b = ev.load(0, np.random.default_rng(1))
    np.testing.assert_array_equal(a, b)


def test_training_eval_every(tmp_path, capsys):
    """--eval-every 2 on a 4-epoch run: eval happens only on epochs
    0, 2 and the final epoch; a last checkpoint is still written."""
    from hyres_tpu.cli import training

    ds = _make_ds(tmp_path)
    out = tmp_path / "ck"
    training.main([
        "-d", str(ds), "--model", "hyres", "--N", "8", "--M", "12",
        "--jpeg-quality", "10", "--lambda", "0.01", "-e", "4",
        "--batch-size", "2", "--test-batch-size", "2",
        "--patch-size", "64", "64", "--savepath", str(out),
        "--steps-per-epoch", "1", "--noise-epochs", "1",
        "--eval-every", "2", "--augment",
    ])
    assert glob.glob(str(out / "checkpoint_last_*.msgpack"))
    lines = capsys.readouterr().out.splitlines()
    evaled = sorted(int(l.split()[1].rstrip(":")) for l in lines
                    if "test_loss=" in l)
    assert evaled == [0, 2, 3], lines


def test_scale_range_shapes_and_default_identity(tmp_path):
    """--augment-scale resamples the source before cropping: crops keep
    the patch shape, differ from the unscaled crop for factors != 1, and
    scale_range=None stays bit-identical to the plain loader. Eval
    splits never rescale."""
    ds = _make_ds(tmp_path)
    plain = ImageFolder(str(ds), "train", (32, 32), train=True)
    scaled = ImageFolder(str(ds), "train", (32, 32), train=True,
                         scale_range=(0.5, 0.999))
    noop = ImageFolder(str(ds), "train", (32, 32), train=True,
                       scale_range=None)
    np.testing.assert_array_equal(plain.load(0, np.random.default_rng(3)),
                                  noop.load(0, np.random.default_rng(3)))
    diffs = 0
    for seed in range(8):
        a = scaled.load(0, np.random.default_rng(seed))
        assert a.shape == (32, 32, 3)
        assert a.dtype == np.float32 and 0.0 <= a.min() and a.max() <= 1.0
        b = plain.load(0, np.random.default_rng(seed))
        diffs += int(not np.array_equal(a, b))
    assert diffs >= 6  # factors < 1 actually resample

    # tiny range fully below patch/source: clamps so the crop still fits
    tiny = ImageFolder(str(ds), "train", (32, 32), train=True,
                       scale_range=(0.01, 0.02))
    assert tiny.load(0, np.random.default_rng(0)).shape == (32, 32, 3)

    ev = ImageFolder(str(ds), "test", None, train=False,
                     scale_range=(0.5, 0.999))
    assert ev.scale_range is None


def test_decode_cache_is_transparent(tmp_path):
    """The in-memory decode cache must change timings only: same pixels
    as the uncached path for the same rng stream, and it must respect
    the byte cap (stop caching, never evict wrongly)."""
    ds_root = _make_ds(tmp_path)
    a = ImageFolder(str(ds_root), "train", (32, 32), train=True)
    first = a.load(0, np.random.default_rng(3))
    assert a._cache_bytes > 0  # cached on first touch
    second = a.load(0, np.random.default_rng(3))
    assert np.array_equal(first, second)

    b = ImageFolder(str(ds_root), "train", (32, 32), train=True)
    b._cache_bytes = 1 << 60  # poison: cap always exceeded -> no caching
    uncached = b.load(0, np.random.default_rng(3))
    assert np.array_equal(first, uncached)
    assert not b._cache
