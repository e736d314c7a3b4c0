"""Data pipeline: flat-folder image dataset + batched loader (NHWC).

Capability-parity with the reference's ``ImageFolder``
(/root/reference/src/utils/dataset_utils.py:8-73): flat
``root/{train,test}/*.png`` layout, RGB convert, bilinear
upscale-if-smaller-than-crop with a 1% buffer, random crop for training
and center/full image for eval. Corrupt images are tolerated
(reference src/training.py:24 sets LOAD_TRUNCATED_IMAGES).

The loader is a thread-pooled host pipeline producing numpy NHWC float32
batches; JPEG base-layer work happens on device (jpeg/core.py), so the
host only decodes PNGs and crops.
"""

from __future__ import annotations

import concurrent.futures
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image, ImageFile

ImageFile.LOAD_TRUNCATED_IMAGES = True

_EXTS = {".png", ".jpg", ".jpeg", ".bmp"}

# decoded-image cache cap: small training sets (the offline Kodak split
# is 18 images, ~21 MB decoded) re-decode every epoch otherwise — at
# thousands of epochs that is hours of pure PNG decode on this 1-core
# host. Big datasets simply stop caching at the cap.
_CACHE_BYTES_CAP = 1 << 29  # 512 MB


class ImageFolder:
    def __init__(self, root: str, split: str = "train",
                 patch_size: Optional[Tuple[int, int]] = (256, 256),
                 train: bool = True, augment: bool = False,
                 scale_range: Optional[Tuple[float, float]] = None):
        base = Path(root) / split
        if not base.is_dir():
            raise RuntimeError(f"missing dataset split directory: {base}")
        self.samples: List[Path] = sorted(
            p for p in base.iterdir() if p.suffix.lower() in _EXTS)
        if not self.samples:
            raise RuntimeError(f"no images found in {base}")
        self.patch_size = patch_size
        self.train = train
        # dihedral-group augmentation (flips + transpose: 8 variants per
        # crop). NOT in the reference's pipeline (dataset_utils.py uses
        # RandomCrop only) — off by default for recipe parity; it matters
        # on small training sets where crops repeat across epochs.
        self.augment = augment and train
        # random-rescale augmentation: resample the source by a factor
        # drawn log-uniformly from scale_range before cropping, so the
        # same pixels contribute crops at several texture scales. Also
        # not in the reference; another data-diversity lever for tiny
        # training sets. Scales below patch/source are clamped so a
        # patch always fits.
        self.scale_range = scale_range if train else None
        self._cache: dict = {}
        self._cache_bytes = 0

    def __len__(self) -> int:
        return len(self.samples)

    def _open(self, index: int) -> Image.Image:
        """Decoded source image; full-resolution RGB u8 arrays are cached
        up to _CACHE_BYTES_CAP (dict ops are GIL-atomic; a rare duplicate
        decode under the thread pool is harmless)."""
        hit = self._cache.get(index)
        if hit is not None:
            return Image.fromarray(hit)
        img = Image.open(self.samples[index]).convert("RGB")
        arr = np.asarray(img, np.uint8)
        if self._cache_bytes + arr.nbytes <= _CACHE_BYTES_CAP:
            self._cache[index] = arr
            self._cache_bytes += arr.nbytes
        return img

    def load(self, index: int, rng: np.random.Generator) -> np.ndarray:
        img = self._open(index)
        if self.scale_range is not None and self.patch_size is not None:
            lo, hi = self.scale_range
            s = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
            w, h = img.size
            ph, pw = self.patch_size
            s = max(s, pw / w, ph / h)  # keep the crop in range
            if abs(s - 1.0) > 1e-3:
                img = img.resize((max(pw, int(round(w * s))),
                                  max(ph, int(round(h * s)))),
                                 Image.BILINEAR)
        if self.patch_size is not None:
            ph, pw = self.patch_size
            w, h = img.size
            if w < pw or h < ph:
                # upscale with a 1% buffer (reference dataset_utils.py:49-66)
                scale = max(pw / w, ph / h) * 1.01
                img = img.resize((int(w * scale) + 1, int(h * scale) + 1),
                                 Image.BILINEAR)
                w, h = img.size
            if self.train:
                x0 = int(rng.integers(0, w - pw + 1))
                y0 = int(rng.integers(0, h - ph + 1))
            else:
                x0, y0 = (w - pw) // 2, (h - ph) // 2
            img = img.crop((x0, y0, x0 + pw, y0 + ph))
        arr = np.asarray(img, np.float32) / 255.0
        if self.augment:
            if arr.shape[0] == arr.shape[1]:
                k = int(rng.integers(8))  # D4 element: 4 rotations x flip
                if k & 4:
                    arr = arr[:, ::-1]
                arr = np.rot90(arr, k & 3)
            else:  # non-square crops: rotations change shape; flips only
                k = int(rng.integers(4))
                if k & 1:
                    arr = arr[:, ::-1]
                if k & 2:
                    arr = arr[::-1]
            arr = np.ascontiguousarray(arr)
        return arr


class DataLoader:
    """Shuffled, thread-pooled batch iterator over an ImageFolder."""

    def __init__(self, dataset: ImageFolder, batch_size: int,
                 shuffle: bool = True, drop_last: bool = True,
                 seed: int = 0, num_workers: int = 8):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.pool = concurrent.futures.ThreadPoolExecutor(num_workers)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[np.ndarray]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        stop = (len(order) // self.batch_size * self.batch_size
                if self.drop_last else len(order))
        for i in range(0, stop, self.batch_size):
            idx = order[i: i + self.batch_size]
            seeds = [np.random.default_rng(int(self.rng.integers(2 ** 31)))
                     for _ in idx]
            imgs = list(self.pool.map(self.dataset.load, idx, seeds))
            yield np.stack(imgs)


def load_image(path: str) -> np.ndarray:
    """Single image -> (1, H, W, 3) float32 in [0,1]."""
    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.float32)[None] / 255.0


def save_image(x: np.ndarray, path: str):
    """(H, W, 3) or (1, H, W, 3) in [0,1] -> file."""
    if x.ndim == 4:
        x = x[0]
    arr = np.clip(np.asarray(x) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
