"""NYUv2 / SUN-RGBD data pipelines, NHWC numpy.

Behavioral spec from reference dataset/{trainDataset,testDataset}.py:
  - train roots hold color/* + gt/*; channel selects depth(1)/rgb(3)/pair(4)
  - depth normalization: /255 for 8-bit files, else the dataset's depth_max
    (NYU 10000, SUN 100000); test-side scale is auto-detected from the max
    value (testDataset.py:50-55)
  - train: joint RandomCrop 256 + random h/v flips; val: CenterCrop 448x576
  - test folders hold rgb/ + depth/; samples sorted so index pairing holds
  - debug mode truncates to 100 (train) / 20 (test) files

The loader is a plain-python prefetching batcher (TPU input is host-bound
numpy; no torch DataLoader workers needed at these image counts).
"""

from __future__ import annotations

import os
import threading
import queue
from pathlib import Path

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def _load_rgb(path) -> np.ndarray:
    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.float32) / 255.0  # [H,W,3]


def _load_depth(path, depth_max: float) -> np.ndarray:
    d = np.asarray(Image.open(path)).astype(np.float32)
    if d.ndim == 3:
        d = d[..., 0]
    scale = 255.0 if d.max() < 255 else depth_max
    return (d / scale)[..., None]  # [H,W,1]


def _auto_depth_scale(d: np.ndarray) -> float:
    m = d.max()
    if 255 < m < 10000:
        return 10000.0
    if m >= 10000:
        return 100000.0
    return 255.0


class BaseDataset:
    """Training/validation dataset over {root}/color + {root}/gt."""

    depth_max = 10000.0
    patch_size = 256
    val_crop = (448, 576)

    def __init__(self, root: str, is_train: bool, channel: int = 4, debug: bool = False):
        self.train = is_train
        self.channel = channel
        root = str(root)
        if channel > 1:
            self.rgb_files = sorted(str(p) for p in Path(root, "color").iterdir())
            if debug:
                self.rgb_files = self.rgb_files[:100]
            self._len = len(self.rgb_files)
        if channel in (1, 4):
            self.depth_files = sorted(str(p) for p in Path(root, "gt").iterdir())
            if debug:
                self.depth_files = self.depth_files[:100]
            self._len = len(self.depth_files)

    def __len__(self):
        return self._len

    def _crop_flip(self, imgs: list[np.ndarray], rng: np.random.Generator):
        h, w = imgs[0].shape[:2]
        if self.train:
            ps = self.patch_size
            top = int(rng.integers(0, max(h - ps, 0) + 1))
            left = int(rng.integers(0, max(w - ps, 0) + 1))
            imgs = [im[top : top + ps, left : left + ps] for im in imgs]
            if rng.random() > 0.5:
                imgs = [im[:, ::-1] for im in imgs]
            if rng.random() > 0.5:
                imgs = [im[::-1, :] for im in imgs]
        else:
            ch, cw = self.val_crop
            top = max((h - ch) // 2, 0)
            left = max((w - cw) // 2, 0)
            imgs = [im[top : top + ch, left : left + cw] for im in imgs]
        return [np.ascontiguousarray(im) for im in imgs]

    def get(self, index: int, rng: np.random.Generator):
        items = []
        if self.channel > 1:
            items.append(_load_rgb(self.rgb_files[index]))
        if self.channel in (1, 4):
            items.append(_load_depth(self.depth_files[index], self.depth_max))
        items = self._crop_flip(items, rng)
        if self.channel == 4:
            return tuple(items)  # (rgb, depth)
        return (items[0],)


class NYUv2Dataset(BaseDataset):
    depth_max = 10000.0


class SUNRGBDDataset(BaseDataset):
    depth_max = 100000.0


def make_train_dataset(name: str, root: str, is_train: bool, channel: int = 4,
                       debug: bool = False) -> BaseDataset:
    cls = SUNRGBDDataset if "sun" in name.lower() else NYUv2Dataset
    return cls(root, is_train, channel=channel, debug=debug)


class ImageFolder:
    """Test dataset over {root}/rgb or {root}/depth; returns (img, stem)."""

    def __init__(self, root: str, channel: int = 3, debug: bool = False):
        split = "rgb" if channel == 3 else "depth"
        self.channel = channel
        splitdir = Path(root) / split
        if not splitdir.is_dir():
            raise RuntimeError(f'Invalid directory "{root}"')
        self.samples = sorted(p for p in splitdir.iterdir() if p.is_file())
        if debug:
            self.samples = self.samples[:20]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        path = self.samples[index]
        if self.channel == 3:
            img = _load_rgb(path)
        else:
            d = np.asarray(Image.open(path)).astype(np.float32)
            if d.ndim == 3:
                d = d[..., 0]
            img = (d / _auto_depth_scale(d))[..., None]
        return img, path.stem


class ImageFolderUnited:
    """Paired rgb+depth test set, index-aligned by sorted order."""

    def __init__(self, root: str, debug: bool = False):
        self.rgb = ImageFolder(root, channel=3, debug=debug)
        self.depth = ImageFolder(root, channel=1, debug=debug)

    def __len__(self):
        return len(self.rgb)

    def __getitem__(self, index):
        rgb, rname = self.rgb[index]
        depth, dname = self.depth[index]
        return rgb, depth, rname, dname


class SyntheticRGBD:
    """Deterministic random RGB-D pairs — the framework's debug fixture
    (analog of the reference's --debug truncated datasets)."""

    def __init__(self, n: int = 16, size: int = 256, channel: int = 4, seed: int = 0):
        self.n = n
        self.size = size
        self.channel = channel
        self.seed = seed
        self.train = True

    def __len__(self):
        return self.n

    def get(self, index: int, rng=None):
        g = np.random.default_rng(self.seed * 100003 + index)
        s = self.size
        rgb = g.uniform(size=(s, s, 3)).astype(np.float32)
        depth = g.uniform(size=(s, s, 1)).astype(np.float32)
        if self.channel == 4:
            return rgb, depth
        if self.channel == 3:
            return (rgb,)
        return (depth,)


class DataLoader:
    """Shuffling, prefetching batcher producing stacked NHWC numpy tuples."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0
        self.seed = seed

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        self.epoch += 1
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(order)

        def batches():
            bs = self.batch_size
            n_batches = len(self)
            for bi in range(n_batches):
                idxs = order[bi * bs : (bi + 1) * bs]
                items = [self.dataset.get(int(i), rng) for i in idxs]
                yield tuple(
                    np.stack([it[k] for it in items]) for k in range(len(items[0]))
                )

        if self.prefetch <= 0:
            yield from batches()
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()

        def producer():
            for b in batches():
                q.put(b)
            q.put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
