"""Host datasets + the batched, prefetching loader.

Capability parity with `/root/reference/model/dataset.py` (4 map-style
dataset classes) — re-designed for TPU feeding:

 * channels-LAST samples (N, *spatial, C);
 * deterministic per-epoch shuffling from a seed (the reference shuffles
   via torch DataLoader; note its *validation* loader is also shuffled,
   `modelUnet.py:106` — we default validation to unshuffled);
 * a background-thread prefetcher that overlaps host decode with device
   compute (the reference runs `num_workers=0`, fully serial,
   `dataset.py` + `modelUnet.py:64`);
 * static batch shapes (drop_last or pad) so the jitted train step never
   recompiles.

Intentional divergence (SURVEY.md §7.4): the reference resizes 2D *masks*
with bilinear interpolation (`dataset.py:154`), silently corrupting
multiclass labels; here masks use nearest-neighbour.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

from tpuseg.data.normalize import zscore


class SegDataset2D:
    """`dataset.py:119` datasetModelSegwithopencv: png/bmp image+mask pairs,
    resized to target, per-image z-score."""

    def __init__(self, images, labels, target_hw=(512, 512), binary: bool = False):
        self.images = list(images)
        self.labels = list(labels)
        self.target_hw = tuple(target_hw)
        self.binary = binary

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        import cv2

        img = cv2.imread(self.images[i], 0)
        if img is None:
            raise FileNotFoundError(self.images[i])
        h, w = self.target_hw
        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
        img = zscore(img)[..., None]  # (H,W,1)
        lab = cv2.imread(self.labels[i], 0)
        lab = cv2.resize(lab, (w, h), interpolation=cv2.INTER_NEAREST)
        lab = lab.astype(np.int32)
        if self.binary:
            lab = (lab != 0).astype(np.float32)[..., None]
        return {"image": img.astype(np.float32), "label": lab}


class SegDataset3D:
    """`dataset.py:82` datasetModelSegwithnpy: pre-normalized .npy volume
    pairs (D,H,W) from the offline prep pipeline."""

    def __init__(self, images, labels, target_dhw=None, binary: bool = False):
        self.images = list(images)
        self.labels = list(labels)
        self.target_dhw = tuple(target_dhw) if target_dhw else None
        self.binary = binary

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        img = np.load(self.images[i]).astype(np.float32)
        lab = np.load(self.labels[i])
        if self.target_dhw:
            assert img.shape[:3] == self.target_dhw, (img.shape, self.target_dhw)
        img = img.reshape(img.shape[:3] + (1,))
        lab = lab.reshape(lab.shape[:3]).astype(np.int32)
        if self.binary:
            lab = (lab != 0).astype(np.float32)[..., None]
        return {"image": img, "label": lab}


class ClassifyDataset2D:
    """`dataset.py:42` datasetModelClassifywithopencv."""

    def __init__(self, images, labels, target_hw=(64, 64), channels: int = 1):
        self.images = list(images)
        self.labels = list(labels)
        self.target_hw = tuple(target_hw)
        self.channels = channels

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        import cv2

        img = cv2.imread(self.images[i], 0 if self.channels == 1 else 1)
        h, w = self.target_hw
        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
        img = zscore(img)
        if img.ndim == 2:
            img = img[..., None]
        return {
            "image": img.astype(np.float32),
            "label": np.int32(self.labels[i]),
        }


class ClassifyDataset3D:
    """`dataset.py:8` datasetModelClassifywithnpy."""

    def __init__(self, images, labels):
        self.images = list(images)
        self.labels = list(labels)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        img = np.load(self.images[i]).astype(np.float32)
        img = img.reshape(img.shape[:3] + (1,))
        return {"image": img, "label": np.int32(self.labels[i])}


class RegressionDataset2D:
    """`dataset.py:162` datasetModelRegressionwithopencv: paired
    input/target images, z-scored, returning per-image mean/std for
    de-normalized PSNR/SSIM."""

    def __init__(self, images, targets, target_hw=(512, 512)):
        self.images = list(images)
        self.targets = list(targets)
        self.target_hw = tuple(target_hw)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        import cv2

        h, w = self.target_hw
        img = cv2.resize(cv2.imread(self.images[i], 0), (w, h)).astype(np.float32)
        tgt = cv2.resize(cv2.imread(self.targets[i], 0), (w, h)).astype(np.float32)
        istd = img.std() or 1.0
        tstd = tgt.std() or 1.0
        return {
            "image": ((img - img.mean()) / istd)[..., None],
            "target": ((tgt - tgt.mean()) / tstd)[..., None],
            "mean": np.float32(tgt.mean()),
            "std": np.float32(tstd),
        }


class ArrayDataset:
    """In-memory dataset of pre-built samples (used by tests/examples)."""

    def __init__(self, samples):
        self.samples = list(samples)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def _collate(samples):
    out = {}
    for k in samples[0]:
        out[k] = np.stack([np.asarray(s[k]) for s in samples])
    return out


class DataLoader:
    """Deterministic shuffling + static-shape batching + thread prefetch.

    ``host_shard``: (index, count) for multi-host training — each host
    iterates a disjoint stride of the manifest (the TPU-pod analog of the
    reference's single-host CSV read, SURVEY.md §5 'distributed backend').
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        host_shard: Optional[tuple] = None,
        transform: Optional[Callable] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0
        self.host_shard = host_shard or (0, 1)
        self.transform = transform

    def __len__(self):
        idx, cnt = self.host_shard
        n = len(range(idx, len(self.dataset), cnt))
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        idx, cnt = self.host_shard
        return order[idx::cnt]

    def __iter__(self) -> Iterator[dict]:
        order = self._indices()
        self.epoch += 1
        batches = []
        for start in range(0, len(order), self.batch_size):
            chunk = order[start:start + self.batch_size]
            if len(chunk) < self.batch_size:
                if self.drop_last or len(chunk) == 0:
                    continue
                # pad to static shape by repeating (keeps jit shapes stable)
                pad = np.resize(chunk, self.batch_size)
                chunk = pad
            batches.append(chunk)

        if self.prefetch <= 0:
            for chunk in batches:
                yield self._make_batch(chunk)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        cancel = threading.Event()

        def producer():
            try:
                for chunk in batches:
                    if cancel.is_set():
                        break
                    q.put(self._make_batch(chunk))
                q.put(stop)
            except BaseException as e:  # surfaced in the consumer below
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # early consumer exit: unblock a producer stuck on q.put and
            # drain until it terminates, so the thread never leaks
            cancel.set()
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    t.join(timeout=0.05)
            t.join()

    def _make_batch(self, chunk):
        batch = _collate([self.dataset[int(i)] for i in chunk])
        if self.transform is not None:
            batch = self.transform(batch)
        return batch


def read_manifest_csv(path: str):
    """`train.py:15-32` CSV manifest (Image,Mask columns) reader."""
    import pandas as pd

    df = pd.read_csv(path)
    cols = list(df.columns)
    return df[cols[0]].tolist(), df[cols[1]].tolist()
