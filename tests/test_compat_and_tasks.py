"""Tests for the reference-compatible Model API and task trainers:
2-epoch convergence-direction runs on synthetic data (SURVEY.md §4.3)."""
import os
import tempfile

import numpy as np
import pytest

from tpuseg.compat import (
    BinaryUNet2dModel,
    BinaryResNet2dModel,
    MutilUNet3dModel,
)


def _write_blob_pngs(n, size, directory, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    imgs, masks = [], []
    for i in range(n):
        cy, cx = rng.uniform(8, size - 8, 2)
        r = rng.uniform(4, 8)
        yy, xx = np.mgrid[0:size, 0:size]
        mask = ((yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2).astype(np.uint8)
        img = (mask * 150 + rng.normal(50, 20, (size, size))).clip(0, 255).astype(np.uint8)
        ip = os.path.join(directory, f"img{i}.png")
        mp = os.path.join(directory, f"mask{i}.png")
        cv2.imwrite(ip, img)
        cv2.imwrite(mp, mask * 255)
        imgs.append(ip)
        masks.append(mp)
    return imgs, masks


def test_binary_unet2d_model_full_api():
    d = tempfile.mkdtemp()
    imgs, masks = _write_blob_pngs(16, 32, d)
    model = BinaryUNet2dModel(
        32, 32, 1, 1, batch_size=4, loss_name="BinaryCrossEntropyDiceLoss",
        features=8,
    )
    h = model.trainprocess(imgs[:12], masks[:12], imgs[12:], masks[12:],
                           os.path.join(d, "run"), epochs=3, lr=1e-3)
    assert h["valdation_accuracy"][-1] > h["valdation_accuracy"][0] - 0.05
    # predict: channel-first in, uint8 out
    import cv2

    img = cv2.imread(imgs[0], 0).astype(np.float32)
    img = (img - img.mean()) / (img.std() or 1)
    out = model.predict(img[None])
    assert out.shape == (32, 32)
    assert out.dtype == np.uint8
    # inference: arbitrary-size image round-trips
    big = np.zeros((48, 40), np.float32)
    mask = model.inference(big)
    assert mask.shape == (48, 40)
    # curves dumped
    assert os.path.isfile(os.path.join(d, "run", "loss.png"))
    model.clear_GPU_cache()


def test_mutil_unet3d_model_trains_npy():
    d = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    imgs, masks = [], []
    for i in range(6):
        vol = rng.normal(size=(16, 16, 16)).astype(np.float32)
        lab = np.zeros((16, 16, 16), np.uint8)
        lab[4:12, 4:12, 4:12] = rng.integers(1, 3)
        vol[lab > 0] += 2.0
        ip, mp = os.path.join(d, f"v{i}.npy"), os.path.join(d, f"m{i}.npy")
        np.save(ip, vol)
        np.save(mp, lab)
        imgs.append(ip)
        masks.append(mp)
    model = MutilUNet3dModel(
        16, 16, 16, 1, 3, batch_size=2, loss_name="MutilDiceLoss", features=8,
    )
    h = model.trainprocess(imgs[:4], masks[:4], imgs[4:], masks[4:],
                           os.path.join(d, "run"), epochs=2, lr=1e-3,
                           showwind=[4, 4])
    assert len(h["train_loss"]) == 2
    out = model.predict(rng.normal(size=(1, 16, 16, 16)).astype(np.float32))
    assert out.shape == (16, 16, 16)
    assert out.max() <= 2


def test_resnet2d_classifier_trains():
    d = tempfile.mkdtemp()
    import cv2

    rng = np.random.default_rng(0)
    imgs, labels = [], []
    for i in range(24):
        cls = i % 2
        img = np.full((32, 32), 40 + 160 * cls, np.uint8)
        img = (img + rng.normal(0, 15, (32, 32))).clip(0, 255).astype(np.uint8)
        p = os.path.join(d, f"c{i}.png")
        cv2.imwrite(p, img)
        imgs.append(p)
        labels.append(cls)
    model = BinaryResNet2dModel(32, 32, 1, 1, batch_size=8)
    h = model.trainprocess(imgs[:16], labels[:16], imgs[16:], labels[16:],
                           os.path.join(d, "run"), epochs=3, lr=1e-3)
    assert len(h["train_loss"]) == 3
    label, prob = model.predict(np.full((1, 32, 32), 1.0, np.float32))
    assert label in (0, 1)
    assert 0.0 <= prob <= 1.0
