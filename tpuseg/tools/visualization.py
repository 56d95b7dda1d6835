"""Visualization sinks: loss curves, predicted-vs-GT mask bitmaps.

Capability parity with `/root/reference/model/visualization.py:9-61`
(plot_result, save_images2d, save_images3d, save_images2dregression) in
channels-last convention.  Grad-CAM lives in tpuseg.tools.gradcam.
"""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import cv2  # noqa: E402


def plot_result(
    model_dir: str, v1, v2, name1: str, name2: str, title: str
) -> None:
    """`visualization.py:9`: paired train/val curve PNG."""
    plt.style.use("ggplot")
    fig = plt.figure()
    plt.plot(np.asarray(v1, dtype=float), label=name1)
    plt.plot(np.asarray(v2, dtype=float), label=name2)
    plt.title("Training " + title + " on Dataset")
    plt.xlabel("Epoch #")
    plt.ylabel(title)
    plt.legend(loc="lower left")
    fig.savefig(os.path.join(model_dir, title + ".png"))
    plt.close(fig)


def _to_mask2d(pred: np.ndarray, num_classes_hint: int = 0) -> np.ndarray:
    """(H,W) label map from channels-last probs (H,W,C) or (H,W)."""
    pred = np.asarray(pred)
    if pred.ndim == 3:
        if pred.shape[-1] == 1:
            return (pred[..., 0] > 0.5).astype(np.uint8)
        return np.argmax(pred, axis=-1).astype(np.uint8)
    return pred.astype(np.uint8)


def save_images2d(pred, gt, save_path: str, pixelvalue: float = 255.0) -> None:
    """`visualization.py:42`: side-by-side pred|GT bitmap."""
    p = _to_mask2d(pred).astype(np.float32) * pixelvalue
    g = np.asarray(gt).astype(np.float32) * pixelvalue
    if g.ndim == 3:
        g = g[..., 0]
    canvas = np.concatenate([p, np.full((p.shape[0], 4), 128.0), g], axis=1)
    cv2.imwrite(save_path + ".bmp", np.clip(canvas, 0, 255).astype(np.uint8))


def save_images3d(
    pred, gt, showwind: Sequence[int], save_path: str, pixelvalue: float = 255.0
) -> None:
    """`visualization.py:22`: mosaic of all depth slices, pred and GT."""
    p = np.asarray(pred)
    if p.ndim == 4:  # (D,H,W,C)
        p = _to_mask3d(p)
    g = np.asarray(gt)
    if g.ndim == 4:
        g = g[..., 0]
    rows, cols = showwind
    d, h, w = p.shape

    def mosaic(vol):
        canvas = np.zeros((rows * h, cols * w), np.float32)
        for idx in range(min(d, rows * cols)):
            r, c = divmod(idx, cols)
            canvas[r * h:(r + 1) * h, c * w:(c + 1) * w] = vol[idx]
        return canvas

    cv2.imwrite(
        save_path + "predict.bmp",
        np.clip(mosaic(p.astype(np.float32)) * pixelvalue, 0, 255).astype(np.uint8),
    )
    cv2.imwrite(
        save_path + "mask.bmp",
        np.clip(mosaic(g.astype(np.float32)) * pixelvalue, 0, 255).astype(np.uint8),
    )


def _to_mask3d(pred: np.ndarray) -> np.ndarray:
    if pred.shape[-1] == 1:
        return (pred[..., 0] > 0.5).astype(np.uint8)
    return np.argmax(pred, axis=-1).astype(np.uint8)


def save_images2dregression(
    x, pred, gt, save_path: str, pixelvalue: float = 255.0
) -> None:
    """`visualization.py:52`: input|pred|GT triplet for image-to-image."""
    arrs = []
    for a in (x, pred, gt):
        a = np.asarray(a, np.float32)
        if a.ndim == 3:
            a = a[..., 0]
        a = a - a.min()
        if a.max() > 0:
            a = a / a.max()
        arrs.append(a * pixelvalue)
    sep = np.full((arrs[0].shape[0], 4), 128.0)
    canvas = np.concatenate([arrs[0], sep, arrs[1], sep, arrs[2]], axis=1)
    cv2.imwrite(save_path + ".bmp", np.clip(canvas, 0, 255).astype(np.uint8))


def make_seg_viz(num_classes: int, ndim: int, showwind=(8, 8)):
    """Trainer viz_fn: dump first-sample pred-vs-GT each validation epoch,
    mirroring `modelUnet.py:884,:914`."""
    pixelvalue = 255.0 if num_classes <= 1 else 255.0 // max(num_classes - 1, 1)

    def viz(model_dir, epoch, outputs, batch):
        probs = np.asarray(outputs["probs"])[0]
        gt = np.asarray(batch["label"])[0]
        path = os.path.join(model_dir, f"{epoch + 1}_Val_EPOCH_")
        if ndim == 2:
            save_images2d(probs, gt, path, pixelvalue=pixelvalue)
        else:
            save_images3d(probs, gt, showwind, path, pixelvalue=pixelvalue)

    return viz
