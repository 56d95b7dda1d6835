"""2D segmentation augmentation (albumentations-equivalent).

Capability parity with `/root/reference/dataprocess/AugData.py`
(Segmenation_Aug): horizontal/vertical flips, a blur trio
(box/gaussian/median), ShiftScaleRotate, and random brightness/contrast —
applied identically to image & mask (nearest for masks), with an offline
driver writing N augmented bmp pairs + manifest.
"""
from __future__ import annotations

import os
from typing import Optional

import cv2
import numpy as np


class SegmentationAug2D:
    def __init__(
        self,
        p_flip: float = 0.5,
        p_blur: float = 0.3,
        p_ssr: float = 0.7,
        p_brightness: float = 0.5,
        shift_limit: float = 0.0625,
        scale_limit: float = 0.1,
        rotate_limit: float = 45.0,
        brightness_limit: float = 0.2,
        contrast_limit: float = 0.2,
        seed: int = 0,
    ):
        self.p_flip = p_flip
        self.p_blur = p_blur
        self.p_ssr = p_ssr
        self.p_brightness = p_brightness
        self.shift_limit = shift_limit
        self.scale_limit = scale_limit
        self.rotate_limit = rotate_limit
        self.brightness_limit = brightness_limit
        self.contrast_limit = contrast_limit
        self.rng = np.random.default_rng(seed)

    def __call__(self, image: np.ndarray, mask: np.ndarray):
        rng = self.rng
        img = image.copy()
        msk = mask.copy()
        if rng.random() < self.p_flip:
            img, msk = img[:, ::-1], msk[:, ::-1]
        if rng.random() < self.p_flip:
            img, msk = img[::-1], msk[::-1]
        if rng.random() < self.p_blur:
            kind = rng.integers(0, 3)
            k = int(rng.choice([3, 5]))
            if kind == 0:
                img = cv2.blur(img, (k, k))
            elif kind == 1:
                img = cv2.GaussianBlur(img, (k, k), 0)
            else:
                img = cv2.medianBlur(img.astype(np.uint8), k).astype(img.dtype)
        if rng.random() < self.p_ssr:
            h, w = img.shape[:2]
            angle = rng.uniform(-self.rotate_limit, self.rotate_limit)
            scale = 1.0 + rng.uniform(-self.scale_limit, self.scale_limit)
            tx = rng.uniform(-self.shift_limit, self.shift_limit) * w
            ty = rng.uniform(-self.shift_limit, self.shift_limit) * h
            M = cv2.getRotationMatrix2D((w / 2, h / 2), angle, scale)
            M[0, 2] += tx
            M[1, 2] += ty
            img = cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR,
                                 borderMode=cv2.BORDER_REFLECT_101)
            msk = cv2.warpAffine(msk, M, (w, h), flags=cv2.INTER_NEAREST,
                                 borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        if rng.random() < self.p_brightness:
            alpha = 1.0 + rng.uniform(-self.contrast_limit, self.contrast_limit)
            beta = rng.uniform(-self.brightness_limit, self.brightness_limit) * 255
            img = np.clip(img.astype(np.float32) * alpha + beta, 0, 255).astype(
                image.dtype
            )
        return np.ascontiguousarray(img), np.ascontiguousarray(msk)

    def run_offline(self, csv_path: str, out_dir: str, aug_number: int = 5) -> str:
        """`AugData.py:6`: write N augmented bmp pairs per case + manifest."""
        import pandas as pd

        df = pd.read_csv(csv_path)
        cols = list(df.columns)
        os.makedirs(out_dir, exist_ok=True)
        rows = []
        for ip, mp in zip(df[cols[0]], df[cols[1]]):
            img = cv2.imread(ip, 0)
            msk = cv2.imread(mp, 0)
            stem = os.path.splitext(os.path.basename(ip))[0]
            for j in range(aug_number):
                a_img, a_msk = self(img, msk)
                ipath = os.path.join(out_dir, f"{stem}_aug{j}.bmp")
                mpath = os.path.join(out_dir, f"{stem}_aug{j}_mask.bmp")
                cv2.imwrite(ipath, a_img)
                cv2.imwrite(mpath, a_msk)
                rows.append((ipath, mpath))
        out_csv = os.path.join(out_dir, "trainaugdata2d.csv")
        pd.DataFrame(rows, columns=["Image", "Mask"]).to_csv(out_csv, index=False)
        return out_csv
