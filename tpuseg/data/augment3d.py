"""3D augmentation: random affine (rotation/shift/zoom/flip) on image+mask.

Capability parity with the reference's offline Keras-style generator
(`/root/reference/dataprocess/Augmentation/images_masks_3dtransform.py`:
ImageDataGenerator3D — per-axis random rotations, shifts, zooms composed
into ONE 4×4 affine, channel shift, 3-axis flips, identical transform for
image & mask) and its facade (`ImageAugmentation.py` DataAug3D — N
augmented .npy copies per case).

TPU-native re-design: the affine is applied ON DEVICE as a single fused
grid-sample gather (tpuseg.kernels.resample.grid_sample_3d) under jit and
vmap over the batch — so augmentation can run online per-batch at
training time instead of (or in addition to) the reference's offline
pre-materialization.  scipy's host affine (order-0) is what the reference
uses; we default to linear for the image and nearest for the mask.
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.kernels.resample import grid_sample_3d


@dataclasses.dataclass
class Affine3DConfig:
    rotation_deg: Tuple[float, float, float] = (10.0, 10.0, 10.0)
    shift_frac: Tuple[float, float, float] = (0.01, 0.01, 0.01)
    zoom_range: Tuple[float, float] = (0.9, 1.1)
    flip_axes: Tuple[bool, bool, bool] = (True, True, True)
    channel_shift: float = 0.0


def _rot_matrices(angles):
    az, ay, ax = angles  # rotations about z, y, x
    cz, sz = jnp.cos(az), jnp.sin(az)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    rz = jnp.array([[1, 0, 0], [0, cz, -sz], [0, sz, cz]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rx = jnp.array([[cx, -sx, 0], [sx, cx, 0], [0, 0, 1]])
    return rz @ ry @ rx


def random_affine_params(key, cfg: Affine3DConfig):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    rot = (
        jax.random.uniform(k1, (3,), minval=-1.0, maxval=1.0)
        * jnp.deg2rad(jnp.asarray(cfg.rotation_deg))
    )
    shift = jax.random.uniform(k2, (3,), minval=-1.0, maxval=1.0) * jnp.asarray(
        cfg.shift_frac
    )
    zoom = jax.random.uniform(
        k3, (3,), minval=cfg.zoom_range[0], maxval=cfg.zoom_range[1]
    )
    flips = jnp.where(
        jnp.asarray(cfg.flip_axes),
        jax.random.bernoulli(k4, 0.5, (3,)),
        False,
    )
    cshift = jax.random.uniform(k5, (), minval=-1.0, maxval=1.0) * cfg.channel_shift
    return rot, shift, zoom, flips, cshift


def _coords_for(shape_dhw, rot, shift, zoom, flips):
    """Output-voxel → input-voxel coordinate map, centered affine."""
    D, H, W = shape_dhw
    dims = jnp.asarray([D, H, W], jnp.float32)
    center = (dims - 1) / 2.0
    grid = jnp.stack(
        jnp.meshgrid(
            jnp.arange(D, dtype=jnp.float32),
            jnp.arange(H, dtype=jnp.float32),
            jnp.arange(W, dtype=jnp.float32),
            indexing="ij",
        ),
        axis=-1,
    )  # (D,H,W,3)
    R = _rot_matrices(rot)
    # inverse map: in = R^-1 @ ((out - c)/zoom) + c - shift*dims
    rel = (grid - center) / zoom
    mapped = jnp.einsum("ij,dhwj->dhwi", jnp.linalg.inv(R), rel)
    coords = mapped + center - shift * dims
    # flips: mirror the coordinate
    coords = jnp.where(flips, dims - 1 - coords, coords)
    return coords


@partial(jax.jit, static_argnames=("linear_image",))
def _apply(image, mask, rot, shift, zoom, flips, cshift, linear_image=True):
    coords = _coords_for(image.shape[:3], rot, shift, zoom, flips)
    img = grid_sample_3d(image, coords, "linear" if linear_image else "nearest")
    img = img + cshift
    msk = grid_sample_3d(mask, coords, "nearest")
    return img, msk


def augment_volume(key, image, mask, cfg: Affine3DConfig = Affine3DConfig()):
    """One random affine applied identically to (D,H,W,C) image & mask."""
    image = jnp.asarray(image, jnp.float32)
    mask = jnp.asarray(mask)
    squeeze_i = image.ndim == 3
    squeeze_m = mask.ndim == 3
    if squeeze_i:
        image = image[..., None]
    if squeeze_m:
        mask = mask[..., None]
    rot, shift, zoom, flips, cshift = random_affine_params(key, cfg)
    img, msk = _apply(image, mask.astype(jnp.float32), rot, shift, zoom, flips, cshift)
    msk = msk.astype(mask.dtype)
    return (img[..., 0] if squeeze_i else img), (msk[..., 0] if squeeze_m else msk)


def make_batch_augmenter(cfg: Affine3DConfig = Affine3DConfig(), seed: int = 0):
    """Online DataLoader transform: independent random affine per sample,
    fused on device (the reference has no online augmentation at all)."""
    counter = {"n": seed}

    @jax.jit
    def run(key, images, masks):
        keys = jax.random.split(key, images.shape[0])

        def one(k, img, msk):
            rot, shift, zoom, flips, cshift = random_affine_params(k, cfg)
            return _apply(img, msk, rot, shift, zoom, flips, cshift)

        return jax.vmap(one)(keys, images, masks)

    def transform(batch):
        counter["n"] += 1
        key = jax.random.key(counter["n"])
        images = jnp.asarray(batch["image"], jnp.float32)
        masks = batch["label"]
        m3 = jnp.asarray(masks, jnp.float32)
        squeeze = m3.ndim == 4
        if squeeze:
            m3 = m3[..., None]
        img, msk = run(key, images, m3)
        out = dict(batch)
        out["image"] = np.asarray(img)
        m = np.asarray(msk)
        if squeeze:
            m = m[..., 0]
        out["label"] = m.astype(np.asarray(batch["label"]).dtype)
        return out

    return transform


class DataAug3D:
    """Offline facade (`ImageAugmentation.py:26` DataAug3D): read CSV of
    image/mask .npy pairs, write `aug_number` augmented copies per case
    plus an output manifest."""

    def __init__(
        self,
        rotation: float = 10.0,
        shift: float = 0.01,
        flips: bool = True,
        aug_number: int = 10,
        zoom_range=(0.9, 1.1),
        seed: int = 0,
    ):
        self.cfg = Affine3DConfig(
            rotation_deg=(rotation,) * 3,
            shift_frac=(shift,) * 3,
            zoom_range=tuple(zoom_range),
            flip_axes=(flips,) * 3,
        )
        self.aug_number = aug_number
        self.seed = seed

    def run(self, csv_path: str, out_dir: str) -> str:
        import pandas as pd

        df = pd.read_csv(csv_path)
        cols = list(df.columns)
        os.makedirs(out_dir, exist_ok=True)
        rows = []
        key = jax.random.key(self.seed)
        for i, (ip, mp) in enumerate(zip(df[cols[0]], df[cols[1]])):
            img = np.load(ip)
            msk = np.load(mp)
            stem = os.path.splitext(os.path.basename(ip))[0]
            for j in range(self.aug_number):
                key, sub = jax.random.split(key)
                a_img, a_msk = augment_volume(sub, img, msk, self.cfg)
                ipath = os.path.join(out_dir, f"{stem}_aug{j}_img.npy")
                mpath = os.path.join(out_dir, f"{stem}_aug{j}_msk.npy")
                np.save(ipath, np.asarray(a_img, np.float32))
                np.save(mpath, np.asarray(a_msk))
                rows.append((ipath, mpath))
        out_csv = os.path.join(out_dir, "trainaugdata.csv")
        pd.DataFrame(rows, columns=["Image", "Mask"]).to_csv(out_csv, index=False)
        return out_csv
