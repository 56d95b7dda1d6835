"""Device-side resampling: bilinear/trilinear grid-sample and affine resize.

The TPU-native replacement for three reference native-code paths
(SURVEY.md §2.2):
 * voxelmorph's SpatialTransformer warp
   (`/root/reference/networks/VNet3dregistration.py:171-172`),
 * torchvision deform_conv2d's bilinear taps
   (`networks/AmlpUnet2d.py` ATMOp),
 * the ITK resample on the inference hot path (`modelUnet.py:978`) when
   the volume is already on device.

Everything is gather + fused multiply-add — XLA lowers it to efficient
dynamic-gathers; no host round-trip.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp


def _gather_nd(vol, idx_list):
    """vol (*spatial, C), idx_list = [z,y,x] int arrays of identical shape."""
    return vol[tuple(idx_list)]


def grid_sample_3d(vol, coords, mode: str = "linear"):
    """Sample `vol` (D,H,W,C) at continuous voxel coordinates
    `coords` (..., 3) ordered (z,y,x).  Border-clamped (align with ITK /
    voxelmorph 'border' padding)."""
    D, H, W = vol.shape[:3]
    z, y, x = coords[..., 0], coords[..., 1], coords[..., 2]
    if mode == "nearest":
        zi = jnp.clip(jnp.round(z).astype(jnp.int32), 0, D - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1)
        return _gather_nd(vol, [zi, yi, xi])

    z = jnp.clip(z, 0.0, D - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x = jnp.clip(x, 0.0, W - 1.0)
    z0 = jnp.floor(z).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    z1 = jnp.minimum(z0 + 1, D - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fz = (z - z0)[..., None]
    fy = (y - y0)[..., None]
    fx = (x - x0)[..., None]

    c000 = _gather_nd(vol, [z0, y0, x0])
    c001 = _gather_nd(vol, [z0, y0, x1])
    c010 = _gather_nd(vol, [z0, y1, x0])
    c011 = _gather_nd(vol, [z0, y1, x1])
    c100 = _gather_nd(vol, [z1, y0, x0])
    c101 = _gather_nd(vol, [z1, y0, x1])
    c110 = _gather_nd(vol, [z1, y1, x0])
    c111 = _gather_nd(vol, [z1, y1, x1])

    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def grid_sample_2d(img, coords, mode: str = "linear"):
    """Sample `img` (H,W,C) at continuous pixel coordinates
    `coords` (..., 2) ordered (y,x), border-clamped."""
    H, W = img.shape[:2]
    y, x = coords[..., 0], coords[..., 1]
    if mode == "nearest":
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1)
        return img[yi, xi]
    y = jnp.clip(y, 0.0, H - 1.0)
    x = jnp.clip(x, 0.0, W - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = (y - y0)[..., None]
    fx = (x - x0)[..., None]
    c00 = img[y0, x0]
    c01 = img[y0, x1]
    c10 = img[y1, x0]
    c11 = img[y1, x1]
    c0 = c00 * (1 - fx) + c01 * fx
    c1 = c10 * (1 - fx) + c11 * fx
    return c0 * (1 - fy) + c1 * fy


def warp_3d(vol, flow, mode: str = "linear"):
    """Dense-displacement warp of (N,D,H,W,C) by flow (N,D,H,W,3) in voxel
    units (z,y,x) — the voxelmorph SpatialTransformer equivalent."""
    D, H, W = vol.shape[1:4]
    base = jnp.stack(
        jnp.meshgrid(
            jnp.arange(D, dtype=flow.dtype),
            jnp.arange(H, dtype=flow.dtype),
            jnp.arange(W, dtype=flow.dtype),
            indexing="ij",
        ),
        axis=-1,
    )
    coords = base[None] + flow
    return jax.vmap(lambda v, c: grid_sample_3d(v, c, mode))(vol, coords)


@partial(jax.jit, static_argnames=("out_dhw", "mode"))
def resize_volume_device(vol, out_dhw: Sequence[int], mode: str = "linear"):
    """ITK-semantics fixed-size resize on device: input continuous index =
    output index * (in_size/out_size) per axis, border-clamped — matches
    tpuseg.data.geometry.resample_to_size bit-for-bit on the grid."""
    D, H, W = vol.shape[:3]
    od, oh, ow = out_dhw
    fz, fy, fx = D / od, H / oh, W / ow
    coords = jnp.stack(
        jnp.meshgrid(
            jnp.arange(od, dtype=jnp.float32) * fz,
            jnp.arange(oh, dtype=jnp.float32) * fy,
            jnp.arange(ow, dtype=jnp.float32) * fx,
            indexing="ij",
        ),
        axis=-1,
    )
    squeeze = vol.ndim == 3
    v = vol[..., None] if squeeze else vol
    out = grid_sample_3d(v, coords, mode)
    return out[..., 0] if squeeze else out
