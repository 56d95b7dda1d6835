"""3D Swin-transformer building blocks: windowed attention with relative
position bias, shifted windows with region masking, patch merging.

Capability parity with the Swin stage embedded in
`/root/reference/networks/VSNet.py:138-628` (WindowAttention `:138`,
PatchMerging `:247-323`, SwinTransformerBlock `:366`, SwinLayer `:532`) —
re-implemented for channels-last (N,D,H,W,C) tensors with static shapes:
window partitioning is pure reshape/transpose, the shifted-window mask is
computed once per (spatial, window, shift) configuration at trace time.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@lru_cache(maxsize=None)
def _relative_position_index(window: Tuple[int, int, int]) -> np.ndarray:
    """(W³, W³) index into the (2wd-1)(2wh-1)(2ww-1) bias table."""
    wd, wh, ww = window
    coords = np.stack(
        np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (3, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[..., 0] += wd - 1
    rel[..., 1] += wh - 1
    rel[..., 2] += ww - 1
    rel[..., 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[..., 1] *= 2 * ww - 1
    return rel.sum(-1)


@lru_cache(maxsize=None)
def _shift_attn_mask(
    spatial: Tuple[int, int, int], window: Tuple[int, int, int],
    shift: Tuple[int, int, int],
) -> np.ndarray:
    """(num_windows, W³, W³) additive mask for shifted-window attention."""
    d, h, w = spatial
    img = np.zeros((d, h, w), np.int32)
    cnt = 0
    for ds_ in (slice(0, -window[0]), slice(-window[0], -shift[0]), slice(-shift[0], None)):
        for hs in (slice(0, -window[1]), slice(-window[1], -shift[1]), slice(-shift[1], None)):
            for ws in (slice(0, -window[2]), slice(-window[2], -shift[2]), slice(-shift[2], None)):
                img[ds_, hs, ws] = cnt
                cnt += 1
    img = np.roll(img, (-shift[0], -shift[1], -shift[2]), axis=(0, 1, 2))
    # partition into windows
    wd, wh, ww = window
    win = img.reshape(d // wd, wd, h // wh, wh, w // ww, ww)
    win = win.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wd * wh * ww)
    diff = win[:, :, None] != win[:, None, :]
    return np.where(diff, -1e9, 0.0).astype(np.float32)


def window_partition(x, window):
    n, d, h, w, c = x.shape
    wd, wh, ww = window
    x = x.reshape(n, d // wd, wd, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wd * wh * ww, c)  # (n*num_windows, W³, C)


def window_reverse(windows, window, spatial, batch):
    d, h, w = spatial
    wd, wh, ww = window
    c = windows.shape[-1]
    x = windows.reshape(batch, d // wd, h // wh, w // ww, wd, wh, ww, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(batch, d, h, w, c)


class WindowAttention3D(nn.Module):
    dim: int
    num_heads: int
    window: Tuple[int, int, int]

    @nn.compact
    def __call__(self, x_windows, mask: Optional[jnp.ndarray]):
        """x_windows: (B·nW, N, C); mask: (nW, N, N) or None."""
        bnw, n, c = x_windows.shape
        heads = self.num_heads
        qkv = nn.Dense(3 * c, use_bias=True)(x_windows)
        qkv = qkv.reshape(bnw, n, 3, heads, c // heads).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = (c // heads) ** -0.5
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale

        wd, wh, ww = self.window
        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), heads),
        )
        idx = jnp.asarray(_relative_position_index(self.window))
        bias = table[idx.reshape(-1)].reshape(n, n, heads).transpose(2, 0, 1)
        attn = attn + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, heads, n, n) + mask[None, :, None]
            attn = attn.reshape(bnw, heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bnw, n, c)
        return nn.Dense(c)(out)


class SwinBlock3D(nn.Module):
    dim: int
    num_heads: int
    window: Tuple[int, int, int] = (7, 7, 7)
    shifted: bool = False
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        n, d, h, w, c = x.shape
        window = tuple(min(ws, s) for ws, s in zip(self.window, (d, h, w)))
        shift = tuple(ws // 2 for ws in window) if self.shifted else (0, 0, 0)
        # pad spatial dims to multiples of the window
        pads = [(0, (-s) % ws) for s, ws in zip((d, h, w), window)]
        xp = jnp.pad(x, [(0, 0)] + pads + [(0, 0)])
        dp, hp, wp = xp.shape[1:4]

        shortcut = x
        xn = nn.LayerNorm()(xp)
        if any(shift):
            xn = jnp.roll(xn, (-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
            mask = jnp.asarray(_shift_attn_mask((dp, hp, wp), window, shift))
        else:
            mask = None
        windows = window_partition(xn, window)
        attn = WindowAttention3D(self.dim, self.num_heads, window)(windows, mask)
        xn = window_reverse(attn, window, (dp, hp, wp), n)
        if any(shift):
            xn = jnp.roll(xn, shift, axis=(1, 2, 3))
        xn = xn[:, :d, :h, :w]
        x = shortcut + xn
        # MLP
        hmlp = nn.LayerNorm()(x)
        hmlp = nn.Dense(int(c * self.mlp_ratio))(hmlp)
        hmlp = nn.gelu(hmlp)
        hmlp = nn.Dense(c)(hmlp)
        return x + hmlp


class PatchMerging3D(nn.Module):
    """Concat 2×2×2 neighbours → LayerNorm → Dense(2·dim)
    (`VSNet.py:247-323`)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        n, d, h, w, c = x.shape
        pads = [(0, d % 2), (0, h % 2), (0, w % 2)]
        x = jnp.pad(x, [(0, 0)] + pads + [(0, 0)])
        parts = [
            x[:, i::2, j::2, k::2]
            for i in (0, 1) for j in (0, 1) for k in (0, 1)
        ]
        x = jnp.concatenate(parts, axis=-1)
        x = nn.LayerNorm()(x)
        return nn.Dense(2 * self.dim)(x)


class SwinStage3D(nn.Module):
    """`VSNet.py:532` SwinLayer: depth blocks (alternating shift) + merge."""

    dim: int
    num_heads: int = 3
    depth: int = 2
    window: Tuple[int, int, int] = (7, 7, 7)
    downsample: bool = True

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = SwinBlock3D(
                self.dim, self.num_heads, self.window, shifted=bool(i % 2)
            )(x)
        if self.downsample:
            x = PatchMerging3D(self.dim)(x)
        return x
