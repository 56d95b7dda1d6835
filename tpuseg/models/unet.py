"""U-Net family: UNet2d / UNet3d / UNet3dthin.

Capability parity with `/root/reference/networks/Unet2d.py`, `Unet3d.py`,
`Unet3dthin.py`: 4-level encoder (init_features=16, ×2 per level),
bottleneck at 16×features, transpose-conv + skip-concat decoder (or, for
the thin variant, linear-upsample + add fusion, `Unet3dthin.py:40-54`),
1×1 head returning (logits, probs).

One rank-generic flax module covers 2D and 3D; channels-last layout.
"""
from __future__ import annotations

from flax import linen as nn

from tpuseg.nn.layers import (
    ConvBlock,
    ConvTransposeND,
    OutputHead,
    max_pool_nd,
    upsample_nd,
)

import jax.numpy as jnp


class UNet(nn.Module):
    ndim: int
    num_classes: int
    features: int = 16
    dropout: float = 0.2
    levels: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = self.features
        skips = []
        for lvl in range(self.levels):
            x = ConvBlock(f * (2 ** lvl), self.ndim, self.dropout)(x, train=train)
            skips.append(x)
            x = max_pool_nd(x, self.ndim, 2)
        x = ConvBlock(f * (2 ** self.levels), self.ndim, self.dropout)(x, train=train)
        for lvl in reversed(range(self.levels)):
            ch = f * (2 ** lvl)
            x = ConvTransposeND(ch, self.ndim, 2, 2)(x)
            x = jnp.concatenate([x, skips[lvl]], axis=-1)
            x = ConvBlock(ch, self.ndim, self.dropout)(x, train=train)
        return OutputHead(self.num_classes, self.ndim)(x)


class UNetThin(nn.Module):
    """Decoder without skip-concat: block → linear upsample → add skip
    (`Unet3dthin.py:40-54`) — halves decoder activations; good for large
    volumes."""

    ndim: int
    num_classes: int
    features: int = 16
    dropout: float = 0.2
    levels: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = self.features
        skips = []
        for lvl in range(self.levels):
            x = ConvBlock(f * (2 ** lvl), self.ndim, self.dropout)(x, train=train)
            skips.append(x)
            x = max_pool_nd(x, self.ndim, 2)
        x = ConvBlock(f * (2 ** self.levels), self.ndim, self.dropout)(x, train=train)
        for lvl in reversed(range(self.levels)):
            ch = f * (2 ** lvl)
            x = ConvBlock(ch, self.ndim, self.dropout)(x, train=train)
            x = upsample_nd(x, self.ndim, 2, "linear")
            x = x + skips[lvl]
        return OutputHead(self.num_classes, self.ndim)(x)


def UNet2d(num_classes: int, features: int = 16, dropout: float = 0.2) -> UNet:
    return UNet(ndim=2, num_classes=num_classes, features=features, dropout=dropout)


def UNet3d(num_classes: int, features: int = 16, dropout: float = 0.2) -> UNet:
    return UNet(ndim=3, num_classes=num_classes, features=features, dropout=dropout)


def UNet3dThin(num_classes: int, features: int = 16, dropout: float = 0.2) -> UNetThin:
    return UNetThin(ndim=3, num_classes=num_classes, features=features, dropout=dropout)
