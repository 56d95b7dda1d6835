"""V-Net family: VNet2d / VNet3d.

Capability parity with `/root/reference/networks/VNet2d.py:103-160` and
`VNet3d.py:102-158`: InputTransition stem, four DownTransitions with conv
depth profile [2,3,3,3], four UpTransitions with depth [3,3,2,1], 1×1
OutputHead.  The reference's `self.feature` construction typo
(`VNet3d.py:127`) is intentionally not reproduced.
"""
from __future__ import annotations

from flax import linen as nn

from tpuseg.nn.layers import (
    DownTransition,
    InputTransition,
    OutputHead,
    UpTransition,
)


class VNet(nn.Module):
    ndim: int
    num_classes: int
    features: int = 16
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = self.features
        out16 = InputTransition(f, self.ndim, self.dropout)(x, train=train)
        out32 = DownTransition(f * 2, self.ndim, 2, self.dropout)(out16, train=train)
        out64 = DownTransition(f * 4, self.ndim, 3, self.dropout)(out32, train=train)
        out128 = DownTransition(f * 8, self.ndim, 3, self.dropout)(out64, train=train)
        out256 = DownTransition(f * 16, self.ndim, 3, self.dropout)(out128, train=train)
        up = UpTransition(f * 8, self.ndim, 3, self.dropout)(out256, out128, train=train)
        up = UpTransition(f * 4, self.ndim, 3, self.dropout)(up, out64, train=train)
        up = UpTransition(f * 2, self.ndim, 2, self.dropout)(up, out32, train=train)
        up = UpTransition(f, self.ndim, 1, self.dropout)(up, out16, train=train)
        return OutputHead(self.num_classes, self.ndim)(up)


def VNet2d(num_classes: int, features: int = 16, dropout: float = 0.2) -> VNet:
    return VNet(ndim=2, num_classes=num_classes, features=features, dropout=dropout)


def VNet3d(num_classes: int, features: int = 16, dropout: float = 0.2) -> VNet:
    return VNet(ndim=3, num_classes=num_classes, features=features, dropout=dropout)
