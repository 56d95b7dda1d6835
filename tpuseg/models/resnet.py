"""ResNet classifier family: ResNet2d / ResNet3d.

Capability parity with `/root/reference/networks/ResNet2d.py:74-119` and
`ResNet3d.py`: V-Net-style residual encoder (InputTransition + four
DownTransitions, channels 16→256, conv depth profile [2,3,3,3], no
dropout) → global average pooling → MLP 256→128→num_classes, bare logits.
The reference's undefined-`prob` defect (`ResNet2d.py:51`) is resolved by
making dropout an explicit parameter (default 0, matching intent).
"""
from __future__ import annotations

from flax import linen as nn

from tpuseg.nn.layers import (
    DownTransition,
    InputTransition,
    global_avg_pool,
    he_uniform,
)


class ResNetClassifier(nn.Module):
    ndim: int
    num_classes: int
    features: int = 16
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = self.features
        x = InputTransition(f, self.ndim, self.dropout)(x, train=train)
        x = DownTransition(f * 2, self.ndim, 2, self.dropout)(x, train=train)
        x = DownTransition(f * 4, self.ndim, 3, self.dropout)(x, train=train)
        x = DownTransition(f * 8, self.ndim, 3, self.dropout)(x, train=train)
        x = DownTransition(f * 16, self.ndim, 3, self.dropout)(x, train=train)
        # Grad-CAM hook point: zero perturbation whose gradient is
        # d(score)/d(feature-map) (flax's functional replacement for the
        # reference's forward/backward hooks, `visualization.py:65-110`)
        x = self.perturb("cam_features", x)
        self.sow("intermediates", "cam_features", x)
        x = global_avg_pool(x, self.ndim)  # (N, 16f)
        x = nn.Dense(128, kernel_init=he_uniform())(x)
        x = nn.relu(x)
        logits = nn.Dense(self.num_classes, kernel_init=he_uniform())(x)
        return logits


def ResNet2d(num_classes: int, features: int = 16) -> ResNetClassifier:
    return ResNetClassifier(ndim=2, num_classes=num_classes, features=features)


def ResNet3d(num_classes: int, features: int = 16) -> ResNetClassifier:
    return ResNetClassifier(ndim=3, num_classes=num_classes, features=features)
