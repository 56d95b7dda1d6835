"""UNETR-style residual conv blocks (MONAI UnetrBasicBlock/UnetrUpBlock
equivalents) shared by SMT and VSNet decoders
(`/root/reference/networks/smt.py:238-318`, `VSNet.py:904-1006`)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from tpuseg.nn.layers import ConvND, ConvTransposeND


def instance_norm(x):
    return nn.GroupNorm(num_groups=None, group_size=1)(x)


class UnetrBasicBlock(nn.Module):
    """(conv3-IN-lrelu) ×2 with projected residual."""

    features: int
    ndim: int = 3

    @nn.compact
    def __call__(self, x):
        r = (
            ConvND(self.features, self.ndim, 1)(x)
            if x.shape[-1] != self.features
            else x
        )
        h = nn.leaky_relu(instance_norm(ConvND(self.features, self.ndim, 3)(x)))
        h = instance_norm(ConvND(self.features, self.ndim, 3)(h))
        return nn.leaky_relu(h + r)


class UnetrUpBlock(nn.Module):
    """transpose-conv ×2 upsample, concat skip, residual basic block."""

    features: int
    ndim: int = 3

    @nn.compact
    def __call__(self, x, skip):
        x = ConvTransposeND(self.features, self.ndim, 2, 2)(x)
        return UnetrBasicBlock(self.features, self.ndim)(
            jnp.concatenate([x, skip], -1)
        )
