"""ResUNet3d: residual U-Net with conv downsampling + 4-way deep supervision.

Capability parity with `/root/reference/networks/ResUnet3d.py` (≈9.5M
params at features=16): double-conv blocks, residual adds around every
encoder/decoder stage, stride-2 conv downsampling, transpose-conv
upsampling, and four supervision heads (1×1 conv + trilinear upsample to
full resolution).

Reference defects intentionally not reproduced (SURVEY.md §7.4):
`super(ResUNet3d).__init__()` (`:14`), down/up blocks with kernel 2 +
padding 2 and no stride (`:110-137` — geometrically inconsistent; the
intended stride-2 halving/doubling is implemented), `decoder_stage3`
redefined / `decoder_stage4` undefined (`:36-39,:70`), and the output
block's 1×1 conv with padding=1 (`:141`).

Forward contract: (logits, probs) of the full-resolution head, plus the
three auxiliary logits for deep-supervision training.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpuseg.nn.layers import ConvBlock, ConvND, ConvTransposeND, upsample_nd


class _DownSample(nn.Module):
    features: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from tpuseg.nn.layers import ChannelDropout

        x = ConvND(self.features, 3, 2, strides=2, padding="VALID", use_bias=False)(x)
        x = nn.GroupNorm(num_groups=8)(x)
        x = ChannelDropout(self.dropout, 3)(x, deterministic=not train)
        return nn.relu(x)


class _UpSample(nn.Module):
    features: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from tpuseg.nn.layers import ChannelDropout

        x = ConvTransposeND(self.features, 3, 2, 2, use_bias=False)(x)
        x = nn.GroupNorm(num_groups=8)(x)
        x = ChannelDropout(self.dropout, 3)(x, deterministic=not train)
        return nn.relu(x)


class _Head(nn.Module):
    num_classes: int
    scale: int

    @nn.compact
    def __call__(self, x):
        x = ConvND(self.num_classes, 3, 1, use_bias=False)(x)
        if self.scale > 1:
            x = upsample_nd(x, 3, self.scale, "linear")
        return x


class ResUNet3d(nn.Module):
    num_classes: int
    features: int = 16
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = self.features
        blk = lambda ch: ConvBlock(ch, 3, self.dropout)

        long1 = blk(f)(x, train=train)
        s1 = _DownSample(f * 2, self.dropout)(long1, train=train)
        long2 = blk(f * 2)(s1, train=train) + s1
        s2 = _DownSample(f * 4, self.dropout)(long2, train=train)
        long3 = blk(f * 4)(s2, train=train) + s2
        s3 = _DownSample(f * 8, self.dropout)(long3, train=train)
        long4 = blk(f * 8)(s3, train=train) + s3
        s4 = _DownSample(f * 16, self.dropout)(long4, train=train)
        long5 = blk(f * 16)(s4, train=train) + s4

        u1 = _UpSample(f * 8, self.dropout)(long5, train=train)
        d1 = blk(f * 8)(jnp.concatenate([u1, long4], -1), train=train) + u1
        aux1 = _Head(self.num_classes, 8)(d1)
        u2 = _UpSample(f * 4, self.dropout)(d1, train=train)
        d2 = blk(f * 4)(jnp.concatenate([u2, long3], -1), train=train) + u2
        aux2 = _Head(self.num_classes, 4)(d2)
        u3 = _UpSample(f * 2, self.dropout)(d2, train=train)
        d3 = blk(f * 2)(jnp.concatenate([u3, long2], -1), train=train) + u3
        aux3 = _Head(self.num_classes, 2)(d3)
        u4 = _UpSample(f, self.dropout)(d3, train=train)
        d4 = blk(f)(jnp.concatenate([u4, long1], -1), train=train) + u4
        logits = _Head(self.num_classes, 1)(d4)

        act = jax.nn.sigmoid if self.num_classes == 1 else (
            lambda v: jax.nn.softmax(v, axis=-1)
        )
        return logits, act(logits), (aux1, aux2, aux3)
