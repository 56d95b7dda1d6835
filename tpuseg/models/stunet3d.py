"""STUNet3d: V-Net variant with InstanceNorm + LeakyReLU, dual-path
downsampling, nearest-upsample decoder.

Capability parity with `/root/reference/networks/STUNet3d.py`: stem and
down stages compute a 3×3(stride-2) path and a 1×1(stride-2) path through
a shared norm and add them; decoder = nearest ×2 upsample + 1×1 squeeze +
LUConv stack + residual; depth profile down [2,2,2,2] / up [3,3,2,1].
The reference's OutputTransition additionally thresholds/argmaxes its
second output in-place (`:99-106`, an eval-style hard mask); we keep the
zoo-wide (logits, probs) contract and leave hard-masking to
`tpuseg.infer.probs_to_mask` — the hard output is not differentiable and
would break training if used as the model's probability output.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpuseg.nn.layers import ChannelDropout, ConvND, upsample_nd


class _LUConvIN(nn.Module):
    features: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = ConvND(self.features, 3, 3)(x)
        x = nn.GroupNorm(num_groups=None, group_size=1)(x)  # InstanceNorm
        x = ChannelDropout(self.dropout, 3)(x, deterministic=not train)
        return nn.leaky_relu(x)


class _DualPathDown(nn.Module):
    """3×3 stride-s ∥ 1×1 stride-s → shared InstanceNorm → add."""

    features: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        norm = nn.GroupNorm(num_groups=None, group_size=1)
        a = ConvND(self.features, 3, 3, strides=self.stride)(x)
        a = nn.leaky_relu(norm(a))
        b = ConvND(self.features, 3, 1, strides=self.stride, padding="VALID")(x)
        b = nn.leaky_relu(norm(b))
        return nn.leaky_relu(a + b)


class STUNet3d(nn.Module):
    num_classes: int
    features: int = 16
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = self.features
        out16 = _DualPathDown(f, stride=1)(x)
        skips = [out16]
        cur = out16
        for mult, n in ((2, 2), (4, 2), (8, 2), (16, 2)):
            down = _DualPathDown(f * mult, stride=2)(cur)
            out = down
            for _ in range(n):
                out = _LUConvIN(f * mult, self.dropout)(out, train=train)
            cur = nn.leaky_relu(out + down)
            skips.append(cur)

        for mult, n in ((8, 3), (4, 3), (2, 2), (1, 1)):
            ch = f * mult
            up = upsample_nd(cur, 3, 2, "nearest")
            up = ConvND(ch, 3, 1)(up)
            cat = jnp.concatenate([up, skips[{8: 3, 4: 2, 2: 1, 1: 0}[mult]]], axis=-1)
            cat = ConvND(ch, 3, 1)(cat)
            out = cat
            for _ in range(n):
                out = _LUConvIN(ch, self.dropout)(out, train=train)
            cur = nn.leaky_relu(out + cat)

        logits = ConvND(self.num_classes, 3, 1)(cur)
        if self.num_classes == 1:
            probs = jax.nn.sigmoid(logits)
        else:
            probs = jax.nn.softmax(logits, axis=-1)
        return logits, probs
