"""AmlpUNet2d: ActiveMLP encoder (deformable token mixing) + conv decoder.

Capability parity with `/root/reference/networks/AmlpUnet2d.py` (ActiveMLP,
Wei et al. 2022, arXiv:2203.06108): an ActivexTiny encoder — overlapping
7×7/s4 patch embed, four stages (depths [3,3,3,3], dims [64,128,256,512],
offset share_dims [2,4,4,8], new offsets every 2nd block, PEG depthwise
positional conv before each offset generator) of ActiveBlocks whose token
mixer (ATMLayer) samples every channel at a *learned fractional offset*
along H and along W, plus a channel branch, fused by a learned 3-way
softmax — followed by a U-Net conv decoder over the 4 pyramid levels and
a stride-4 transpose-conv head.

TPU-native re-design: torchvision's `deform_conv2d` (CUDA) is replaced by
a 1-D linear-interpolation gather along the offset axis
(`take_along_axis` with floor/ceil weights) — with a 1×1 kernel and
per-channel offsets that is *exactly* what deform_conv2d computes here.
BatchNorm in the decoder becomes GroupNorm(8) (stateless), and the
reference's leftover debug noise injection in forward (`AmlpUnet2d.py:460`)
is intentionally not reproduced (SURVEY.md §7.4).

Forward contract: (logits, probs).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpuseg.nn.layers import ConvND, ConvTransposeND


def _sample_1d_offset(x, offset, axis: int):
    """Bilinearly sample each channel of (B,H,W,C) at position+offset along
    `axis` (1=H, 2=W); offset is (B,H,W,C) in pixels, border-clamped."""
    size = x.shape[axis]
    base = jnp.arange(size, dtype=x.dtype)
    shape = [1, 1, 1, 1]
    shape[axis] = size
    pos = base.reshape(shape) + offset
    pos = jnp.clip(pos, 0.0, size - 1.0)
    p0 = jnp.floor(pos)
    frac = pos - p0
    i0 = p0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, size - 1)
    g0 = jnp.take_along_axis(x, i0, axis=axis)
    g1 = jnp.take_along_axis(x, i1, axis=axis)
    return g0 * (1.0 - frac) + g1 * frac


class ATMLayer(nn.Module):
    """`AmlpUnet2d.py:92` ATMLayer: h-offset branch, w-offset branch,
    channel branch, learned softmax fusion, output projection."""

    dim: int

    @nn.compact
    def __call__(self, x, offset):
        # offset: (B,H,W,2C) — first C are w-offsets, last C h-offsets
        c = self.dim
        off_w, off_h = offset[..., :c], offset[..., c:]
        w = nn.Dense(c, use_bias=True)(_sample_1d_offset(x, off_w, axis=2))
        h = nn.Dense(c, use_bias=True)(_sample_1d_offset(x, off_h, axis=1))
        ch = nn.Dense(c, use_bias=False)(x)

        a = jnp.mean(w + h + ch, axis=(1, 2))  # (B,C)
        a = nn.Dense(c // 4)(a)
        a = nn.gelu(a)
        a = nn.Dense(c * 3)(a).reshape(-1, c, 3)
        a = jax.nn.softmax(a, axis=-1)[:, None, None]  # (B,1,1,C,3)
        x = w * a[..., 0] + h * a[..., 1] + ch * a[..., 2]
        return nn.Dense(c)(x)


class _Mlp(nn.Module):
    dim: int
    ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(int(self.dim * self.ratio))(x)
        h = nn.gelu(h)
        return nn.Dense(self.dim)(h)


class ActiveBlock(nn.Module):
    dim: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, offset):
        x = x + ATMLayer(self.dim)(nn.LayerNorm()(x), offset)
        x = x + _Mlp(self.dim, self.mlp_ratio)(nn.LayerNorm()(x))
        return x


class _OffsetLayer(nn.Module):
    dim: int
    share_dim: int

    @nn.compact
    def __call__(self, x):
        off = nn.Dense(self.dim * 2 // self.share_dim)(nn.LayerNorm()(x))
        return jnp.repeat(off, self.share_dim, axis=-1)  # (B,H,W,2C)


class _PEG(nn.Module):
    """`AmlpUnet2d.py:203` PEG: depthwise 3×3 positional conv, residual."""

    dim: int

    @nn.compact
    def __call__(self, x):
        return x + ConvND(self.dim, 2, 3, feature_group_count=self.dim)(x)


class ActiveMLPEncoder(nn.Module):
    """ActivexTiny (`AmlpUnet2d.py:372`): 4 stages → 4 pyramid features."""

    depths: Tuple[int, ...] = (3, 3, 3, 3)
    dims: Tuple[int, ...] = (64, 128, 256, 512)
    share_dims: Tuple[int, ...] = (2, 4, 4, 8)
    intv: int = 2

    @nn.compact
    def __call__(self, x):
        # overlap patch embed 7x7 stride 4
        x = ConvND(self.dims[0], 2, 7, strides=4, padding=2)(x)
        outputs = []
        for i, depth in enumerate(self.depths):
            dim = self.dims[i]
            offset = None
            for j in range(depth):
                if j % self.intv == 0 and j != depth - 1:
                    x = _PEG(dim)(x)
                    offset = _OffsetLayer(dim, self.share_dims[i])(x)
                x = ActiveBlock(dim)(x, offset)
            y = nn.LayerNorm()(x)
            outputs.append(y)
            if i < len(self.depths) - 1:
                x = ConvND(self.dims[i + 1], 2, 3, strides=2)(x)  # Downsample
        return outputs  # strides 4, 8, 16, 32


class _DecBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = ConvND(self.features, 2, 3, use_bias=False)(x)
            x = nn.GroupNorm(num_groups=8)(x)
            x = nn.relu(x)
        return x


class AmlpUNet2d(nn.Module):
    num_classes: int = 2
    features: int = 64

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = self.features
        feats = ActiveMLPEncoder()(x)  # dims 64,128,256,512 @ /4,/8,/16,/32
        d3 = ConvTransposeND(f * 4, 2, 2, 2)(feats[3])
        d3 = _DecBlock(f * 4)(jnp.concatenate([d3, feats[2]], -1))
        d2 = ConvTransposeND(f * 2, 2, 2, 2)(d3)
        d2 = _DecBlock(f * 2)(jnp.concatenate([d2, feats[1]], -1))
        d1 = ConvTransposeND(f, 2, 2, 2)(d2)
        d1 = _DecBlock(f)(jnp.concatenate([d1, feats[0]], -1))
        # stride-4 transpose head back to input resolution (`:452`)
        logits = nn.ConvTranspose(
            self.num_classes, (8, 8), strides=(4, 4), padding="SAME"
        )(d1)
        if self.num_classes == 1:
            probs = jax.nn.sigmoid(logits)
        else:
            probs = jax.nn.softmax(logits, axis=-1)
        return logits, probs
