"""UNeXt2d: convolutional stem + tokenized shifted-MLP U-Net.

Capability parity with `/root/reference/networks/UNeXt2d.py` (UNeXt,
Valanarasu & Patel 2022): three conv-BN-pool stem stages, two
shifted-MLP token stages reached through overlapping patch embeddings
(3×3 stride-2), and a mirrored decoder with bilinear upsampling and
add-fused skips; `UNeXt2d` uses stem channels (16,32,128) and token dims
(160,256); `UNeXt2dS` the small profile (8,16,32)/(64,128).

TPU-native re-design: the token stages keep the (N,H,W,C) spatial layout
— the reference's flatten→transpose→reshape round-trips
(`UNeXt2d.py:100-135`) exist only to fit nn.Linear and are free in XLA
(a Dense over the trailing axis IS the token MLP).  The channel-chunked
spatial shift is `jnp.roll` per chunk, fused by XLA into one gather.
BatchNorm (stateful running stats) is replaced by GroupNorm(8) to keep
the forward pure; at segmentation batch sizes BN statistics are noisy
anyway and GN is the established substitute.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpuseg.nn.layers import ConvND, max_pool_nd, upsample_nd


def _spatial_shift(x, axis: int, shift_size: int = 5):
    """Chunk channels into `shift_size` groups, roll group g by
    (g - pad) voxels along `axis` with zero fill (reference pads then
    narrows, `UNeXt2d.py:102-110`)."""
    pad = shift_size // 2
    c = x.shape[-1]
    splits = jnp.array_split(jnp.arange(c), shift_size)
    size = x.shape[axis]
    idx = jnp.arange(size)
    out_parts = []
    for g, cols in enumerate(splits):
        shift = g - pad
        part = jnp.roll(x[..., cols[0]:cols[-1] + 1], shift, axis=axis)
        # zero-fill the wrapped region (reference uses zero padding)
        if shift > 0:
            mask = (idx >= shift).astype(x.dtype)
        elif shift < 0:
            mask = (idx < size + shift).astype(x.dtype)
        else:
            mask = None
        if mask is not None:
            shape = [1] * x.ndim
            shape[axis] = size
            part = part * mask.reshape(shape)
        out_parts.append(part)
    return jnp.concatenate(out_parts, axis=-1)


class ShiftMLP(nn.Module):
    """`UNeXt2d.py:59` shiftmlp: shift-H → fc1 → DWConv → GELU → shift-W →
    fc2 (mlp_ratio=1 throughout the reference)."""

    dim: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = _spatial_shift(x, axis=1)
        h = nn.Dense(self.dim)(h)
        h = ConvND(self.dim, 2, 3, feature_group_count=self.dim)(h)  # DWConv
        h = nn.gelu(h)
        if self.drop > 0:
            h = nn.Dropout(self.drop)(h, deterministic=not train)
        h = _spatial_shift(h, axis=2)
        h = nn.Dense(self.dim)(h)
        if self.drop > 0:
            h = nn.Dropout(self.drop)(h, deterministic=not train)
        return h


class ShiftedBlock(nn.Module):
    """`UNeXt2d.py:137` shiftedBlock: x + shiftmlp(LN(x))."""

    dim: int

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        return x + ShiftMLP(self.dim)(nn.LayerNorm()(x), train=train)


class OverlapPatchEmbed(nn.Module):
    """`UNeXt2d.py:180`: 3×3 stride-2 conv + LayerNorm."""

    dim: int

    @nn.compact
    def __call__(self, x):
        x = ConvND(self.dim, 2, 3, strides=2)(x)
        return nn.LayerNorm()(x)


class _Stem(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = ConvND(self.features, 2, 3)(x)
        x = nn.GroupNorm(num_groups=8)(x)
        return nn.relu(max_pool_nd(x, 2, 2))


class _DecoderStage(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = ConvND(self.features, 2, 3)(x)
        x = nn.GroupNorm(num_groups=8)(x)
        return nn.relu(upsample_nd(x, 2, 2, "linear"))


class UNeXtBase(nn.Module):
    num_classes: int
    stem_dims: Tuple[int, int, int] = (16, 32, 128)
    token_dims: Tuple[int, int] = (160, 256)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        s1, s2, s3 = self.stem_dims
        t1d, t2d = self.token_dims
        t1 = _Stem(s1)(x)
        t2 = _Stem(s2)(t1)
        t3 = _Stem(s3)(t2)

        tok = OverlapPatchEmbed(t1d)(t3)
        tok = ShiftedBlock(t1d)(tok, train=train)
        t4 = nn.LayerNorm()(tok)

        tok = OverlapPatchEmbed(t2d)(t4)
        tok = ShiftedBlock(t2d)(tok, train=train)
        tok = nn.LayerNorm()(tok)

        out = _DecoderStage(t1d)(tok) + t4
        out = ShiftedBlock(t1d)(out, train=train)
        out = nn.LayerNorm()(out)
        out = _DecoderStage(s3)(out) + t3
        out = ShiftedBlock(s3)(out, train=train)
        out = nn.LayerNorm()(out)
        out = _DecoderStage(s2)(out) + t2
        out = _DecoderStage(s1)(out) + t1
        # final upsample back to input resolution (no norm, reference `:332`)
        out = ConvND(s1, 2, 3)(out)
        out = nn.relu(upsample_nd(out, 2, 2, "linear"))
        logits = ConvND(self.num_classes, 2, 1)(out)
        if self.num_classes == 1:
            probs = jax.nn.sigmoid(logits)
        else:
            probs = jax.nn.softmax(logits, axis=-1)
        return logits, probs


def UNeXt2d(num_classes: int) -> UNeXtBase:
    return UNeXtBase(num_classes=num_classes)


def UNeXt2dS(num_classes: int) -> UNeXtBase:
    """`UNeXt2d.py:358` UNext_S small profile."""
    return UNeXtBase(
        num_classes=num_classes, stem_dims=(8, 16, 32), token_dims=(64, 128)
    )
