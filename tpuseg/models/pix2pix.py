"""Pix2pix image-to-image GAN networks.

Capability parity with `/root/reference/model/modelPixel2PixelGAN.py:18-211`:
 * GeneratorUNet2d (`:112`) — a V-Net-style generator with InstanceNorm +
   LeakyReLU(0.2), dropout 0.5 transitions and a tanh output head;
 * Discriminator2d (`:173`) — a conditional patch discriminator: concat
   (image, condition) → six 5×5 stride-2 conv-IN-LeakyReLU blocks
   (32→1024 channels) → 3×3 patch logit map.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpuseg.nn.layers import ChannelDropout, ConvND, ConvTransposeND


class _LUConvIN(nn.Module):
    features: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = ConvND(self.features, 2, 3)(x)
        x = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False, use_scale=False)(x)
        x = ChannelDropout(self.dropout, 2)(x, deterministic=not train)
        return nn.leaky_relu(x, 0.2)


class _InputTr(nn.Module):
    features: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        norm = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False, use_scale=False)
        drop = ChannelDropout(self.dropout, 2)
        a = ConvND(self.features, 2, 3)(x)
        a = nn.leaky_relu(drop(norm(a), deterministic=not train), 0.2)
        b = ConvND(self.features, 2, 1)(x)
        b = nn.leaky_relu(drop(norm(b), deterministic=not train), 0.2)
        return a + b


class _DownTr(nn.Module):
    features: int
    n_convs: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        d = ConvND(self.features, 2, 2, strides=2, padding="VALID")(x)
        d = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False, use_scale=False)(d)
        d = ChannelDropout(self.dropout, 2)(d, deterministic=not train)
        d = nn.leaky_relu(d)
        out = d
        for _ in range(self.n_convs):
            out = _LUConvIN(self.features, self.dropout)(out, train=train)
        return out + d


class _UpTr(nn.Module):
    features: int
    n_convs: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, skip, *, train: bool = False):
        norm = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False, use_scale=False)
        drop = ChannelDropout(self.dropout, 2)
        up = ConvTransposeND(self.features, 2, 2, 2)(x)
        up = nn.relu(drop(norm(up), deterministic=not train))
        cat = jnp.concatenate([up, skip], axis=-1)
        cat = ConvND(self.features, 2, 1)(cat)
        cat = nn.relu(drop(norm(cat), deterministic=not train))
        out = cat
        for _ in range(self.n_convs):
            out = _LUConvIN(self.features, self.dropout)(out, train=train)
        return out + cat


class GeneratorUNet2d(nn.Module):
    out_channels: int = 1
    features: int = 16
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = self.features
        out16 = _InputTr(f, self.dropout)(x, train=train)
        out32 = _DownTr(f * 2, 2, self.dropout)(out16, train=train)
        out64 = _DownTr(f * 4, 3, self.dropout)(out32, train=train)
        out128 = _DownTr(f * 8, 3, self.dropout)(out64, train=train)
        out256 = _DownTr(f * 16, 3, self.dropout)(out128, train=train)
        up = _UpTr(f * 8, 3, self.dropout)(out256, out128, train=train)
        up = _UpTr(f * 4, 3, self.dropout)(up, out64, train=train)
        up = _UpTr(f * 2, 2, self.dropout)(up, out32, train=train)
        up = _UpTr(f, 1, self.dropout)(up, out16, train=train)
        return jnp.tanh(ConvND(self.out_channels, 2, 1)(up))


class Discriminator2d(nn.Module):
    """Conditional patch discriminator: D(x, condition) → patch logits."""

    out_channels: int = 1
    features: int = 32

    @nn.compact
    def __call__(self, x, cond):
        h = jnp.concatenate([x, cond], axis=-1)
        f = self.features
        for mult in (1, 2, 4, 8, 16, 32):
            h = ConvND(f * mult, 2, 5, strides=2, use_bias=False)(h)
            h = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False, use_scale=False)(h)
            h = nn.leaky_relu(h, 0.2)
        return ConvND(self.out_channels, 2, 3, use_bias=False)(h)
