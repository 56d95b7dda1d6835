"""KiUNet3d (thin): U-branch + overcomplete Ki-branch with deep supervision.

Capability parity with `/root/reference/networks/KiUnet3d.py` (KiU-Net,
Valanarasu et al.): a 5-level single-conv-block U-branch with add-fused
skips and three intermediate supervision heads, plus an overcomplete
Ki-branch (conv at full res → ×2 trilinear upsample → conv → ×0.5
downsample) fused into the final stage by addition.

Reference defects intentionally not reproduced (SURVEY.md §7.4):
``self.kencoder2`` used but never defined (`:70` — the Ki-branch's second
conv is properly defined here), the final decoder stage upsampling past
input resolution (`:74-77` — our final stage stays at full resolution),
and the 1×1 output conv with padding=1 (`:113`).

Forward contract: (logits, probs, aux_logits) like ResUNet3d.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpuseg.nn.layers import ConvBlock, ConvND, max_pool_nd, upsample_nd


class _Block(nn.Module):
    features: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        return ConvBlock(self.features, 3, self.dropout, repeats=1)(x, train=train)


class _Head(nn.Module):
    num_classes: int
    scale: int

    @nn.compact
    def __call__(self, x):
        x = ConvND(self.num_classes, 3, 1, use_bias=False)(x)
        if self.scale > 1:
            x = upsample_nd(x, 3, self.scale, "linear")
        return x


class KiUNet3d(nn.Module):
    num_classes: int
    features: int = 16
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = self.features
        enc1 = _Block(f, self.dropout)(x, train=train)
        enc2 = _Block(f * 2, self.dropout)(max_pool_nd(enc1, 3), train=train)
        enc3 = _Block(f * 4, self.dropout)(max_pool_nd(enc2, 3), train=train)
        enc4 = _Block(f * 8, self.dropout)(max_pool_nd(enc3, 3), train=train)
        enc5 = _Block(f * 16, self.dropout)(max_pool_nd(enc4, 3), train=train)

        out = upsample_nd(_Block(f * 8, self.dropout)(enc5, train=train), 3, 2) + enc4
        aux1 = _Head(self.num_classes, 8)(out)
        out = upsample_nd(_Block(f * 4, self.dropout)(out, train=train), 3, 2) + enc3
        aux2 = _Head(self.num_classes, 4)(out)
        out = upsample_nd(_Block(f * 2, self.dropout)(out, train=train), 3, 2) + enc2
        aux3 = _Head(self.num_classes, 2)(out)
        out = upsample_nd(_Block(f, self.dropout)(out, train=train), 3, 2) + enc1

        # overcomplete Ki branch: features extracted above input resolution
        ki = _Block(f, self.dropout)(x, train=train)
        ki = upsample_nd(ki, 3, 2, "linear")
        ki = _Block(f, self.dropout)(ki, train=train)
        ki = jax.image.resize(
            ki, ki.shape[:1] + tuple(s // 2 for s in ki.shape[1:4]) + ki.shape[4:],
            method="linear",
        )

        out = _Block(f, self.dropout)(out + ki, train=train)
        logits = _Head(self.num_classes, 1)(out)
        act = jax.nn.sigmoid if self.num_classes == 1 else (
            lambda v: jax.nn.softmax(v, axis=-1)
        )
        return logits, act(logits), (aux1, aux2, aux3)
