"""TPDDNet: two-path dilated detection net with spatial squeeze-excitation.

Capability parity with `/root/reference/networks/TPDDNet.py`: SSE conv
units (conv → InstanceNorm → LeakyReLU → 1-channel sigmoid spatial gate
[applied once in SSEConv `:5`, twice in SSEConv2 `:32`] → 1×1 side-output
conv upsampled to full resolution), dilated 3×3 convs, three maxpool
levels, two decoder passes over shared weights, and three heads: one over
the 12 encoder side-outputs, two over the 6 side-outputs of each decoder
pass.

The reference's stochastic channel-drop `droplayer:64` (random channel
mask scaled by kept fraction at train time) is implemented with proper
PRNG plumbing instead of `torch.rand(...).cuda()`.

Forward contract: (logits, probs, aux_logits) where the primary head is
the first decoder-pass prediction (pred1) and aux = (pred0, pred2), all
at full resolution.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpuseg.nn.layers import ConvND, max_pool_nd, upsample_nd


class SSEConv(nn.Module):
    features: int
    side_channels: int = 2
    dilation: int = 1
    up_factor: int = 1
    double_gate: bool = False

    @nn.compact
    def __call__(self, x):
        e0 = ConvND(self.features, 3, 3, kernel_dilation=self.dilation)(x)
        e0 = nn.GroupNorm(num_groups=None, group_size=1)(e0)  # InstanceNorm
        e0 = nn.leaky_relu(e0)
        gate = jax.nn.sigmoid(ConvND(1, 3, 1, use_bias=False)(e0))
        e0 = e0 * gate
        if self.double_gate:
            gate2 = jax.nn.sigmoid(ConvND(1, 3, 1, use_bias=False)(e0))
            e0 = e0 * gate2
        side = ConvND(self.side_channels, 3, 1)(e0)
        if self.up_factor > 1:
            side = upsample_nd(side, 3, self.up_factor, "linear")
        return e0, side


class _ChannelDrop(nn.Module):
    """`TPDDNet.py:64` droplayer: Bernoulli channel mask, rescaled by the
    kept fraction, train-only."""

    threshold: float = 0.3

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if not train:
            return x
        rng = self.make_rng("dropout")
        c = x.shape[-1]
        keep = (
            jax.random.uniform(rng, (x.shape[0],) + (1,) * (x.ndim - 2) + (c,))
            >= self.threshold
        ).astype(x.dtype)
        scale = c / (jnp.sum(keep, axis=-1, keepdims=True) + 0.01)
        return x * keep * scale


class TPDDNet(nn.Module):
    num_classes: int = 2

    def _decoder(self, e7, e5, e3, e1, mods):
        dc1, dc2, dc3, dc4, dc5, dc6 = mods
        e8 = upsample_nd(e7, 3, 2, "linear")
        d0, s12 = dc1(jnp.concatenate([e8, e5], -1))
        d0, s13 = dc2(d0)
        d1 = upsample_nd(d0, 3, 2, "linear")
        d1, s14 = dc3(jnp.concatenate([d1, e3], -1))
        d1, s15 = dc4(d1)
        d2 = upsample_nd(d1, 3, 2, "linear")
        d2, s16 = dc5(jnp.concatenate([d2, e1], -1))
        d2, s17 = dc6(d2)
        return (s12, s13, s14, s15, s16, s17)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        sse = SSEConv
        # encoder group: 12 side outputs, all upsampled to full res
        e0, s0 = sse(8)(x)
        e1, s1 = sse(16)(e0)
        e1, s2 = sse(32, dilation=2)(e1)
        e2 = max_pool_nd(e1, 3)
        e2, s3 = sse(32, up_factor=2, double_gate=True)(e2)
        e3, s4 = sse(32, dilation=2, up_factor=2, double_gate=True)(e2)
        e3, s5 = sse(64, dilation=2, up_factor=2, double_gate=True)(e3)
        e4 = max_pool_nd(e3, 3)
        e4, s6 = sse(64, up_factor=4, double_gate=True)(e4)
        e5, s7 = sse(64, dilation=2, up_factor=4, double_gate=True)(e4)
        e5, s8 = sse(64, dilation=2, up_factor=4, double_gate=True)(e5)
        e6 = max_pool_nd(e5, 3)
        e6, s9 = sse(64, up_factor=8, double_gate=True)(e6)
        e7, s10 = sse(64, up_factor=8, double_gate=True)(e6)
        e7, s11 = sse(64, up_factor=8, double_gate=True)(e7)

        # shared decoder modules, run twice (two-path)
        dec_mods = (
            sse(64, up_factor=4, double_gate=True),
            sse(64, up_factor=4, double_gate=True),
            sse(64, up_factor=2, double_gate=True),
            sse(32, up_factor=2, double_gate=True),
            sse(32),
            sse(16),
        )
        dec1 = self._decoder(e7, e5, e3, e1, dec_mods)
        dec2 = self._decoder(e7, e5, e3, e1, dec_mods)

        enc_sides = jnp.concatenate(
            [s0, s1, s2, s3, s4, s5, s6, s7, s8, s9, s10, s11], axis=-1
        )
        head_enc = ConvND(self.num_classes, 3, 1)
        head_dec = ConvND(self.num_classes, 3, 1)
        drop_enc = _ChannelDrop(0.3)
        drop_dec = _ChannelDrop(0.3)
        pred0 = head_enc(drop_enc(enc_sides, train=train))
        pred1 = head_dec(drop_dec(jnp.concatenate(dec1, -1), train=train))
        pred2 = head_dec(drop_dec(jnp.concatenate(dec2, -1), train=train))

        act = jax.nn.sigmoid if self.num_classes == 1 else (
            lambda v: jax.nn.softmax(v, axis=-1)
        )
        return pred1, act(pred1), (pred0, pred2)
