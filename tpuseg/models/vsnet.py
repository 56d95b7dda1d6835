"""VSNet: hybrid conv/Swin multi-task 3D segmentation network.

Capability parity with `/root/reference/networks/VSNet.py:879-1063`:
 * four UNETR residual conv encoders with max-pool downsampling and
   attention Gates refining each skip from the level below (`:941-961`);
 * a 2-block Swin transformer stage (window 7³, relative-position bias,
   shifted windows + masking) with patch merging at the bottleneck;
 * channel self-attention (CSA `:685`) and spatial MHSA (SSA `:731`)
   residual refiners at the bottleneck;
 * gated-linear DepTran units (`:630`) between decoder levels and UNETR
   up blocks;
 * multi-task heads (`:1007-1025`): 3-class softmax vessel segmentation,
   binary sigmoid regression, 2-class edge segmentation, and two
   deep-supervision heads at 1/2 and 1/4 resolution.

Forward contract: training-mode returns (seg_logits, seg_probs, aux)
where aux = (reg_logits, edge_logits, deep2_logits, deep3_logits); the
reference's train/eval output switch (`:1059-1063`) is expressed by the
caller simply ignoring aux at inference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpuseg.nn.layers import ConvND, max_pool_nd
from tpuseg.nn.swin import SwinStage3D
from tpuseg.nn.unetr import UnetrBasicBlock, UnetrUpBlock, instance_norm


class Gate(nn.Module):
    """`VSNet.py:657`: additive attention gate; x1 scaled by a sigmoid map
    from (x1, upsampled x2)."""

    features: int

    @nn.compact
    def __call__(self, x1, x2):
        w1 = instance_norm(ConvND(self.features, 3, 1)(x1))
        up = nn.ConvTranspose(self.features, (2, 2, 2), strides=(2, 2, 2),
                              use_bias=False)(x2)
        w2 = instance_norm(ConvND(self.features, 3, 1)(up))
        psi = nn.leaky_relu(w1 + w2)
        psi = jax.nn.sigmoid(instance_norm(ConvND(1, 3, 1)(psi)))
        return x1 * psi


class DepTran(nn.Module):
    """`VSNet.py:630`: gated-linear unit — per-channel grouped 1×1 expand
    to (a, b), GELU(a)·sigmoid(b), residual, 1×1 projection."""

    features: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = ConvND(c, 3, 1)(x)
        h = ConvND(2 * c, 3, 1, feature_group_count=c)(h)
        # grouped conv with groups=c interleaves (channel, 2): de-interleave
        h = h.reshape(h.shape[:-1] + (c, 2))
        a, b = h[..., 0], h[..., 1]
        out = nn.gelu(a) * jax.nn.sigmoid(b) + x
        return nn.leaky_relu(ConvND(self.features, 3, 1)(out))


class CSA(nn.Module):
    """`VSNet.py:685` channel self-attention: 1×1 grouped qkv, attention
    over CHANNELS with flattened-space features, residual."""

    @nn.compact
    def __call__(self, x):
        n, d, h, w, c = x.shape
        xn = nn.LayerNorm()(x)
        qkv = ConvND(3 * c, 3, 1, feature_group_count=c)(xn)
        qkv = qkv.reshape(n, d * h * w, c, 3)
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]  # (n, X, C)
        scale = (d * h * w) ** -0.5
        attn = jax.nn.softmax(jnp.einsum("bxq,bxc->bqc", q, k) * scale, axis=-1)
        out = jnp.einsum("bqc,bxc->bxq", attn, v).reshape(n, d, h, w, c)
        return x + out


class SSA(nn.Module):
    """`VSNet.py:731` spatial MHSA over all bottleneck tokens, residual."""

    num_heads: int = 3

    @nn.compact
    def __call__(self, x):
        n, d, h, w, c = x.shape
        heads = self.num_heads
        dim_head = c // heads
        tokens = nn.LayerNorm()(x.reshape(n, -1, c))
        qkv = nn.Dense(3 * heads * dim_head, use_bias=False)(tokens)
        qkv = qkv.reshape(n, -1, 3, heads, dim_head).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k) * dim_head ** -0.5, axis=-1
        )
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3)
        out = nn.Dense(c)(out.reshape(n, -1, heads * dim_head))
        return x + out.reshape(n, d, h, w, c)


class _OutLayer(nn.Module):
    """`VSNet.py:859` Outlayer: 1×1 head (activation applied by caller)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        return ConvND(self.out_channels, 3, 1)(x)


class VSNet(nn.Module):
    feature_size: int = 24
    seg_classes: int = 3
    edge_classes: int = 2
    swin_heads: int = 3
    swin_depth: int = 2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = self.feature_size
        x1 = UnetrBasicBlock(f)(x)
        x2 = max_pool_nd(UnetrBasicBlock(f * 2)(x1), 3)
        x1 = Gate(f)(x1, x2)
        x3 = max_pool_nd(UnetrBasicBlock(f * 4)(x2), 3)
        x2 = Gate(f * 2)(x2, x3)
        x4 = max_pool_nd(UnetrBasicBlock(f * 8)(x3), 3)
        x3 = Gate(f * 4)(x3, x4)

        x5 = SwinStage3D(f * 8, self.swin_heads, self.swin_depth)(x4)  # 16f, /16
        x5 = CSA()(x5)
        x5 = SSA(self.swin_heads)(x5)

        up5 = DepTran(f * 16)(x5)
        up4 = UnetrUpBlock(f * 8)(up5, x4)
        up4 = DepTran(f * 8)(up4)
        up3 = UnetrUpBlock(f * 4)(up4, x3)
        up3 = DepTran(f * 4)(up3)
        up2 = UnetrUpBlock(f * 2)(up3, x2)
        up2 = DepTran(f * 2)(up2)
        up1 = UnetrUpBlock(f)(up2, x1)

        seg_logits = _OutLayer(self.seg_classes)(up1)
        reg_logits = _OutLayer(1)(up1)
        edge_logits = _OutLayer(self.edge_classes)(up1)
        deep2 = _OutLayer(self.seg_classes)(up2)
        deep3 = _OutLayer(self.seg_classes)(up3)

        probs = jax.nn.softmax(seg_logits, axis=-1)
        return seg_logits, probs, (reg_logits, edge_logits, deep2, deep3)
