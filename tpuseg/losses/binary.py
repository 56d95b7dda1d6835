"""Binary segmentation losses (channels-last logits).

Capability parity with `/root/reference/model/losses.py:9-245`.  All losses
take ``logits`` of shape (N, *spatial, C) (C usually 1) and ``targets`` of
the same shape (float 0/1); reductions are *global* over the whole batch,
matching the reference's ``view(bs, C, -1) ... .sum()`` semantics.

Each returns a scalar; all are jit/grad-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

SMOOTH = 1e-5
EPS = 1e-7


def _flat(logits, targets):
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    t = jnp.broadcast_to(t.reshape(t.shape + (1,) * (p.ndim - t.ndim)), p.shape)
    return p.reshape(-1), t.reshape(-1)


def jaccard_loss(logits, targets):
    """`losses.py:9` BinaryJaccardLoss: global IoU loss."""
    p, t = _flat(logits, targets)
    inter = jnp.sum(p * t)
    denom = jnp.maximum(jnp.sum(p) + jnp.sum(t) - inter + SMOOTH, EPS)
    return 1.0 - (inter + SMOOTH) / denom


def dice_loss(logits, targets):
    """`losses.py:33` BinaryDiceLoss: global soft dice."""
    p, t = _flat(logits, targets)
    inter = jnp.sum(p * t)
    denom = jnp.maximum(jnp.sum(p) + jnp.sum(t) + SMOOTH, EPS)
    return 1.0 - (2.0 * inter + SMOOTH) / denom


def el_dice_loss(logits, targets):
    """`losses.py:56` BinaryELDiceLoss: (-log dice)^0.3, clipped to [0,2]."""
    p, t = _flat(logits, targets)
    inter = jnp.sum(p * t)
    dsc = (2.0 * inter + SMOOTH) / jnp.maximum(jnp.sum(p) + jnp.sum(t) + SMOOTH, EPS)
    return jnp.clip(jnp.power(-jnp.log(dsc + SMOOTH), 0.3), 0.0, 2.0)


def ss_loss(logits, targets, r: float = 0.1):
    """`losses.py:77` BinarySSLoss (Sensitivity-Specificity, r=0.1)."""
    p, t = _flat(logits, targets)
    bg = 1.0 - t
    sq = (p - t) ** 2
    fg_part = jnp.sum(sq * t) / (SMOOTH + jnp.sum(t))
    bg_part = jnp.sum(sq * bg) / (SMOOTH + jnp.sum(bg))
    return r * fg_part + (1.0 - r) * bg_part


def tversky_loss(logits, targets, alpha: float = 0.3, beta: float = 0.7):
    """`losses.py:102` BinaryTverskyLoss (α=0.3, β=0.7)."""
    p, t = _flat(logits, targets)
    tp = jnp.sum(p * t)
    fp = jnp.sum(p * (1 - t))
    fn = jnp.sum((1 - p) * t)
    tv = (tp + SMOOTH) / (tp + alpha * fp + beta * fn + SMOOTH)
    return jnp.clip(1.0 - tv, 0.0, 2.0)


def bce_with_logits(logits, targets):
    """`losses.py:129` BinaryCrossEntropyLoss — log-sum-exp-stable BCE."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    t = jnp.broadcast_to(t.reshape(t.shape + (1,) * (x.ndim - t.ndim)), x.shape)
    # max(x,0) - x*t + log(1+exp(-|x|))
    per = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(per)


def focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """`losses.py:150` BinaryFocalLoss: α(1-pt)^γ · BCE, mean."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    t = jnp.broadcast_to(t.reshape(t.shape + (1,) * (x.ndim - t.ndim)), x.shape)
    bce = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    pt = jnp.exp(-bce)
    return jnp.mean(alpha * (1.0 - pt) ** gamma * bce)


def bce_dice_loss(logits, targets):
    """`losses.py:184` BinaryCrossEntropyDiceLoss: BCE + dice."""
    return bce_with_logits(logits, targets) + dice_loss(logits, targets)


def mcc_loss(probs, targets):
    """`losses.py:200` MCC_Loss — takes probabilities, not logits."""
    p = probs.astype(jnp.float32).reshape(-1)
    t = targets.astype(jnp.float32).reshape(-1)
    tp = jnp.sum(p * t)
    tn = jnp.sum((1 - p) * (1 - t))
    fp = jnp.sum(p * (1 - t))
    fn = jnp.sum((1 - p) * t)
    num = tp * tn - fp * fn
    den = jnp.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return 1.0 - num / (den + 1.0)
