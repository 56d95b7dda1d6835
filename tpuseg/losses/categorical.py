"""Multiclass segmentation losses (channels-last logits, integer labels).

Capability parity with `/root/reference/model/losses.py:247-473`.  All take
``logits`` (N, *spatial, C) and integer ``labels`` (N, *spatial) plus a
per-class weight vector ``alpha`` (C,).  Classes absent from the batch are
masked out of the loss, matching the reference's ``mask = onehot.sum()>0``
convention.

Intentional divergences from reference defects (SURVEY.md §7.4):
 * `losses.py:415` MutilSSLoss uses an undefined ``self.r`` and the wrong
   denominator for sensitivity — here r=0.1 and the background count is
   used, the intended SS formulation.
 * `losses.py:452` MutilTverskyLoss double-uses ``alpha`` and never sets
   beta — here the Tversky (0.3, 0.7) constants are separate from the
   per-class weights, and the loss is (1 - tversky) rather than the
   reference's bare negative.
 * `losses.py:288` MutilDiceLoss returns the *negative* weighted dice (not
   1-dice); that exact semantic is kept because the trainer's loss curves
   and best-model selection depend on it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

SMOOTH = 1e-5
EPS = 1e-7


def _one_hot_ncx(logits, labels):
    """Return (probs, one-hot, present-mask) flattened to (N, X, C)."""
    c = logits.shape[-1]
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).reshape(
        logits.shape[0], -1, c
    )
    oh = jax.nn.one_hot(labels.reshape(labels.shape[0], -1), c, dtype=jnp.float32)
    present = jnp.sum(oh, axis=(0, 1)) > 0
    return p, oh, present


def _alpha(alpha, c):
    if alpha is None:
        return jnp.ones((c,), jnp.float32)
    return jnp.asarray(alpha, jnp.float32)


def cross_entropy_loss(logits, labels, alpha=None):
    """`losses.py:247` MutilCrossEntropyLoss: CE with present-class weights
    (torch weighted-mean semantics: sum(w_y·nll)/sum(w_y))."""
    c = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lab = labels.reshape(labels.shape[0], -1).astype(jnp.int32)
    logp = logp.reshape(logits.shape[0], -1, c)
    oh = jax.nn.one_hot(lab, c, dtype=jnp.float32)
    present = (jnp.sum(oh, axis=(0, 1)) > 0).astype(jnp.float32)
    nll = -jnp.sum(oh * logp, axis=-1)
    w = present[lab]
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), EPS)


def focal_loss(logits, labels, alpha=None, gamma: float = 2.0):
    """`losses.py:263` MutilFocalLoss: (1-pt)^γ · CE with present-class
    weights, mean over pixels."""
    c = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lab = labels.reshape(labels.shape[0], -1).astype(jnp.int32)
    logp = logp.reshape(logits.shape[0], -1, c)
    oh = jax.nn.one_hot(lab, c, dtype=jnp.float32)
    present = (jnp.sum(oh, axis=(0, 1)) > 0).astype(jnp.float32)
    nll = -jnp.sum(oh * logp, axis=-1) * present[lab]
    pt = jnp.exp(-nll)
    return jnp.mean((1.0 - pt) ** gamma * nll)


def dice_loss(logits, labels, alpha=None):
    """`losses.py:288` MutilDiceLoss: negative weighted mean of per-class
    generalized dice over present classes."""
    p, oh, present = _one_hot_ncx(logits, labels)
    a = _alpha(alpha, p.shape[-1])
    inter = jnp.sum(oh * p, axis=(0, 1))
    denom = jnp.sum(oh + p, axis=(0, 1))
    dice = jnp.maximum((2.0 * inter + SMOOTH) / (denom + SMOOTH), EPS)
    loss = -dice * present.astype(jnp.float32) * a
    return jnp.sum(loss) / jnp.maximum(jnp.sum(present), 1)


def ce_dice_loss(logits, labels, alpha=None):
    """`losses.py:328` MutilCrossEntropyDiceLoss."""
    return cross_entropy_loss(logits, labels, alpha) + dice_loss(logits, labels, alpha)


def el_dice_loss(logits, labels, alpha=None):
    """`losses.py:345` MutilELDiceLoss: (-log(w·dice))^0.3 averaged over
    present classes, clipped to [0,2]."""
    p, oh, present = _one_hot_ncx(logits, labels)
    a = _alpha(alpha, p.shape[-1])
    inter = jnp.sum(oh * p, axis=(0, 1))
    denom = jnp.sum(oh + p, axis=(0, 1))
    dice = jnp.maximum((2.0 * inter + SMOOTH) / (denom + SMOOTH), EPS)
    dice = dice * present.astype(jnp.float32) * a
    val = jnp.sum(jnp.power(-jnp.log(dice + SMOOTH), 0.3) * present) / jnp.maximum(
        jnp.sum(present), 1
    )
    return jnp.clip(val, 0.0, 2.0)


def ss_loss(logits, labels, alpha=None, r: float = 0.1):
    """`losses.py:385` MutilSSLoss (intended semantics; see module doc)."""
    p, oh, present = _one_hot_ncx(logits, labels)
    a = _alpha(alpha, p.shape[-1])
    bg = 1.0 - oh
    sq = (oh - p) ** 2
    fg_part = jnp.sum(sq * oh, axis=(0, 1)) / (jnp.sum(oh, axis=(0, 1)) + SMOOTH)
    bg_part = jnp.sum(sq * bg, axis=(0, 1)) / (jnp.sum(bg, axis=(0, 1)) + SMOOTH)
    ss = (r * fg_part + (1.0 - r) * bg_part) * present.astype(jnp.float32) * a
    return jnp.sum(ss) / jnp.maximum(jnp.sum(present), 1)


def tversky_loss(
    logits, labels, alpha=None, tversky_alpha: float = 0.3, tversky_beta: float = 0.7
):
    """`losses.py:421` MutilTverskyLoss (intended semantics; see module doc)."""
    p, oh, present = _one_hot_ncx(logits, labels)
    a = _alpha(alpha, p.shape[-1])
    tp = jnp.sum(p * oh, axis=(0, 1))
    fp = jnp.sum(p * (1 - oh), axis=(0, 1))
    fn = jnp.sum((1 - p) * oh, axis=(0, 1))
    tv = (tp + SMOOTH) / (tp + tversky_alpha * fp + tversky_beta * fn + SMOOTH)
    loss = (1.0 - tv) * present.astype(jnp.float32) * a
    return jnp.sum(loss) / jnp.maximum(jnp.sum(present), 1)
