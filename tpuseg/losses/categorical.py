"""Multiclass segmentation losses (channels-last logits, integer labels).

Capability parity with `/root/reference/model/losses.py:247-473`.  All take
``logits`` (N, *spatial, C) and integer ``labels`` (N, *spatial) plus a
per-class weight vector ``alpha`` (C,).  Classes absent from the batch are
masked out of the loss, matching the reference's ``mask = onehot.sum()>0``
convention.

TPU-native formulation: the reference materializes a one-hot label tensor
(`losses.py:252` F.one_hot) and contracts against it.  Round 1 replaced
that with gather (take_along_axis) + segment_sum over integer labels;
round 2 MEASURED that formulation at ~38 ms for one dice loss+grad at
128×112×112×5 — TPU lowers scatters ~100× below memory speed.  The
current formulation is compare-and-reduce: per-class statistics contract
against `labels == k` comparisons that XLA fuses straight into the
reductions (no scatter, no gather, and the one-hot is never materialized
in HBM).  Numerically identical — the golden unit tests compare against
one-hot oracles.

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


def _flat(logits, labels):
    c = logits.shape[-1]
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).reshape(-1, c)
    y = labels.reshape(-1).astype(jnp.int32)
    return p, y, c


def _oh(y, c):
    """Compare-based one-hot: XLA fuses the compare into consuming
    reductions, so this never materializes in HBM (unlike scatter/gather,
    which lower pathologically slowly on TPU — BASELINE.md round 2)."""
    return (y[:, None] == jnp.arange(c, dtype=y.dtype)[None, :]).astype(
        jnp.float32
    )


def _class_sum(vals, y, c):
    """Per-class sums of per-voxel values — the segment_sum replacement."""
    return jnp.sum(vals[:, None] * _oh(y, c), axis=0)


def _per_class_stats(p, y, c):
    """(inter, col_sum, count, present): inter[k]=Σ_{y=k} p[v,k],
    col_sum[k]=Σ_v p[v,k], count[k]=|{y=k}| — no one-hot materialized."""
    oh = _oh(y, c)
    inter = jnp.sum(p * oh, axis=0)
    col_sum = jnp.sum(p, axis=0)
    count = jnp.sum(oh, axis=0)
    present = count > 0
    return inter, col_sum, count, present


def _alpha(alpha, c):
    if alpha is None:
        return jnp.ones((c,), jnp.float32)
    return jnp.asarray(alpha, jnp.float32)


def cross_entropy_loss(logits, labels, alpha=None):
    """`losses.py:247` MutilCrossEntropyLoss: CE with present-class weights
    (torch weighted-mean semantics: sum(w_y·nll)/sum(w_y))."""
    c = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1).reshape(-1, c)
    y = labels.reshape(-1).astype(jnp.int32)
    oh = _oh(y, c)
    nll = -jnp.sum(logp * oh, axis=1)
    count = jnp.sum(oh, axis=0)
    present = (count > 0).astype(jnp.float32)
    w = present[y]
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), EPS)


def focal_loss(logits, labels, alpha=None, gamma: float = 2.0):
    """`losses.py:263` MutilFocalLoss: (1-pt)^γ · CE with present-class
    weights, mean over pixels."""
    c = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1).reshape(-1, c)
    y = labels.reshape(-1).astype(jnp.int32)
    oh = _oh(y, c)
    nll = -jnp.sum(logp * oh, axis=1)
    count = jnp.sum(oh, axis=0)
    present = (count > 0).astype(jnp.float32)
    nll = nll * present[y]
    pt = jnp.exp(-nll)
    return jnp.mean((1.0 - pt) ** gamma * nll)


def dice_loss(logits, labels, alpha=None):
    """`losses.py:288` MutilDiceLoss: negative weighted mean of per-class
    generalized dice over present classes."""
    p, y, c = _flat(logits, labels)
    a = _alpha(alpha, c)
    inter, col_sum, count, present = _per_class_stats(p, y, c)
    denom = col_sum + count
    dice = jnp.maximum((2.0 * inter + SMOOTH) / (denom + SMOOTH), EPS)
    loss = -dice * present.astype(jnp.float32) * a
    return jnp.sum(loss) / jnp.maximum(jnp.sum(present), 1)


def ce_dice_loss(logits, labels, alpha=None):
    """`losses.py:328` MutilCrossEntropyDiceLoss."""
    return cross_entropy_loss(logits, labels, alpha) + dice_loss(logits, labels, alpha)


def el_dice_loss(logits, labels, alpha=None):
    """`losses.py:345` MutilELDiceLoss: (-log(w·dice))^0.3 averaged over
    present classes, clipped to [0,2]."""
    p, y, c = _flat(logits, labels)
    a = _alpha(alpha, c)
    inter, col_sum, count, present = _per_class_stats(p, y, c)
    denom = col_sum + count
    dice = jnp.maximum((2.0 * inter + SMOOTH) / (denom + SMOOTH), EPS)
    dice = dice * present.astype(jnp.float32) * a
    val = jnp.sum(
        jnp.power(-jnp.log(dice + SMOOTH), 0.3) * present
    ) / jnp.maximum(jnp.sum(present), 1)
    return jnp.clip(val, 0.0, 2.0)


def ss_loss(logits, labels, alpha=None, r: float = 0.1):
    """`losses.py:385` MutilSSLoss (intended semantics; see module doc).

    Σ(oh−p)²·oh per class = Σ_{y=k}(1−p_k)²; Σ(oh−p)²·(1−oh) per class =
    Σ_v p_k² − Σ_{y=k} p_k² — gathered, not one-hot."""
    p, y, c = _flat(logits, labels)
    a = _alpha(alpha, c)
    oh = _oh(y, c)
    p_true = jnp.sum(p * oh, axis=1)
    count = jnp.sum(oh, axis=0)
    present = count > 0
    fg_err = _class_sum((1.0 - p_true) ** 2, y, c)
    sq_col = jnp.sum(p ** 2, axis=0)
    sq_true = _class_sum(p_true ** 2, y, c)
    bg_err = sq_col - sq_true
    n = p.shape[0]
    fg_part = fg_err / (count + SMOOTH)
    bg_part = bg_err / ((n - count) + SMOOTH)
    ss = (r * fg_part + (1.0 - r) * bg_part) * present.astype(jnp.float32) * a
    return jnp.sum(ss) / jnp.maximum(jnp.sum(present), 1)


def tversky_loss(
    logits, labels, alpha=None, tversky_alpha: float = 0.3, tversky_beta: float = 0.7
):
    """`losses.py:421` MutilTverskyLoss (intended semantics; see module doc)."""
    p, y, c = _flat(logits, labels)
    a = _alpha(alpha, c)
    tp, col_sum, count, present = _per_class_stats(p, y, c)
    fp = col_sum - tp
    fn = count - tp
    tv = (tp + SMOOTH) / (tp + tversky_alpha * fp + tversky_beta * fn + SMOOTH)
    loss = (1.0 - tv) * present.astype(jnp.float32) * a
    return jnp.sum(loss) / jnp.maximum(jnp.sum(present), 1)
