"""Categorical losses on CLASS-MAJOR space-to-depth-packed logits.

The fine-domain categorical losses (losses/categorical.py) and the
delta-major packed-grid path both end up with K classes on the minor
dim (K<=5 of 128 lanes), which is the same lane-starved layout the r4
head fix removed from inference (models/vnet_packed.py pack_head_1x1).
Here every loss consumes the packed logits in CLASS-major channel order
(k*8 + delta) plus the delta-major packed int labels (N, d, h, w, 8)
(models/unet_packed.py space_to_depth_labels): softmax, one-hot
compares, and all per-class statistics are contiguous 8-channel slice
arithmetic on the (..., 8K) tensor — no (..., K) reshape anywhere, and
the depth-to-space pair drops out of the train graph.

Numerics: identical formulas to losses/categorical.py (max-subtracted
softmax, SMOOTH/EPS constants, present-class masking) — equal up to
float reassociation of the reductions; pinned by
tests/test_packed_class_losses.py against the fine-domain values.

Reference anchor: `/root/reference/model/losses.py:247-473` via the
fine-domain implementations these mirror.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpuseg.losses.categorical import EPS, SMOOTH, _alpha

P = 8  # space-to-depth factor (2^3)


def _softmax_slices(logitsp, c):
    """Class-major packed logits (..., P*c) -> per-class f32 slices plus
    max-subtracted exp/sum (the jax.nn.softmax formulation, sliced)."""
    lg = logitsp.astype(jnp.float32)
    ls = [lg[..., k * P:(k + 1) * P] for k in range(c)]
    m = ls[0]
    for l in ls[1:]:
        m = jnp.maximum(m, l)
    exps = [jnp.exp(l - m) for l in ls]
    s = exps[0]
    for e in exps[1:]:
        s = s + e
    return ls, m, exps, s


def _probs_slices(logitsp, c):
    ls, _, exps, s = _softmax_slices(logitsp, c)
    inv = 1.0 / s
    return [e * inv for e in exps]


def _y(lb8, k):
    return (lb8 == k).astype(jnp.float32)


def _per_class_stats_packed(logitsp, lb8, c):
    """(inter, col_sum, count, present) per class — the packed twin of
    categorical._per_class_stats."""
    ps = _probs_slices(logitsp, c)
    inter = jnp.stack([jnp.sum(ps[k] * _y(lb8, k)) for k in range(c)])
    col_sum = jnp.stack([jnp.sum(ps[k]) for k in range(c)])
    count = jnp.stack([jnp.sum(_y(lb8, k)) for k in range(c)])
    return inter, col_sum, count, count > 0


def _nll(logitsp, lb8, c):
    """Per-voxel -log softmax at the label class, (..., P)."""
    ls, m, _, s = _softmax_slices(logitsp, c)
    log_z = m + jnp.log(s)
    picked = _y(lb8, 0) * ls[0]
    for k in range(1, c):
        picked = picked + _y(lb8, k) * ls[k]
    return log_z - picked


def cross_entropy_loss(logitsp, lb8, alpha=None, num_classes=None):
    c = num_classes or logitsp.shape[-1] // P
    nll = _nll(logitsp, lb8, c)
    present = jnp.stack(
        [(jnp.sum(_y(lb8, k)) > 0).astype(jnp.float32) for k in range(c)]
    )
    w = present[0] * _y(lb8, 0)
    for k in range(1, c):
        w = w + present[k] * _y(lb8, k)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), EPS)


def focal_loss(logitsp, lb8, alpha=None, gamma: float = 2.0,
               num_classes=None):
    c = num_classes or logitsp.shape[-1] // P
    nll = _nll(logitsp, lb8, c)
    present = jnp.stack(
        [(jnp.sum(_y(lb8, k)) > 0).astype(jnp.float32) for k in range(c)]
    )
    w = present[0] * _y(lb8, 0)
    for k in range(1, c):
        w = w + present[k] * _y(lb8, k)
    nll = nll * w
    pt = jnp.exp(-nll)
    return jnp.mean((1.0 - pt) ** gamma * nll)


def dice_loss(logitsp, lb8, alpha=None, num_classes=None):
    c = num_classes or logitsp.shape[-1] // P
    a = _alpha(alpha, c)
    inter, col_sum, count, present = _per_class_stats_packed(logitsp, lb8, c)
    denom = col_sum + count
    dice = jnp.maximum((2.0 * inter + SMOOTH) / (denom + SMOOTH), EPS)
    loss = -dice * present.astype(jnp.float32) * a
    return jnp.sum(loss) / jnp.maximum(jnp.sum(present), 1)


def ce_dice_loss(logitsp, lb8, alpha=None, num_classes=None):
    return cross_entropy_loss(logitsp, lb8, alpha, num_classes) + dice_loss(
        logitsp, lb8, alpha, num_classes
    )


def el_dice_loss(logitsp, lb8, alpha=None, num_classes=None):
    c = num_classes or logitsp.shape[-1] // P
    a = _alpha(alpha, c)
    inter, col_sum, count, present = _per_class_stats_packed(logitsp, lb8, c)
    denom = col_sum + count
    dice = jnp.maximum((2.0 * inter + SMOOTH) / (denom + SMOOTH), EPS)
    dice = dice * present.astype(jnp.float32) * a
    val = jnp.sum(
        jnp.power(-jnp.log(dice + SMOOTH), 0.3) * present
    ) / jnp.maximum(jnp.sum(present), 1)
    return jnp.clip(val, 0.0, 2.0)


def ss_loss(logitsp, lb8, alpha=None, r: float = 0.1, num_classes=None):
    c = num_classes or logitsp.shape[-1] // P
    a = _alpha(alpha, c)
    ps = _probs_slices(logitsp, c)
    p_true = _y(lb8, 0) * ps[0]
    for k in range(1, c):
        p_true = p_true + _y(lb8, k) * ps[k]
    count = jnp.stack([jnp.sum(_y(lb8, k)) for k in range(c)])
    present = count > 0
    fg_err = jnp.stack(
        [jnp.sum(_y(lb8, k) * (1.0 - p_true) ** 2) for k in range(c)]
    )
    sq_col = jnp.stack([jnp.sum(ps[k] ** 2) for k in range(c)])
    sq_true = jnp.stack(
        [jnp.sum(_y(lb8, k) * p_true ** 2) for k in range(c)]
    )
    bg_err = sq_col - sq_true
    n = float(int(jnp.size(lb8)))
    fg_part = fg_err / (count + SMOOTH)
    bg_part = bg_err / ((n - count) + SMOOTH)
    ss = (r * fg_part + (1.0 - r) * bg_part) * present.astype(jnp.float32) * a
    return jnp.sum(ss) / jnp.maximum(jnp.sum(present), 1)


def tversky_loss(logitsp, lb8, alpha=None, tversky_alpha: float = 0.3,
                 tversky_beta: float = 0.7, num_classes=None):
    c = num_classes or logitsp.shape[-1] // P
    a = _alpha(alpha, c)
    tp, col_sum, count, present = _per_class_stats_packed(logitsp, lb8, c)
    fp = col_sum - tp
    fn = count - tp
    tv = (tp + SMOOTH) / (tp + tversky_alpha * fp + tversky_beta * fn + SMOOTH)
    loss = (1.0 - tv) * present.astype(jnp.float32) * a
    return jnp.sum(loss) / jnp.maximum(jnp.sum(present), 1)


def build_packed_loss(name: str, num_classes: int, alpha=None,
                      gamma: float = 2.0):
    """Packed-class-major twin of losses.build_loss for the categorical
    names the packed-grid trainer path supports; returns None for
    unsupported names (caller falls back to the fine-domain loss)."""
    cat_map = {
        "MutilCrossEntropyLoss": cross_entropy_loss,
        "MutilDiceLoss": dice_loss,
        "MutilCrossEntropyDiceLoss": ce_dice_loss,
        "MutilELDiceLoss": el_dice_loss,
        "MutilSSLoss": ss_loss,
        "MutilTverskyLoss": tversky_loss,
    }
    if name in cat_map:
        return partial(cat_map[name], alpha=alpha, num_classes=num_classes)
    if name == "MutilFocalLoss":
        return partial(focal_loss, alpha=alpha, gamma=gamma,
                       num_classes=num_classes)
    return None


# --------------------------------------------------------------------------
# packed online metrics (the per-step accuracy the trainer logs)
# --------------------------------------------------------------------------


def multiclass_dice_coeff(probsp, lb8, threshold: float = 0.5,
                          num_classes=None):
    """Packed class-major twin of metrics.online.multiclass_dice_coeff:
    mean over foreground classes of per-sample hard dice."""
    c = num_classes or probsp.shape[-1] // P
    n = probsp.shape[0]
    pr = probsp.astype(jnp.float32)
    dices = []
    for k in range(1, c):
        pk = (pr[..., k * P:(k + 1) * P] > threshold).astype(jnp.float32)
        tk = _y(lb8, k)
        pk = pk.reshape(n, -1)
        tk = tk.reshape(n, -1)
        inter = jnp.sum(pk * tk, axis=1)
        dice = (2.0 * inter + SMOOTH) / (
            jnp.sum(pk, axis=1) + jnp.sum(tk, axis=1) + SMOOTH
        )
        dices.append(jnp.mean(dice))
    return jnp.mean(jnp.stack(dices))


def multiclass_iou_coeff(probsp, lb8, threshold: float = 0.5,
                         num_classes=None):
    c = num_classes or probsp.shape[-1] // P
    n = probsp.shape[0]
    pr = probsp.astype(jnp.float32)
    ious = []
    for k in range(1, c):
        pk = (pr[..., k * P:(k + 1) * P] > threshold).astype(jnp.float32)
        tk = _y(lb8, k)
        pk = pk.reshape(n, -1)
        tk = tk.reshape(n, -1)
        inter = jnp.sum(pk * tk, axis=1)
        union = jnp.sum(pk, axis=1) + jnp.sum(tk, axis=1) - inter
        ious.append(jnp.mean((inter + SMOOTH) / (union + SMOOTH)))
    return jnp.mean(jnp.stack(ious))
