"""Online (per-step, on-device) metrics.

Capability parity with `/root/reference/model/metric.py:146-268`: binary
and multiclass dice/IoU at threshold 0.5, classification accuracy, MSE /
NRMSE.  All take channels-last probabilities (N, *spatial, C) and stay on
device as scalars — the reference pulls every metric to host per batch
(`modelUnet.py:881`); tpuseg accumulates them inside the jitted step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

SMOOTH = 1e-5
EPS = 1e-7


def dice_coeff(probs, targets, threshold: float = 0.5):
    """`metric.py:146`: per-sample hard dice, averaged over batch."""
    n = targets.shape[0]
    p = (probs > threshold).astype(jnp.float32).reshape(n, -1)
    t = targets.astype(jnp.float32).reshape(n, -1)
    inter = jnp.sum(p * t, axis=1)
    dice = (2.0 * inter + SMOOTH) / (jnp.sum(p, axis=1) + jnp.sum(t, axis=1) + SMOOTH)
    return jnp.mean(dice)


def iou_coeff(probs, targets, threshold: float = 0.5):
    """`metric.py:158`: per-sample hard IoU, averaged over batch."""
    n = targets.shape[0]
    p = (probs > threshold).astype(jnp.float32).reshape(n, -1)
    t = targets.astype(jnp.float32).reshape(n, -1)
    inter = jnp.sum(p * t, axis=1)
    union = jnp.sum(p, axis=1) + jnp.sum(t, axis=1) - inter
    return jnp.mean((inter + SMOOTH) / (union + SMOOTH))


def multiclass_dice_coeff(probs, labels, threshold: float = 0.5):
    """`metric.py:170`: mean over foreground classes of per-class hard dice
    against the one-hot label."""
    c = probs.shape[-1]
    oh = jax.nn.one_hot(labels.astype(jnp.int32), c, dtype=jnp.float32)

    def per_class(cls):
        return dice_coeff(probs[..., cls], oh[..., cls], threshold)

    dices = jax.vmap(per_class)(jnp.arange(1, c))
    return jnp.mean(dices)


def multiclass_dice_coeff_v2(probs, labels):
    """`metric.py:184`: soft per-class generalized dice over present
    foreground classes."""
    c = probs.shape[-1]
    p = probs.astype(jnp.float32).reshape(probs.shape[0], -1, c)[..., 1:]
    oh = jax.nn.one_hot(
        labels.reshape(labels.shape[0], -1).astype(jnp.int32), c, dtype=jnp.float32
    )[..., 1:]
    inter = jnp.sum(oh * p, axis=(0, 1))
    denom = jnp.sum(oh + p, axis=(0, 1))
    dice = jnp.maximum((2.0 * inter + SMOOTH) / (denom + SMOOTH), EPS)
    present = jnp.sum(oh, axis=(0, 1)) > 0
    dice = dice * present.astype(jnp.float32)
    return jnp.sum(dice) / jnp.maximum(jnp.sum(present), 1)


def multiclass_iou_coeff_v2(probs, labels):
    """`metric.py:218` multiclass_iou_coeffv2: soft per-class IoU over
    present foreground classes (the IoU analog of `multiclass_dice_coeff_v2`).

    Divergence (DIVERGENCES.md): the reference reduces over dim 1 — the
    *channel* axis of its (B, C-1, HW) tensors — leaving a (B, HW) map that
    it then multiplies by a (C-1,) class-presence mask, which only
    broadcasts when HW == C-1; the intended reduction (matching its own
    v2 dice at `metric.py:184`) is over (batch, spatial) per class, which
    is what this implements.
    """
    c = probs.shape[-1]
    p = probs.astype(jnp.float32).reshape(probs.shape[0], -1, c)[..., 1:]
    oh = jax.nn.one_hot(
        labels.reshape(labels.shape[0], -1).astype(jnp.int32), c, dtype=jnp.float32
    )[..., 1:]
    inter = jnp.sum(oh * p, axis=(0, 1))
    union = jnp.sum(oh, axis=(0, 1)) + jnp.sum(p, axis=(0, 1)) - inter
    iou = jnp.maximum((inter + SMOOTH) / (union + SMOOTH), EPS)
    present = jnp.sum(oh, axis=(0, 1)) > 0
    iou = iou * present.astype(jnp.float32)
    return jnp.sum(iou) / jnp.maximum(jnp.sum(present), 1)


def multiclass_iou_coeff(probs, labels, threshold: float = 0.5):
    """`metric.py:204`: mean over foreground classes of per-class hard IoU."""
    c = probs.shape[-1]
    oh = jax.nn.one_hot(labels.astype(jnp.int32), c, dtype=jnp.float32)

    def per_class(cls):
        return iou_coeff(probs[..., cls], oh[..., cls], threshold)

    ious = jax.vmap(per_class)(jnp.arange(1, c))
    return jnp.mean(ious)


def accuracy(pred_labels, true_labels):
    """`metric.py:240` calc_accuracy."""
    return jnp.mean((pred_labels == true_labels).astype(jnp.float32))


def mse(pred, target):
    """`metric.py:246` calc_mse."""
    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def nrmse(pred, target):
    """`metric.py:254` calc_nrmse: RMSE normalized by per-sample range."""
    n = target.shape[0]
    p = pred.astype(jnp.float32).reshape(n, -1)
    t = target.astype(jnp.float32).reshape(n, -1)
    rmse = jnp.sqrt(jnp.mean((p - t) ** 2))
    rng = jnp.max(t, axis=1) - jnp.min(t, axis=1) + EPS
    return jnp.mean(rmse / rng)


def psnr(pred, target, mean=None, std=None):
    """`metric.py:271` calc_psnr: de-normalized per-sample PSNR."""
    n = target.shape[0]
    p = pred.astype(jnp.float32).reshape(n, -1)
    t = target.astype(jnp.float32).reshape(n, -1)
    if std is not None:
        s = jnp.asarray(std, jnp.float32).reshape(n, 1)
        m = jnp.asarray(mean, jnp.float32).reshape(n, 1)
    else:
        s = jnp.ones((n, 1), jnp.float32)
        m = jnp.zeros((n, 1), jnp.float32)
    mse_b = jnp.mean((p * s - t * s) ** 2, axis=1)
    peak = jnp.max(t * s + m, axis=1)
    # EPS inside the division: a zero-MSE batch gives a large finite PSNR
    # instead of inf poisoning the epoch mean used for best-ckpt selection
    return jnp.mean(10.0 * jnp.log10(peak ** 2 / (mse_b + EPS)))
