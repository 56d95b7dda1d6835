"""Loss registry — string-name selection with reference-compatible names.

The reference selects losses by ``loss_name`` string in per-class if-chains
(`/root/reference/model/modelUnet.py:69-77`, `:816-822`).  tpuseg keeps the
same names in one registry; every entry is a ``fn(logits, labels, **cfg)``
scalar loss, closed over hyperparameters (alpha / gamma) at build time.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax

from tpuseg.losses import binary, categorical, cldice, lovasz, ssim  # noqa: F401
from tpuseg.losses.ssim import ssim_loss, ms_ssim  # noqa: F401


def build_loss(
    name: str,
    num_classes: int = 1,
    alpha=None,
    gamma: float = 2.0,
) -> Callable:
    """Build loss fn(logits, labels) from a reference-compatible name."""
    binary_map = {
        "BinaryDiceLoss": binary.dice_loss,
        "BinaryJaccardLoss": binary.jaccard_loss,
        "BinaryELDiceLoss": binary.el_dice_loss,
        "BinarySSLoss": binary.ss_loss,
        "BinaryTverskyLoss": binary.tversky_loss,
        "BinaryCrossEntropyLoss": binary.bce_with_logits,
        "BinaryCrossEntropyDiceLoss": binary.bce_dice_loss,
        "MCCLoss": binary.mcc_loss,
    }
    if name in binary_map:
        return binary_map[name]
    if name == "BinaryFocalLoss":
        a = 0.25 if alpha is None else float(alpha) if not isinstance(alpha, (list, tuple)) else 0.25
        return partial(binary.focal_loss, alpha=a, gamma=gamma)
    if name == "BinaryLovaszLoss":
        return lovasz.lovasz_hinge
    if name == "BinaryClDiceLoss":
        return lambda logits, t: cldice.binary_cldice_loss(jax.nn.sigmoid(logits), t)

    cat_map = {
        "MutilCrossEntropyLoss": categorical.cross_entropy_loss,
        "MutilDiceLoss": categorical.dice_loss,
        "MutilCrossEntropyDiceLoss": categorical.ce_dice_loss,
        "MutilELDiceLoss": categorical.el_dice_loss,
        "MutilSSLoss": categorical.ss_loss,
        "MutilTverskyLoss": categorical.tversky_loss,
    }
    if name in cat_map:
        return partial(cat_map[name], alpha=alpha)
    if name == "MutilFocalLoss":
        return partial(categorical.focal_loss, alpha=alpha, gamma=gamma)
    if name == "LovaszLoss":
        return lovasz.lovasz_softmax
    if name == "MutilClDiceLoss":
        return lambda logits, t: cldice.multiclass_cldice_loss(
            jax.nn.softmax(logits, axis=-1), t, alpha=alpha
        )
    raise KeyError(f"unknown loss name: {name!r}")


LOSS_NAMES = [
    "BinaryDiceLoss", "BinaryJaccardLoss", "BinaryELDiceLoss", "BinarySSLoss",
    "BinaryTverskyLoss", "BinaryCrossEntropyLoss", "BinaryCrossEntropyDiceLoss",
    "BinaryFocalLoss", "BinaryLovaszLoss", "BinaryClDiceLoss", "MCCLoss",
    "MutilCrossEntropyLoss", "MutilDiceLoss", "MutilCrossEntropyDiceLoss",
    "MutilELDiceLoss", "MutilSSLoss", "MutilTverskyLoss", "MutilFocalLoss",
    "LovaszLoss", "MutilClDiceLoss",
]
