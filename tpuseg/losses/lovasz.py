"""Lovasz hinge / softmax losses in pure JAX.

Capability parity with `/root/reference/model/lovasz.py` (Berman 2018).
The sort-based Lovasz extension maps cleanly onto XLA: jnp.sort /
take_along_axis / cumsum are all fusable; no data-dependent shapes.

``ignore_index`` (the reference filters those pixels out, which would be a
dynamic shape) is handled with a validity weight: ignored pixels get error
-1e9 so they sort to the tail and contribute zero, leaving the valid
prefix's cumulative sums untouched.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _lovasz_grad(gt_sorted):
    """`lovasz.py:21`: gradient of the Lovasz extension w.r.t. sorted errors."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / union
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def _hinge_flat(logits, labels, valid):
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    errors = jnp.where(valid, errors, -1e9)
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    gt_sorted = jnp.where(valid, labels, 0.0)[order]
    grad = _lovasz_grad(gt_sorted)
    return jnp.sum(jax.nn.relu(errors_sorted) * grad)


def lovasz_hinge(
    logits, labels, per_image: bool = False, ignore_index: Optional[int] = None
):
    """`lovasz.py:35` binary Lovasz hinge.  logits/labels: (N, *spatial[, 1])."""
    lg = logits.astype(jnp.float32).reshape(logits.shape[0], -1)
    lb = labels.astype(jnp.float32).reshape(labels.shape[0], -1)
    lb = lb[:, : lg.shape[1]] if lb.shape[1] != lg.shape[1] else lb
    if ignore_index is None:
        valid = jnp.ones_like(lb, bool)
    else:
        valid = lb != ignore_index
    if per_image:
        return jnp.mean(jax.vmap(_hinge_flat)(lg, lb, valid))
    return _hinge_flat(lg.reshape(-1), lb.reshape(-1), valid.reshape(-1))


def _softmax_flat(probas, labels, valid, class_seen_weight):
    """probas (P, C), labels (P,) int."""
    c = probas.shape[-1]

    def per_class(cls):
        fg = jnp.where(valid, (labels == cls).astype(jnp.float32), 0.0)
        errors = jnp.abs(fg - probas[:, cls])
        errors = jnp.where(valid, errors, -1e9)
        order = jnp.argsort(-errors)
        loss_c = jnp.sum(
            jax.nn.relu(errors[order]) * _lovasz_grad(fg[order])
        )
        present = jnp.sum(fg) > 0
        return loss_c, present

    losses, present = jax.vmap(per_class)(jnp.arange(c))
    w = jnp.where(class_seen_weight, present.astype(jnp.float32), 1.0)
    return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)


def lovasz_softmax(
    logits,
    labels,
    per_image: bool = False,
    ignore_index: Optional[int] = None,
    classes: str = "present",
):
    """`lovasz.py:90` multiclass Lovasz-softmax.

    logits: (N, *spatial, C) (softmax applied here); labels: (N, *spatial).
    """
    c = logits.shape[-1]
    probas = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).reshape(
        logits.shape[0], -1, c
    )
    lab = labels.reshape(labels.shape[0], -1).astype(jnp.int32)
    if ignore_index is None:
        valid = jnp.ones_like(lab, bool)
    else:
        valid = lab != ignore_index
    seen = classes == "present"
    if per_image:
        fn = partial(_softmax_flat, class_seen_weight=seen)
        return jnp.mean(jax.vmap(fn)(probas, lab, valid))
    return _softmax_flat(
        probas.reshape(-1, c), lab.reshape(-1), valid.reshape(-1), seen
    )
