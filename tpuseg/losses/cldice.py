"""Centerline-dice (clDice) losses for tubular/vessel segmentation.

Capability parity with `/root/reference/model/lossescldice.py`, with the
reference's defects not reproduced (SURVEY.md §7.4): its
``x.size().tolist()`` raises, its ``shape == 4`` comparison is always
False (making skeletonization a no-op), and its ``__int__`` typo leaves
smooth/eps unset.  Here the soft skeleton really runs, dispatched on the
actual rank of the input.

Soft skeletonization = iterated morphological thinning with min/max pools
(Shit et al., clDice, CVPR 2021) — pure reduce_window ops that XLA fuses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

SMOOTH_CL = 1.0
SMOOTH = 1e-5
EPS = 1e-7


def _pool(x, ndim: int, op):
    dims = (1,) + (3,) * ndim + (1,)
    strides = (1,) + (1,) * ndim + (1,)
    init = -jnp.inf if op is jax.lax.max else jnp.inf
    return jax.lax.reduce_window(x, init, op, dims, strides, "SAME")


def soft_skeletonize(x, iterations: int = 10):
    """Differentiable skeleton of (N, *spatial, C) soft masks."""
    ndim = x.ndim - 2

    def body(_, x):
        minp = _pool(x, ndim, jax.lax.min)
        contour = jax.nn.relu(_pool(minp, ndim, jax.lax.max) - minp)
        return jax.nn.relu(x - contour)

    return jax.lax.fori_loop(0, iterations, body, x)


def norm_intersection(center_line, vessel):
    """`lossescldice.py:24`: per-(N,C) normalized skeleton∩vessel."""
    axes = tuple(range(1, center_line.ndim - 1))
    inter = jnp.sum(center_line * vessel, axis=axes)
    return (inter + SMOOTH_CL) / (jnp.sum(center_line, axis=axes) + SMOOTH_CL)


def binary_cldice_loss(probs, targets, iterations: int = 10):
    """`lossescldice.py:37` Binary_Soft_cldice_loss — takes probabilities."""
    p = probs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    t = jnp.broadcast_to(t.reshape(t.shape + (1,) * (p.ndim - t.ndim)), p.shape)
    cl_pred = soft_skeletonize(p, iterations)
    t_skel = soft_skeletonize(t, iterations)
    iflat = norm_intersection(cl_pred, t)
    tflat = norm_intersection(t_skel, p)
    inter = iflat * tflat
    cldsc = (2.0 * jnp.sum(inter) + SMOOTH) / jnp.maximum(
        jnp.sum(iflat) + jnp.sum(tflat) + SMOOTH, EPS
    )
    return 1.0 - cldsc


def multiclass_cldice_loss(probs, labels, alpha=None, iterations: int = 10):
    """`lossescldice.py:62` Mutil_Soft_cldice_loss: per-class clDice
    weighted by alpha, averaged over channels."""
    c = probs.shape[-1]
    a = jnp.ones((c,), jnp.float32) if alpha is None else jnp.asarray(alpha, jnp.float32)
    oh = jax.nn.one_hot(labels.astype(jnp.int32), c, dtype=jnp.float32)

    def per_class(cls_probs, cls_true, w):
        return binary_cldice_loss(cls_probs[..., None], cls_true[..., None], iterations) * w

    losses = jax.vmap(per_class, in_axes=(-1, -1, 0))(probs, oh, a)
    return jnp.sum(losses) / c
