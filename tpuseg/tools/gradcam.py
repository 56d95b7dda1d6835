"""Grad-CAM explainability for tpuseg classifiers.

Capability parity with `/root/reference/model/visualization.py:65-239`
(ActivationsAndGradients + GradCAM, wired in `modelResNet.py:419-426`
Grad_CAM_Visual): class-activation heatmaps from the last conv feature
map.  torch's forward/backward hooks become flax's functional
equivalents — `sow` for activations and `perturb` for their gradients —
so the whole thing runs inside one jit-able computation.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def grad_cam(model, params, image_chlast: np.ndarray, target_class: Optional[int] = None):
    """Return a [0,1] CAM heatmap at input resolution.

    `model` must expose a ``perturb("cam_features", x)`` + matching ``sow``
    at the target layer (tpuseg.models.resnet.ResNetClassifier does).
    `image_chlast`: (1, *spatial, C).
    """
    x = jnp.asarray(image_chlast, jnp.float32)

    # activations via intermediates
    logits, variables = model.apply(
        params, x, mutable=["intermediates"], capture_intermediates=False
    )
    if isinstance(logits, tuple):
        logits = logits[0]
    acts = variables["intermediates"]["cam_features"][0]  # (1, *spatial', C')

    cls = int(target_class) if target_class is not None else int(jnp.argmax(logits[0]))

    # gradients of the class score w.r.t. the feature map via perturbations
    zero_pert = {"cam_features": jnp.zeros_like(acts)}

    def score(pert):
        out = model.apply({**params, "perturbations": pert}, x)
        if isinstance(out, tuple):
            out = out[0]
        if out.shape[-1] == 1:
            return out[0, 0]
        return out[0, cls]

    grads = jax.grad(score)(zero_pert)["cam_features"]

    spatial_axes = tuple(range(1, acts.ndim - 1))
    weights = jnp.mean(grads, axis=spatial_axes, keepdims=True)  # GAP of grads
    cam = jax.nn.relu(jnp.sum(weights * acts, axis=-1))[0]  # (*spatial')
    cam = cam / (jnp.max(cam) + 1e-8)
    # upsample to input resolution
    cam = jax.image.resize(cam, x.shape[1:-1], method="linear")
    return np.asarray(cam)


def overlay_cam(image_gray: np.ndarray, cam: np.ndarray, alpha: float = 0.4):
    """Blend heatmap over a grayscale image → BGR uint8 (for cv2.imwrite),
    the reference's show_cam_on_image equivalent."""
    import cv2

    img = image_gray.astype(np.float32)
    img = (img - img.min()) / (img.max() - img.min() + 1e-8)
    heat = cv2.applyColorMap((cam * 255).astype(np.uint8), cv2.COLORMAP_JET)
    base = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_GRAY2BGR)
    return cv2.addWeighted(heat, alpha, base, 1 - alpha, 0)
