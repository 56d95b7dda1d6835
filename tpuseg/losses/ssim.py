"""SSIM / SSIM3D losses and metrics in pure JAX.

Capability parity with `/root/reference/model/lossesSSIM.py` (gaussian
window 11, σ=1.5, C1=0.01², C2=0.03²).  One implementation serves both the
GAN training loss and the validation metric — unlike the reference, which
duplicates the formula between lossesSSIM.py and skimage
(`metric.py:298`).

Layout: channels-last (N, *spatial, C).  The windowed means are depthwise
convolutions (feature_group_count=C), which XLA lowers to efficient TPU
convs; the gaussian window is separable but at 11^n taps the fused direct
conv is fine for the sizes involved.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _gaussian_window(window_size: int, sigma: float, ndim: int):
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma ** 2)
    )
    g = g / g.sum()
    w = g
    for _ in range(ndim - 1):
        w = np.multiply.outer(w, g)
    return jnp.asarray(w, jnp.float32)


def _depthwise_filter(x, window):
    """Depthwise SAME conv of (N, *spatial, C) with a shared window."""
    ndim = window.ndim
    c = x.shape[-1]
    # kernel layout HWIO-style: (*window, in_per_group=1, out=C)
    k = jnp.broadcast_to(window[..., None, None], window.shape + (1, c))
    dn = jax.lax.conv_dimension_numbers(
        x.shape, k.shape,
        ("NHWC", "HWIO", "NHWC") if ndim == 2 else ("NDHWC", "DHWIO", "NDHWC"),
    )
    return jax.lax.conv_general_dilated(
        x, k, (1,) * ndim, "SAME", dimension_numbers=dn, feature_group_count=c
    )


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5, size_average: bool = True):
    """SSIM of (N, *spatial, C) images; rank decides 2D vs 3D window."""
    ndim = img1.ndim - 2
    w = _gaussian_window(window_size, sigma, ndim)
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    mu1 = _depthwise_filter(x, w)
    mu2 = _depthwise_filter(y, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_filter(x * x, w) - mu1_sq
    sigma2_sq = _depthwise_filter(y * y, w) - mu2_sq
    sigma12 = _depthwise_filter(x * y, w) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=tuple(range(1, ssim_map.ndim)))


def ssim_loss(img1, img2, window_size: int = 11):
    """1 - SSIM, the training-loss form."""
    return 1.0 - ssim(img1, img2, window_size)


def ms_ssim(img1, img2, window_size: int = 11, weights=None):
    """Multi-scale SSIM (Wang et al. 2003) — an extension beyond the
    reference, useful as a perceptual GAN loss on TPU."""
    if weights is None:
        weights = jnp.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333], jnp.float32)
    ndim = img1.ndim - 2
    levels = weights.shape[0]
    vals = []
    x, y = img1.astype(jnp.float32), img2.astype(jnp.float32)
    for lvl in range(levels):
        w = _gaussian_window(window_size, 1.5, ndim)
        mu1, mu2 = _depthwise_filter(x, w), _depthwise_filter(y, w)
        s12 = _depthwise_filter(x * y, w) - mu1 * mu2
        s11 = _depthwise_filter(x * x, w) - mu1 * mu1
        s22 = _depthwise_filter(y * y, w) - mu2 * mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        cs = jnp.mean((2 * s12 + c2) / (s11 + s22 + c2))
        if lvl == levels - 1:
            l = jnp.mean((2 * mu1 * mu2 + c1) / (mu1 * mu1 + mu2 * mu2 + c1))
            vals.append(jax.nn.relu(l) ** weights[lvl])
        else:
            vals.append(jax.nn.relu(cs) ** weights[lvl])
        # downsample by 2 with average pooling
        dims = (1,) + (2,) * ndim + (1,)
        x = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, dims, "VALID") / (2 ** ndim)
        y = jax.lax.reduce_window(y, 0.0, jax.lax.add, dims, dims, "VALID") / (2 ** ndim)
    out = vals[0]
    for v in vals[1:]:
        out = out * v
    return out
