"""Tests for lovasz / cldice / ssim losses and the registry."""
import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.losses import build_loss, LOSS_NAMES, cldice, lovasz, ssim


def _lovasz_grad_np(gt_sorted):
    gts = gt_sorted.sum()
    inter = gts - np.cumsum(gt_sorted)
    union = gts + np.cumsum(1 - gt_sorted)
    jac = 1.0 - inter / union
    out = jac.copy()
    out[1:] = jac[1:] - jac[:-1]
    return out


def test_lovasz_hinge_matches_numpy(rng):
    logits = rng.normal(size=(2, 5, 5)).astype(np.float32) * 3
    labels = (rng.random((2, 5, 5)) > 0.5).astype(np.float32)
    lg, lb = logits.reshape(-1), labels.reshape(-1)
    signs = 2 * lb - 1
    errors = 1 - lg * signs
    order = np.argsort(-errors)
    grad = _lovasz_grad_np(lb[order])
    expect = (np.maximum(errors[order], 0) * grad).sum()
    got = lovasz.lovasz_hinge(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_lovasz_hinge_perfect_is_zero(rng):
    labels = (rng.random((1, 8, 8)) > 0.5).astype(np.float32)
    logits = (labels * 2 - 1) * 10.0
    got = float(lovasz.lovasz_hinge(jnp.asarray(logits), jnp.asarray(labels)))
    assert got < 1e-5


def test_lovasz_softmax_runs_and_perfect_small(rng):
    c = 3
    labels = rng.integers(0, c, size=(1, 6, 6)).astype(np.int32)
    logits = (np.eye(c)[labels] * 2 - 1) * 20.0
    got = float(lovasz.lovasz_softmax(jnp.asarray(logits, jnp.float32), jnp.asarray(labels)))
    assert got < 1e-4
    noisy = rng.normal(size=(1, 6, 6, c)).astype(np.float32)
    v = float(lovasz.lovasz_softmax(jnp.asarray(noisy), jnp.asarray(labels)))
    assert 0 <= v <= 1.0 + 1e-6


def test_soft_skeletonize_thins():
    # thick horizontal bar: the skeleton must have much less mass
    x = np.zeros((1, 32, 32, 1), np.float32)
    x[0, 12:20, 4:28, 0] = 1.0
    sk = np.asarray(cldice.soft_skeletonize(jnp.asarray(x), iterations=5))
    assert sk.sum() < 0.5 * x.sum()
    assert sk.sum() > 0  # not annihilated


def test_binary_cldice_perfect_low(rng):
    x = np.zeros((1, 32, 32, 1), np.float32)
    x[0, 14:18, 4:28, 0] = 1.0
    loss = float(cldice.binary_cldice_loss(jnp.asarray(x), jnp.asarray(x)))
    assert loss < 0.05
    y = np.zeros_like(x)
    y[0, 4:8, 4:28, 0] = 1.0  # displaced vessel
    loss2 = float(cldice.binary_cldice_loss(jnp.asarray(x), jnp.asarray(y)))
    assert loss2 > loss


def test_ssim_identity_and_range(rng):
    img = rng.random((2, 32, 32, 1)).astype(np.float32)
    one = float(ssim.ssim(jnp.asarray(img), jnp.asarray(img)))
    np.testing.assert_allclose(one, 1.0, atol=1e-5)
    noise = img + rng.normal(size=img.shape).astype(np.float32) * 0.5
    v = float(ssim.ssim(jnp.asarray(img), jnp.asarray(noise)))
    assert v < 0.9


def test_ssim3d(rng):
    img = rng.random((1, 16, 16, 16, 1)).astype(np.float32)
    np.testing.assert_allclose(
        float(ssim.ssim(jnp.asarray(img), jnp.asarray(img))), 1.0, atol=1e-5
    )


def test_registry_all_names_build_and_run(rng):
    bin_logits = jnp.asarray(rng.normal(size=(1, 8, 8, 1)).astype(np.float32))
    bin_t = jnp.asarray((rng.random((1, 8, 8, 1)) > 0.5).astype(np.float32))
    cat_logits = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    cat_t = jnp.asarray(rng.integers(0, 3, size=(1, 8, 8)).astype(np.int32))
    for name in LOSS_NAMES:
        if name.startswith("Binary") or name == "MCCLoss":
            fn = build_loss(name, num_classes=1)
            if name == "MCCLoss":
                v = fn(jax.nn.sigmoid(bin_logits), bin_t)
            elif name == "BinaryLovaszLoss":
                v = fn(bin_logits[..., 0], bin_t[..., 0])
            else:
                v = fn(bin_logits, bin_t)
        else:
            fn = build_loss(name, num_classes=3, alpha=[1.0, 1.0, 1.0])
            v = fn(cat_logits, cat_t)
        assert np.isfinite(float(v)), name
