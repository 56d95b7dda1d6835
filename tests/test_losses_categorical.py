"""Golden-value tests for multiclass losses (numpy oracles of the
reference formulas in `/root/reference/model/losses.py:247-473`), including
absent-class masking."""
import numpy as np
import jax.numpy as jnp

from tpuseg.losses import categorical

SMOOTH, EPS = 1e-5, 1e-7
C = 4


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _data(rng, absent_class=True):
    logits = rng.normal(size=(2, 6, 6, C)).astype(np.float32) * 2
    labels = rng.integers(0, C - 1 if absent_class else C, size=(2, 6, 6))
    return logits, labels.astype(np.int32)  # class C-1 never appears


def _onehot(labels):
    return np.eye(C, dtype=np.float32)[labels]


def test_cross_entropy_masks_absent(rng):
    logits, labels = _data(rng)
    p = _softmax(logits)
    oh = _onehot(labels)
    present = (oh.reshape(-1, C).sum(0) > 0).astype(np.float32)
    nll = -np.log(np.take_along_axis(p.reshape(-1, C), labels.reshape(-1, 1), 1))[:, 0]
    w = present[labels.reshape(-1)]
    expect = (w * nll).sum() / w.sum()
    got = categorical.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_dice_negative_weighted(rng):
    logits, labels = _data(rng)
    p = _softmax(logits).reshape(2, -1, C)
    oh = _onehot(labels).reshape(2, -1, C)
    inter = (oh * p).sum(axis=(0, 1))
    denom = (oh + p).sum(axis=(0, 1))
    dice = np.maximum((2 * inter + SMOOTH) / (denom + SMOOTH), EPS)
    present = oh.sum(axis=(0, 1)) > 0
    expect = -(dice * present).sum() / present.sum()
    got = categorical.dice_loss(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(got, expect, rtol=1e-5)
    # must be ≈ -mean dice of present classes, i.e. negative
    assert float(got) < 0


def test_dice_alpha_weights(rng):
    logits, labels = _data(rng, absent_class=False)
    alpha = np.array([0.1, 1.0, 2.0, 0.5], np.float32)
    p = _softmax(logits).reshape(2, -1, C)
    oh = _onehot(labels).reshape(2, -1, C)
    inter = (oh * p).sum(axis=(0, 1))
    denom = (oh + p).sum(axis=(0, 1))
    dice = np.maximum((2 * inter + SMOOTH) / (denom + SMOOTH), EPS)
    present = oh.sum(axis=(0, 1)) > 0
    expect = -(dice * present * alpha).sum() / present.sum()
    got = categorical.dice_loss(jnp.asarray(logits), jnp.asarray(labels), alpha=alpha)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_focal(rng):
    logits, labels = _data(rng)
    p = _softmax(logits)
    oh = _onehot(labels)
    present = (oh.reshape(-1, C).sum(0) > 0).astype(np.float32)
    nll = -np.log(np.take_along_axis(p.reshape(-1, C), labels.reshape(-1, 1), 1))[:, 0]
    nll = nll * present[labels.reshape(-1)]
    pt = np.exp(-nll)
    expect = ((1 - pt) ** 2 * nll).mean()
    got = categorical.focal_loss(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_tversky_and_ss_run_and_mask(rng):
    logits, labels = _data(rng)
    tv = categorical.tversky_loss(jnp.asarray(logits), jnp.asarray(labels))
    ss = categorical.ss_loss(jnp.asarray(logits), jnp.asarray(labels))
    el = categorical.el_dice_loss(jnp.asarray(logits), jnp.asarray(labels))
    for v in (tv, ss, el):
        assert np.isfinite(float(v))
    # perfect prediction → tversky loss ≈ 0
    perfect = np.full((1, 4, 4, C), -20.0, np.float32)
    lab = rng.integers(0, C, size=(1, 4, 4)).astype(np.int32)
    for i in range(4):
        perfect[..., i] = np.where(lab == i, 20.0, -20.0)
    assert float(categorical.tversky_loss(jnp.asarray(perfect), jnp.asarray(lab))) < 1e-3


def test_ce_dice_is_sum(rng):
    logits, labels = _data(rng)
    got = categorical.ce_dice_loss(jnp.asarray(logits), jnp.asarray(labels))
    expect = categorical.cross_entropy_loss(
        jnp.asarray(logits), jnp.asarray(labels)
    ) + categorical.dice_loss(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(got, expect, rtol=1e-6)
