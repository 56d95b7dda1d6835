"""Golden-value tests for binary losses against independent numpy oracles
implementing the reference formulas (`/root/reference/model/losses.py`)."""
import numpy as np
import jax.numpy as jnp

from tpuseg.losses import binary

SMOOTH, EPS = 1e-5, 1e-7


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _data(rng, shape=(2, 8, 8, 1)):
    logits = rng.normal(size=shape).astype(np.float32) * 2
    targets = (rng.random(shape) > 0.5).astype(np.float32)
    return logits, targets


def test_dice(rng):
    logits, t = _data(rng)
    p = _sigmoid(logits)
    expect = 1 - (2 * (p * t).sum() + SMOOTH) / max((p.sum() + t.sum() + SMOOTH), EPS)
    got = binary.dice_loss(jnp.asarray(logits), jnp.asarray(t))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_jaccard(rng):
    logits, t = _data(rng)
    p = _sigmoid(logits)
    inter = (p * t).sum()
    expect = 1 - (inter + SMOOTH) / (p.sum() + t.sum() - inter + SMOOTH)
    np.testing.assert_allclose(
        binary.jaccard_loss(jnp.asarray(logits), jnp.asarray(t)), expect, rtol=1e-5
    )


def test_el_dice(rng):
    logits, t = _data(rng)
    p = _sigmoid(logits)
    dsc = (2 * (p * t).sum() + SMOOTH) / (p.sum() + t.sum() + SMOOTH)
    expect = np.clip((-np.log(dsc + SMOOTH)) ** 0.3, 0, 2)
    np.testing.assert_allclose(
        binary.el_dice_loss(jnp.asarray(logits), jnp.asarray(t)), expect, rtol=1e-5
    )


def test_ss(rng):
    logits, t = _data(rng)
    p = _sigmoid(logits)
    sq = (p - t) ** 2
    expect = 0.1 * (sq * t).sum() / (SMOOTH + t.sum()) + 0.9 * (sq * (1 - t)).sum() / (
        SMOOTH + (1 - t).sum()
    )
    np.testing.assert_allclose(
        binary.ss_loss(jnp.asarray(logits), jnp.asarray(t)), expect, rtol=1e-5
    )


def test_tversky(rng):
    logits, t = _data(rng)
    p = _sigmoid(logits)
    tp, fp, fn = (p * t).sum(), (p * (1 - t)).sum(), ((1 - p) * t).sum()
    expect = 1 - (tp + SMOOTH) / (tp + 0.3 * fp + 0.7 * fn + SMOOTH)
    np.testing.assert_allclose(
        binary.tversky_loss(jnp.asarray(logits), jnp.asarray(t)), expect, rtol=1e-5
    )


def test_bce(rng):
    logits, t = _data(rng)
    p = np.clip(_sigmoid(logits), 1e-7, 1 - 1e-7)
    expect = -(t * np.log(p) + (1 - t) * np.log(1 - p)).mean()
    np.testing.assert_allclose(
        binary.bce_with_logits(jnp.asarray(logits), jnp.asarray(t)), expect, rtol=1e-4
    )


def test_focal(rng):
    logits, t = _data(rng)
    p = np.clip(_sigmoid(logits), 1e-7, 1 - 1e-7)
    bce = -(t * np.log(p) + (1 - t) * np.log(1 - p))
    pt = np.exp(-bce)
    expect = (0.25 * (1 - pt) ** 2 * bce).mean()
    np.testing.assert_allclose(
        binary.focal_loss(jnp.asarray(logits), jnp.asarray(t)), expect, rtol=1e-4
    )


def test_bce_dice_is_sum(rng):
    logits, t = _data(rng)
    got = binary.bce_dice_loss(jnp.asarray(logits), jnp.asarray(t))
    expect = binary.bce_with_logits(jnp.asarray(logits), jnp.asarray(t)) + binary.dice_loss(
        jnp.asarray(logits), jnp.asarray(t)
    )
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_mcc(rng):
    logits, t = _data(rng)
    p = _sigmoid(logits)
    tp, tn = (p * t).sum(), ((1 - p) * (1 - t)).sum()
    fp, fn = (p * (1 - t)).sum(), ((1 - p) * t).sum()
    den = np.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    expect = 1 - (tp * tn - fp * fn) / (den + 1.0)
    np.testing.assert_allclose(
        binary.mcc_loss(jnp.asarray(p), jnp.asarray(t)), expect, rtol=1e-4
    )


def test_perfect_prediction_low_loss(rng):
    t = (rng.random((2, 16, 16, 1)) > 0.5).astype(np.float32)
    logits = jnp.asarray((t * 2 - 1) * 20.0)  # saturated correct logits
    assert float(binary.dice_loss(logits, jnp.asarray(t))) < 1e-3
    assert float(binary.bce_with_logits(logits, jnp.asarray(t))) < 1e-3
    assert float(binary.focal_loss(logits, jnp.asarray(t))) < 1e-3
