"""Shape/contract tests for the UNet and VNet families — the asserted
replacement for the reference's __main__ smoke blocks (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.models.unet import UNet, UNetThin
from tpuseg.models.vnet import VNet


@pytest.mark.parametrize("ndim,classes", [(2, 1), (2, 3), (3, 1), (3, 5)])
def test_unet_shapes(ndim, classes):
    spatial = (32, 32) if ndim == 2 else (16, 16, 16)
    x = jnp.zeros((2, *spatial, 1))
    model = UNet(ndim=ndim, num_classes=classes)
    params = model.init(jax.random.key(0), x)
    logits, probs = model.apply(params, x)
    assert logits.shape == (2, *spatial, classes)
    assert probs.shape == logits.shape
    if classes > 1:
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    else:
        assert float(probs.min()) >= 0 and float(probs.max()) <= 1


@pytest.mark.parametrize("ndim", [2, 3])
def test_vnet_shapes(ndim):
    spatial = (32, 32) if ndim == 2 else (16, 16, 16)
    x = jnp.zeros((1, *spatial, 1))
    model = VNet(ndim=ndim, num_classes=2)
    params = model.init(jax.random.key(0), x)
    logits, probs = model.apply(params, x)
    assert logits.shape == (1, *spatial, 2)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_unet_thin_shapes():
    x = jnp.zeros((1, 16, 16, 16, 1))
    model = UNetThin(ndim=3, num_classes=1)
    params = model.init(jax.random.key(0), x)
    logits, probs = model.apply(params, x)
    assert logits.shape == (1, 16, 16, 16, 1)


def test_dropout_needs_rng_and_changes_output():
    x = jnp.ones((1, 32, 32, 1))
    model = UNet(ndim=2, num_classes=1, dropout=0.5)
    params = model.init(jax.random.key(0), x)
    l1, _ = model.apply(params, x, train=True, rngs={"dropout": jax.random.key(1)})
    l2, _ = model.apply(params, x, train=True, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(l1), np.asarray(l2))
    # eval mode is deterministic
    e1, _ = model.apply(params, x)
    e2, _ = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))
