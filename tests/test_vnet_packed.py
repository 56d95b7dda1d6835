"""Packed-stem VNet3d (models/vnet_packed.py): exactness vs the plain
flax model, both decoder-LUConv modes, packed and fine outputs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.models.vnet import VNet
from tpuseg.models import vnet_packed


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 1)).astype(np.float32))
    model = VNet(ndim=3, num_classes=2, features=16, dropout=0.0)
    params = model.init(jax.random.key(0), x)
    _, probs_ref = model.apply(params, x)
    return x, params, np.asarray(probs_ref)


@pytest.mark.parametrize("mode", ["k3dense", "k4s2"])
def test_packed_vnet_exact(setup, mode, monkeypatch):
    x, params, probs_ref = setup
    monkeypatch.setattr(vnet_packed, "LUCONV96_MODE", mode)
    probs = np.asarray(vnet_packed.packed_vnet3d_probs(params, x))
    np.testing.assert_allclose(probs, probs_ref, atol=1e-4)
    assert (probs.argmax(-1) == probs_ref.argmax(-1)).all()


def test_packed_output_roundtrip(setup):
    x, params, probs_ref = setup
    pp = vnet_packed.packed_vnet3d_probs(params, x, return_packed=True)
    assert pp.shape == (1, 16, 16, 16, 16)
    fine = np.asarray(vnet_packed.depth_to_space3d(pp))
    np.testing.assert_allclose(fine, probs_ref, atol=1e-4)


def test_packed_vnet_batch_and_nonisotropic(setup):
    """Shapes beyond the cube: batch 2, D!=H!=W (all divisible by 32)."""
    _, params, _ = setup
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 64, 32, 32, 1)).astype(np.float32))
    model = VNet(ndim=3, num_classes=2, features=16, dropout=0.0)
    _, probs_ref = model.apply(params, x)
    probs = np.asarray(vnet_packed.packed_vnet3d_probs(params, x))
    np.testing.assert_allclose(probs, np.asarray(probs_ref), atol=1e-4)


def test_sliding_window_packed_apply_matches_plain(setup):
    """The packed-merge sliding-window path (packed_apply=True) produces
    the same mask and probs as the plain path."""
    from tpuseg.infer.sliding_window import sliding_window_inference

    _, params, _ = setup
    model = VNet(ndim=3, num_classes=2, features=16, dropout=0.0)
    rng = np.random.default_rng(3)
    vol = rng.normal(size=(48, 32, 32)).astype(np.float32)

    def apply_plain(patches):
        _, probs = model.apply(params, patches)
        return probs

    def apply_packed(patches):
        return vnet_packed.packed_vnet3d_probs(
            params, patches, return_packed=True
        )

    kw = dict(patch=(32, 32, 32), num_classes=2, batch_size=4, overlap=0.5)
    mask_ref = sliding_window_inference(
        vol, apply_fn=apply_plain, return_mask=True, **kw
    )
    mask_pk = sliding_window_inference(
        vol, apply_fn=apply_packed, return_mask=True, packed_apply=True, **kw
    )
    assert (mask_ref == mask_pk).mean() > 0.9999, (mask_ref != mask_pk).mean()
    probs_ref = sliding_window_inference(vol, apply_fn=apply_plain, **kw)
    probs_pk = sliding_window_inference(
        vol, apply_fn=apply_packed, packed_apply=True, **kw
    )
    np.testing.assert_allclose(probs_pk, probs_ref, atol=2e-4)
