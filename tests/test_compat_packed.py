"""Compat 3D inference paths dispatch to the packed forward.

Space-to-depth packed execution (models/{unet,vnet}_packed.py) is exact
up to float reassociation (probs atol pinned in tests/test_unet_packed.py
and tests/test_vnet_packed.py); here we pin that the PRODUCT paths —
`inference` / `inference_patch`, mirroring `/root/reference/model/
modelUnet.py:684,707` — actually take it when the shape divides the
packing factor, fall back cleanly when it doesn't, and produce the same
masks as the plain apply.
"""
import numpy as np
import pytest

from tpuseg.compat import BinaryVNet3dModel, MutilUNet3dModel
from tpuseg.data.geometry import Volume


@pytest.fixture(scope="module")
def vnet_model():
    return BinaryVNet3dModel(32, 32, 32, 1, 1, 4, "BinaryDiceLoss", features=8)


def test_supports_packed_gating(vnet_model):
    m = vnet_model
    assert m._supports_packed((32, 32, 32))
    assert m._supports_packed((64, 32, 96))
    assert not m._supports_packed((32, 32, 48))  # 48 % 32 != 0
    assert not m._supports_packed((31, 32, 32))
    m.packed_inference = False
    try:
        assert not m._supports_packed((32, 32, 32))
    finally:
        m.packed_inference = True

    unet = MutilUNet3dModel(16, 16, 16, 1, 3, 2, "MutilDiceLoss", features=8)
    assert unet._supports_packed((16, 16, 16))  # div 2**levels = 16
    assert not unet._supports_packed((16, 16, 24))


def test_inference_patch_packed_matches_plain(vnet_model):
    m = vnet_model
    # nudge the random-init head away from the 0.5 decision boundary so
    # the ~1e-5 packed-vs-plain reassociation can't flip ties en masse
    m._ensure_trainer()
    p = m.trainer.state["params"]["params"]
    head = p["OutputHead_0"]["ConvND_0"]["Conv_0"]
    head["bias"] = head["bias"] + 0.3

    rng = np.random.default_rng(0)
    # even dims: the packed path needs no extra pad, so plain and packed
    # see the IDENTICAL patch grid — any disagreement is pure forward
    # reassociation (pinned tighter in tests/test_vnet_packed.py)
    vol = Volume(rng.normal(size=(36, 48, 40)).astype(np.float32) * 50 - 900)

    fn, _, packed = m._probs_apply((32, 32, 32), return_packed=True)
    assert packed, "32-divisible VNet patch must dispatch packed"

    mask_packed = m.inference_patch(vol, newSpacing=None, patch=(32, 32, 32),
                                    batch_size=4)
    m.packed_inference = False
    m._apply_cache.clear()
    try:
        mask_plain = m.inference_patch(vol, newSpacing=None,
                                       patch=(32, 32, 32), batch_size=4)
    finally:
        m.packed_inference = True
    a, b = np.asarray(mask_packed.array), np.asarray(mask_plain.array)
    assert a.shape == b.shape == vol.array.shape
    assert (a == b).mean() > 0.995

    # odd leading dim: the packed path pads it to even and crops the mask
    # back — shape must round-trip (the merge grid differs from plain's
    # there, so only the geometry is pinned, not voxel agreement)
    vol_odd = Volume(
        rng.normal(size=(35, 48, 40)).astype(np.float32) * 50 - 900
    )
    mask_odd = m.inference_patch(vol_odd, newSpacing=None,
                                 patch=(32, 32, 32), batch_size=4)
    assert np.asarray(mask_odd.array).shape == vol_odd.array.shape


def test_inference_whole_volume_packed_matches_plain():
    m = MutilUNet3dModel(16, 16, 16, 1, 3, 2, "MutilDiceLoss", features=8)
    rng = np.random.default_rng(1)
    vol = Volume(rng.normal(size=(20, 28, 36)).astype(np.float32),
                 spacing=(1.0, 1.0, 1.0))

    mask_packed = m.inference(vol, newSize=(16, 16, 16))
    m.packed_inference = False
    m._apply_cache.clear()
    try:
        mask_plain = m.inference(vol, newSize=(16, 16, 16))
    finally:
        m.packed_inference = True
    a, b = np.asarray(mask_packed.array), np.asarray(mask_plain.array)
    assert a.shape == b.shape == vol.array.shape
    assert (a == b).mean() > 0.995
    assert mask_packed.GetSpacing() == vol.GetSpacing()
