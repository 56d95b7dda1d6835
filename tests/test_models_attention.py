"""Shape/contract tests for attention/MLP-family models (SMT, VSNet,
UNeXt2d, AmlpUNet2d) and the Swin building blocks."""
import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.nn.swin import (
    PatchMerging3D,
    SwinBlock3D,
    _relative_position_index,
    _shift_attn_mask,
    window_partition,
    window_reverse,
)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 8, 8, 8, 4)).astype(np.float32))
    win = (4, 4, 4)
    w = window_partition(x, win)
    back = window_reverse(w, win, (8, 8, 8), 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_relative_position_index_bounds():
    idx = _relative_position_index((3, 3, 3))
    assert idx.shape == (27, 27)
    assert idx.min() >= 0 and idx.max() < 5 * 5 * 5
    assert (np.diag(idx) == idx[0, 0]).all()  # same offset on diagonal


def test_shift_mask_blocks():
    m = _shift_attn_mask((8, 8, 8), (4, 4, 4), (2, 2, 2))
    assert m.shape == (8, 64, 64)
    assert (m <= 0).all()
    assert (m < 0).any()  # some pairs masked


def test_swin_block_shapes(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 8, 16)).astype(np.float32))
    for shifted in (False, True):
        blk = SwinBlock3D(dim=16, num_heads=4, window=(4, 4, 4), shifted=shifted)
        params = blk.init(jax.random.key(0), x)
        out = blk.apply(params, x)
        assert out.shape == x.shape


def test_patch_merging(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 8, 16)).astype(np.float32))
    pm = PatchMerging3D(dim=16)
    params = pm.init(jax.random.key(0), x)
    out = pm.apply(params, x)
    assert out.shape == (1, 4, 4, 4, 32)


def test_vsnet_multitask_heads():
    from tpuseg.models.vsnet import VSNet

    x = jnp.zeros((1, 32, 32, 32, 1))
    model = VSNet(feature_size=12)  # 8f must divide by swin heads (3)
    params = model.init(jax.random.key(0), x)
    seg_logits, probs, aux = model.apply(params, x)
    assert seg_logits.shape == (1, 32, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    reg, edge, deep2, deep3 = aux
    assert reg.shape == (1, 32, 32, 32, 1)
    assert edge.shape == (1, 32, 32, 32, 2)
    assert deep2.shape == (1, 16, 16, 16, 3)
    assert deep3.shape == (1, 8, 8, 8, 3)


def test_smt_profiles():
    from tpuseg.models.smt import smt_t

    x = jnp.zeros((1, 16, 16, 16, 1))
    model = smt_t(num_classes=3, embed_dims=(16, 32, 64, 128))
    params = model.init(jax.random.key(0), x)
    logits, probs = model.apply(params, x)
    assert logits.shape == (1, 16, 16, 16, 3)


def test_amlp_unet2d_full_res():
    from tpuseg.models.amlp_unet2d import AmlpUNet2d

    x = jnp.zeros((1, 64, 64, 3))
    model = AmlpUNet2d(num_classes=2)
    params = model.init(jax.random.key(0), x)
    logits, probs = model.apply(params, x)
    assert logits.shape == (1, 64, 64, 2)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_unext2d_shapes():
    from tpuseg.models.unext2d import UNeXt2d

    x = jnp.zeros((1, 64, 64, 3))
    model = UNeXt2d(num_classes=1)
    params = model.init(jax.random.key(0), x)
    logits, probs = model.apply(params, x)
    assert logits.shape == (1, 64, 64, 1)
