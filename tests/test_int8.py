"""int8 W8A8 inference path (nn/layers.py USE_INT8_CONV): parameter
compatibility and output fidelity vs the f32 path."""
import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.nn import layers
from tpuseg.nn.layers import ConvND, int8_inference


def test_int8_conv_matches_f32_closely(rng):
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    conv = ConvND(16, 2, 3)
    params = conv.init(jax.random.key(0), jnp.asarray(x))
    ref = np.asarray(conv.apply(params, jnp.asarray(x)))
    with int8_inference():
        got = np.asarray(conv.apply(params, jnp.asarray(x)))
    # W8A8 with per-channel weight scales: ~1% relative error budget
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 0.03 * scale, np.abs(got - ref).max()


def test_int8_flag_restored_on_exception():
    try:
        with int8_inference():
            assert layers.USE_INT8_CONV
            raise RuntimeError
    except RuntimeError:
        pass
    assert not layers.USE_INT8_CONV


def test_int8_vnet_mask_agreement(rng):
    from tpuseg.models.vnet import VNet

    model = VNet(ndim=3, num_classes=2, features=8, dropout=0.0)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    _, probs_ref = model.apply(params, x)
    with int8_inference():
        _, probs_q = model.apply(params, x)
    mask_ref = np.asarray(probs_ref).argmax(-1)
    mask_q = np.asarray(probs_q).argmax(-1)
    agree = (mask_ref == mask_q).mean()
    assert agree > 0.98, agree
    assert np.abs(np.asarray(probs_q) - np.asarray(probs_ref)).mean() < 0.02
