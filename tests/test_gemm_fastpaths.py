"""Tests for the space↔depth GEMM reformulations of k=s=2 convs
(tpuseg.nn.layers fast paths) — exactness vs the flax reference layers."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpuseg.nn.layers import (
    ConvND,
    ConvTransposeND,
    depth_to_space,
    space_to_depth,
)


def test_space_depth_roundtrip(rng):
    for ndim, shape in ((2, (2, 8, 6, 3)), (3, (1, 4, 6, 8, 5))):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        back = depth_to_space(space_to_depth(x, ndim), ndim)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_strided_conv_fast_path_exact(rng):
    for ndim, shape in ((2, (2, 8, 8, 3)), (3, (1, 8, 8, 8, 3))):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        layer = ConvND(7, ndim, 2, strides=2, padding="VALID",
                       use_gemm_fastpath=True)
        p = layer.init(jax.random.key(0), x)
        assert "kernel_s2d" in p["params"], "fast path not taken"
        ref = nn.Conv(7, (2,) * ndim, strides=(2,) * ndim, padding="VALID")
        refp = {"params": {"kernel": p["params"]["kernel_s2d"],
                           "bias": p["params"]["bias_s2d"]}}
        np.testing.assert_allclose(
            np.asarray(layer.apply(p, x)), np.asarray(ref.apply(refp, x)),
            atol=1e-5,
        )


def test_transpose_conv_fast_path_exact(rng):
    for ndim, shape in ((2, (2, 8, 8, 3)), (3, (1, 4, 4, 4, 3))):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        layer = ConvTransposeND(6, ndim, 2, 2, use_gemm_fastpath=True)
        p = layer.init(jax.random.key(0), x)
        assert "kernel_d2s" in p["params"], "fast path not taken"
        ref = nn.ConvTranspose(6, (2,) * ndim, strides=(2,) * ndim,
                               padding="VALID")
        refp = {"params": {"kernel": p["params"]["kernel_d2s"],
                           "bias": p["params"]["bias_d2s"]}}
        out = layer.apply(p, x)
        assert out.shape[1:-1] == tuple(2 * s for s in shape[1:-1])
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref.apply(refp, x)), atol=1e-5
        )


def test_odd_spatial_falls_back(rng):
    """Odd spatial dims can't pack 2x2 blocks — generic conv path used."""
    x = jnp.asarray(rng.normal(size=(1, 7, 7, 3)).astype(np.float32))
    layer = ConvND(4, 2, 2, strides=2, padding="VALID", use_gemm_fastpath=True)
    p = layer.init(jax.random.key(0), x)
    assert "kernel_s2d" not in p["params"]
    out = layer.apply(p, x)
    assert out.shape == (1, 3, 3, 4)
