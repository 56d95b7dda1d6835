"""Pallas kernel tests (interpret mode on the CPU backend)."""
import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.kernels.fused_norm import (
    fused_group_norm_relu,
    fused_group_norm_relu_pallas,
)


def _ref_gn_relu(x, gamma, beta, groups=8, eps=1e-5, relu=True):
    n, v, c = x.shape
    xg = x.reshape(n, v, groups, c // groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    y = (xg - mean) / np.sqrt(var + eps)
    y = y.reshape(n, v, c) * gamma + beta
    return np.maximum(y, 0) if relu else y


def test_fused_gn_relu_interpret(rng):
    x = rng.normal(size=(2, 3000, 16)).astype(np.float32)
    gamma = rng.normal(size=(16,)).astype(np.float32)
    beta = rng.normal(size=(16,)).astype(np.float32)
    out = fused_group_norm_relu_pallas(
        jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
        groups=8, tile_v=1024, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), _ref_gn_relu(x, gamma, beta),
                               atol=5e-4)


def test_fused_gn_no_relu_interpret(rng):
    x = rng.normal(size=(1, 2048, 32)).astype(np.float32)
    gamma = np.ones(32, np.float32)
    beta = np.zeros(32, np.float32)
    out = fused_group_norm_relu_pallas(
        jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
        groups=8, relu=False, tile_v=2048, interpret=True,
    )
    ref = _ref_gn_relu(x, gamma, beta, relu=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)
    assert np.asarray(out).min() < 0  # relu really off


def test_fused_gn_wrapper_fallback(rng):
    """On CPU the shape-agnostic wrapper uses the jnp fallback path."""
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    gamma = np.ones(16, np.float32)
    beta = np.zeros(16, np.float32)
    out = fused_group_norm_relu(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta))
    ref = _ref_gn_relu(x.reshape(2, 64, 16), gamma, beta).reshape(2, 8, 8, 16)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_pipelined_sliding_window_matches_single(rng):
    from tpuseg.infer.sliding_window import (
        sliding_window_inference,
        sliding_window_inference_pipelined,
    )

    vols = [rng.random((40, 40, 40)).astype(np.float32) for _ in range(3)]

    def apply_fn(p):
        return (p > 0.5).astype(jnp.float32)

    masks = sliding_window_inference_pipelined(vols, (32, 32, 32), apply_fn, 1, 4)
    assert len(masks) == 3
    for vol, m in zip(vols, masks):
        single = sliding_window_inference(
            vol, (32, 32, 32), apply_fn, 1, 4, return_mask=True
        )
        np.testing.assert_array_equal(m, single)


class TestConv3dSmall:
    """Pallas direct conv3d (kernels/conv3d.py) — exactness vs XLA in
    interpret mode, VJP, and ConvND flag integration."""

    def test_matches_xla_conv(self, rng):
        from tpuseg.kernels.conv3d import conv3d_small

        for (n, d, h, w_sp, cin, cout) in [
            (1, 5, 6, 7, 16, 16), (2, 8, 12, 20, 32, 16), (1, 4, 4, 4, 16, 32),
        ]:
            x = jnp.asarray(rng.normal(size=(n, d, h, w_sp, cin)).astype(np.float32))
            w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)).astype(np.float32) * 0.1)
            ref = jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            got = conv3d_small(x, w, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    def test_vjp_matches_xla(self, rng):
        from tpuseg.kernels.conv3d import conv3d_small_vjp

        x = jnp.asarray(rng.normal(size=(1, 4, 5, 6, 16)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 16)).astype(np.float32) * 0.1)

        def loss_pallas(x, w):
            return jnp.sum(conv3d_small_vjp(x, w, True) ** 2)

        def loss_xla(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            return jnp.sum(y ** 2)

        g1 = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
        g2 = jax.grad(loss_xla, argnums=(0, 1))(x, w)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    def test_convnd_flag_checkpoint_compatible(self, rng):
        """Params initialized with the XLA path must run unchanged through
        the Pallas path (same Conv_0/kernel tree) and agree numerically."""
        from tpuseg.nn import layers

        x = jnp.asarray(rng.normal(size=(1, 6, 8, 10, 16)).astype(np.float32))
        m = layers.ConvND(16, 3, 3)
        params = m.init(jax.random.key(0), x)
        ref = m.apply(params, x)
        old = layers.USE_PALLAS_CONV3D
        layers.USE_PALLAS_CONV3D = True
        try:
            got = m.apply(params, x)
            params2 = m.init(jax.random.key(0), x)
            assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)
        finally:
            layers.USE_PALLAS_CONV3D = old
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    def test_vnet_forward_with_pallas_convs(self, rng):
        """Whole VNet3d forward, flag on vs off, same params -> same probs."""
        from tpuseg.models.vnet import VNet
        from tpuseg.nn import layers

        model = VNet(ndim=3, num_classes=2, features=16)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
        params = model.init(jax.random.key(0), x)
        _, ref = model.apply(params, x)
        old = layers.USE_PALLAS_CONV3D
        layers.USE_PALLAS_CONV3D = True
        try:
            _, got = model.apply(params, x)
        finally:
            layers.USE_PALLAS_CONV3D = old
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


class TestFusedGNReLUIntegration:
    def test_vjp_matches_reference_grads(self, rng):
        from tpuseg.kernels.fused_norm import (
            _gn_relu_reference, fused_group_norm_relu_vjp,
        )

        x = jnp.asarray(rng.normal(size=(2, 6, 6, 16)).astype(np.float32))
        gamma = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
        beta = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))

        def lf(fn):
            return lambda x, g, b: jnp.sum(fn(x, g, b) ** 2)

        ref = lf(lambda x, g, b: _gn_relu_reference(x, g, b, 8, 1e-5, True))
        fused = lf(lambda x, g, b: fused_group_norm_relu_vjp(x, g, b, 8, 1e-5, True))
        np.testing.assert_allclose(float(ref(x, gamma, beta)), float(fused(x, gamma, beta)), rtol=1e-5)
        g1 = jax.grad(ref, argnums=(0, 1, 2))(x, gamma, beta)
        g2 = jax.grad(fused, argnums=(0, 1, 2))(x, gamma, beta)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_convblock_flag_parity_and_checkpoint_compat(self, rng):
        """Flag on/off: same param tree (GroupNorm_i/scale,bias), same
        outputs in eval AND train mode (identical dropout stream)."""
        from tpuseg.nn import layers

        x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
        block = layers.ConvBlock(16, 2, dropout=0.3)
        params = block.init({"params": jax.random.key(0)}, x, train=False)
        ref_eval = block.apply(params, x, train=False)
        ref_train = block.apply(params, x, train=True, rngs={"dropout": jax.random.key(7)})
        old = layers.USE_FUSED_GN_RELU
        layers.USE_FUSED_GN_RELU = True
        try:
            params2 = block.init({"params": jax.random.key(0)}, x, train=False)
            assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)
            got_eval = block.apply(params, x, train=False)
            got_train = block.apply(params, x, train=True, rngs={"dropout": jax.random.key(7)})
        finally:
            layers.USE_FUSED_GN_RELU = old
        np.testing.assert_allclose(np.asarray(got_eval), np.asarray(ref_eval), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_train), np.asarray(ref_train), atol=1e-4)

    def test_luconv_flag_parity(self, rng):
        from tpuseg.nn import layers

        x = jnp.asarray(rng.normal(size=(1, 6, 6, 6, 16)).astype(np.float32))
        m = layers.LUConv(16, 3, dropout=0.0)
        params = m.init({"params": jax.random.key(0)}, x, train=False)
        ref = m.apply(params, x, train=False)
        old = layers.USE_FUSED_GN_RELU
        layers.USE_FUSED_GN_RELU = True
        try:
            got = m.apply(params, x, train=False)
        finally:
            layers.USE_FUSED_GN_RELU = old
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
