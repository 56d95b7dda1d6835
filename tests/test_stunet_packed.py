"""Packed-stem STUNet3d (models/stunet_packed.py): exactness vs the
plain flax apply — forward, packed-return layouts, sigmoid head, and
f64 grad parity.  Mirrors tests/test_resunet_packed.py; the new ground
covered here is the dual-path stem (k3s2-SAME-from-packed + 1x1s2-VALID
weight transforms) and InstanceNorm on packed tensors."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.models.stunet3d import STUNet3d
from tpuseg.models.stunet_packed import packed_stunet3d_apply
from tpuseg.models.vnet_packed import depth_to_space3d, packed_class_to_delta

SHAPE = (16, 16, 32)
F = 8
K = 3


@pytest.fixture(scope="module")
def setup():
    model = STUNet3d(num_classes=K, features=F, dropout=0.2)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, *SHAPE, 1)), jnp.float32
    )
    params = model.init(jax.random.key(0), x)
    return model, params, x


def test_forward_exact(setup):
    """f32 forward parity at the net's own conditioning floor.

    STUNet3d's 17 InstanceNorm+leaky chains amplify f32 rounding: the
    PLAIN apply maps a 1e-7 relative param perturbation to a 1.7e-2
    logits swing (measured), so packed-vs-plain f32 cannot be tighter.
    Math exactness is pinned by test_grads_exact (f64, 1e-7)."""
    model, params, x = setup
    lg_ref, pr_ref = model.apply(params, x)
    lg, pr = packed_stunet3d_apply(params, x, num_classes=K, features=F)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(lg_ref), atol=6e-2)
    np.testing.assert_allclose(np.asarray(pr), np.asarray(pr_ref), atol=1e-2)
    agree = np.mean(
        np.argmax(np.asarray(lg), -1) == np.argmax(np.asarray(lg_ref), -1)
    )
    assert agree >= 0.999


@pytest.mark.parametrize("layout", ["delta", "class"])
def test_return_packed_layouts(setup, layout):
    model, params, x = setup
    _, pr_ref = model.apply(params, x)
    _, prp = packed_stunet3d_apply(
        params, x, num_classes=K, features=F,
        return_packed=True, packed_layout=layout,
    )
    if layout == "class":
        prp = packed_class_to_delta(prp, K)
    pr = depth_to_space3d(prp)
    np.testing.assert_allclose(np.asarray(pr), np.asarray(pr_ref), atol=1e-2)


def test_binary_sigmoid_head():
    model = STUNet3d(num_classes=1, features=F, dropout=0.0)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, *SHAPE, 1)), jnp.float32
    )
    params = model.init(jax.random.key(1), x)
    _, pr_ref = model.apply(params, x)
    _, pr = packed_stunet3d_apply(params, x, num_classes=1, features=F)
    np.testing.assert_allclose(np.asarray(pr), np.asarray(pr_ref), atol=3e-2)


def test_dropout_runs(setup):
    model, params, x = setup
    lg, pr = packed_stunet3d_apply(
        params, x, num_classes=K, features=F, train=True,
        rng=jax.random.key(3),
    )
    assert lg.shape == (2, *SHAPE, K) and pr.shape == lg.shape
    assert np.isfinite(np.asarray(lg)).all()


def test_grads_exact(setup):
    """f64 grad parity (see test_unet_packed.test_grads_exact for why f64)."""
    model, params, x = setup
    jax.config.update("jax_enable_x64", True)
    try:
        to64 = lambda t: jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), t
        )
        params64 = to64(params)
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        cot = jnp.asarray(
            np.random.default_rng(1).normal(size=(2, *SHAPE, K)), jnp.float64
        )

        def loss_plain(p):
            lg, pr = model.apply(p, x64)
            return jnp.sum(lg * cot) + jnp.sum(pr * pr)

        def loss_packed(p):
            lg, pr = packed_stunet3d_apply(p, x64, num_classes=K, features=F)
            return jnp.sum(lg * cot) + jnp.sum(pr * pr)

        v1, g1 = jax.value_and_grad(loss_plain)(params64)
        v2, g2 = jax.value_and_grad(loss_packed)(params64)
        assert abs(v1 - v2) / abs(v1) < 1e-10
        flat1 = jax.tree_util.tree_leaves_with_path(g1)
        flat2 = {jax.tree_util.keystr(k): v
                 for k, v in jax.tree_util.tree_leaves_with_path(g2)}
        for k, a in flat1:
            b = flat2[jax.tree_util.keystr(k)]
            np.testing.assert_allclose(
                b, a, rtol=1e-7, atol=1e-7,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}",
            )
    finally:
        jax.config.update("jax_enable_x64", False)


def test_trainer_packed_stem_matches_plain():
    """make_segmentation_trainer(packed_stem=True) with STUNet3d: same
    loss trajectory as the plain trainer (dropout off => deterministic)."""
    from tpuseg.tasks.segmentation import make_segmentation_trainer
    from tpuseg.tasks.trainer import TrainerConfig

    model = STUNet3d(num_classes=3, features=8, dropout=0.0)
    rng = np.random.default_rng(7)
    batch = {
        "image": rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32),
        "label": rng.integers(0, 3, size=(1, 16, 16, 16)).astype(np.int32),
    }
    losses = {}
    for packed in (False, True):
        tr = make_segmentation_trainer(
            model,
            example_image=batch["image"],
            num_classes=3,
            loss_name="MutilDiceLoss",
            alpha=[1.0] * 3,
            config=TrainerConfig(epochs=1, lr=1e-3, optimizer="adam"),
            packed_stem=packed,
        )
        tr._build_steps()
        state = tr.state
        db = tr._put(batch)
        ls = []
        for _ in range(3):
            state, m = tr._train_step(state, db)
            ls.append(float(m["loss"]))
        losses[packed] = ls
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-4)
