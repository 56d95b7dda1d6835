"""Exactness of the packed-stem UNet3d (models/unet_packed.py) vs the
plain flax model — forward, gradients, and the packed-loss identity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.models.unet import UNet
from tpuseg.models.unet_packed import (
    packed_unet3d_apply,
    space_to_depth_labels,
)

SHAPE = (16, 16, 16)
K = 5


@pytest.fixture(scope="module")
def setup():
    model = UNet(ndim=3, num_classes=K, features=16, dropout=0.2)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, *SHAPE, 1)), jnp.float32
    )
    params = model.init(jax.random.key(0), x)
    return model, params, x


def test_forward_exact(setup):
    model, params, x = setup
    lg, pr = model.apply(params, x)
    lg2, pr2 = packed_unet3d_apply(params, x, num_classes=K)
    np.testing.assert_allclose(lg2, lg, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(pr2, pr, rtol=1e-4, atol=1e-5)


def test_grads_exact(setup):
    """Grad parity in float64: in f32 the two (mathematically identical)
    graphs differ by ~1e-7 reassociation noise, which flips a handful of
    ReLU/maxpool decisions and shows up as localized O(1) grad diffs —
    in f64 the flip probability vanishes and the transform's exactness
    is visible directly (grads match to ~1e-9)."""
    model, params, x = setup
    jax.config.update("jax_enable_x64", True)
    try:
        to64 = lambda t: jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), t
        )
        params64, x64 = to64(params), jnp.asarray(np.asarray(x), jnp.float64)
        cot = jnp.asarray(
            np.random.default_rng(1).normal(size=(2, *SHAPE, K)), jnp.float64
        )

        def loss_plain(p):
            lg, pr = model.apply(p, x64)
            return jnp.sum(lg * cot) + jnp.sum(pr * pr)

        def loss_packed(p):
            lg, pr = packed_unet3d_apply(p, x64, num_classes=K)
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


def test_packed_return_matches_fine(setup):
    _, params, x = setup
    lg, pr = packed_unet3d_apply(params, x, num_classes=K)
    lgp, prp = packed_unet3d_apply(
        params, x, num_classes=K, return_packed=True
    )
    from tpuseg.models.vnet_packed import depth_to_space3d

    np.testing.assert_allclose(depth_to_space3d(lgp), lg, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(depth_to_space3d(prp), pr, rtol=1e-6, atol=1e-6)


def test_packed_loss_identity(setup):
    """Voxel-reduction losses are exactly layout-invariant: packed logits
    + packed labels == fine logits + fine labels."""
    _, params, x = setup
    from tpuseg.losses import build_loss

    labels = jnp.asarray(
        np.random.default_rng(2).integers(0, K, size=(2, *SHAPE)), jnp.int32
    )
    loss = build_loss("MutilDiceLoss", K, alpha=[1.0] * K)
    lg, _ = packed_unet3d_apply(params, x, num_classes=K)
    lgp, _ = packed_unet3d_apply(params, x, num_classes=K, return_packed=True)
    lab_p = space_to_depth_labels(np.asarray(labels))
    n = lgp.shape[0]
    fine = loss(lg, labels)
    packed = loss(
        lgp.reshape(n, -1, 1, K), jnp.asarray(lab_p).reshape(n, -1, 1)
    )
    np.testing.assert_allclose(packed, fine, rtol=1e-5)


def test_dropout_runs_and_differs(setup):
    """train-mode packed forward with dropout: runs, is rng-deterministic,
    and differs from the deterministic forward."""
    _, params, x = setup
    lg0, _ = packed_unet3d_apply(params, x, num_classes=K)
    lg1, _ = packed_unet3d_apply(
        params, x, num_classes=K, train=True, rng=jax.random.key(3)
    )
    lg1b, _ = packed_unet3d_apply(
        params, x, num_classes=K, train=True, rng=jax.random.key(3)
    )
    np.testing.assert_allclose(lg1, lg1b, rtol=1e-6)
    assert not np.allclose(lg0, lg1, atol=1e-3)


def test_trainer_packed_stem_step_matches_plain():
    """make_segmentation_trainer(packed_stem=True): the jitted train step
    produces the same loss/metric trajectory as the plain trainer (dropout
    disabled so the graphs are deterministic)."""
    from tpuseg.tasks.segmentation import make_segmentation_trainer
    from tpuseg.tasks.trainer import TrainerConfig

    model = UNet(ndim=3, num_classes=3, features=16, dropout=0.0)
    rng = np.random.default_rng(5)
    batch = {
        "image": rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32),
        "label": rng.integers(0, 3, size=(2, 16, 16, 16)).astype(np.int32),
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


def test_trainer_packed_stem_rejects_unsupported_model():
    """packed_stem supports UNet(ndim=3) and VNet(ndim=3) only; a 2D
    UNet must be rejected with a clear error."""
    from tpuseg.models.unet import UNet
    from tpuseg.tasks.segmentation import make_segmentation_trainer

    with pytest.raises(ValueError, match="packed_stem"):
        make_segmentation_trainer(
            UNet(ndim=2, num_classes=2, features=16),
            example_image=np.zeros((1, 16, 16, 1), np.float32),
            num_classes=2,
            loss_name="BinaryDiceLoss",
            packed_stem=True,
        )


def test_trainer_packed_grid_vs_fine_outputs(monkeypatch):
    """USE_PACKED_GRID_LOSS=True + viz_fn=None -> the packed trainer
    computes loss/metric in the packed grid (no depth-to-space in the
    train graph); default (flag off, measured ~7% slower on chip —
    round-4 ledger) uses fine-domain outputs.  Both modes produce the
    same loss AND metric (the reductions are voxel-permutation-
    invariant)."""
    from tpuseg.tasks import segmentation as seg
    from tpuseg.tasks.segmentation import make_segmentation_trainer
    from tpuseg.tasks.trainer import TrainerConfig

    model = UNet(ndim=3, num_classes=3, features=16, dropout=0.0)
    rng = np.random.default_rng(7)
    batch = {
        "image": rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32),
        "label": rng.integers(0, 3, size=(1, 16, 16, 16)).astype(np.int32),
    }
    results = {}
    for grid_flag in (True, False):
        monkeypatch.setattr(seg, "USE_PACKED_GRID_LOSS", grid_flag)
        tr = make_segmentation_trainer(
            model,
            example_image=batch["image"],
            num_classes=3,
            loss_name="MutilCrossEntropyDiceLoss",
            alpha=[1.0] * 3,
            config=TrainerConfig(epochs=1, lr=1e-3, optimizer="adam"),
            packed_stem=True,
        )
        tr._build_steps()
        db = tr._put(batch)
        state, m = tr._train_step(tr.state, db)  # donates tr.state
        ev = tr._eval_step(state, db)
        results[grid_flag] = (
            float(m["loss"]), float(m["metric"]), ev["outputs"]["probs"].shape
        )
    l_pk, m_pk, shape_pk = results[True]
    l_fi, m_fi, shape_fi = results[False]
    assert shape_fi == (1, 16, 16, 16, 3)      # fine-domain (the default)
    assert shape_pk == (1, 8, 8, 8, 24)        # packed grid outputs
    np.testing.assert_allclose(l_pk, l_fi, rtol=2e-5)
    np.testing.assert_allclose(m_pk, m_fi, rtol=2e-5)


def test_trainer_bf16_compute_dtype_tracks_f32():
    """TrainerConfig(compute_dtype=bf16): mixed precision — f32 master
    params/optimizer/loss, bf16 forward+backward.  The loss trajectory
    must track the f32 trainer closely (measured on chip: ~2e-4 drift
    over 60 steps, BASELINE.md round-4 ledger); params stay f32."""
    import jax.numpy as jnp

    from tpuseg.tasks.segmentation import make_segmentation_trainer
    from tpuseg.tasks.trainer import TrainerConfig

    model = UNet(ndim=3, num_classes=3, features=16, dropout=0.0)
    rng = np.random.default_rng(7)
    batch = {
        "image": rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32),
        "label": rng.integers(0, 3, size=(2, 16, 16, 16)).astype(np.int32),
    }
    losses = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        tr = make_segmentation_trainer(
            model,
            example_image=batch["image"],
            num_classes=3,
            loss_name="MutilDiceLoss",
            alpha=[1.0] * 3,
            config=TrainerConfig(
                epochs=1, lr=1e-3, optimizer="adam", compute_dtype=dtype
            ),
            packed_stem=True,
        )
        tr._build_steps()
        state = tr.state
        db = tr._put(batch)
        ls = []
        for _ in range(4):
            state, m = tr._train_step(state, db)
            ls.append(float(m["loss"]))
        losses[dtype] = ls
        leaves = jax.tree_util.tree_leaves(state["params"])
        assert all(l.dtype == jnp.float32 for l in leaves)
    np.testing.assert_allclose(
        losses[jnp.bfloat16], losses[jnp.float32], atol=5e-3
    )


def test_forward_exact_packed_levels2(setup):
    """packed_levels=2: level-1 also executes packed (encoder fine->packed
    k4s2 entry, packed decoder block, depth-to-space hand-off) — exact vs
    the plain model, including the packed-grid return layouts."""
    model, params, x = setup
    lg, pr = model.apply(params, x)
    lg2, pr2 = packed_unet3d_apply(params, x, num_classes=K, packed_levels=2)
    np.testing.assert_allclose(lg2, lg, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(pr2, pr, rtol=1e-4, atol=1e-5)
    # packed return stays consistent between levels settings
    lp1, _ = packed_unet3d_apply(params, x, num_classes=K, packed_levels=1,
                                 return_packed=True)
    lp2, _ = packed_unet3d_apply(params, x, num_classes=K, packed_levels=2,
                                 return_packed=True)
    np.testing.assert_allclose(lp2, lp1, rtol=1e-4, atol=1e-4)


def test_grads_exact_packed_levels2(setup):
    """f64 grad parity for packed_levels=2 (same rationale as
    test_grads_exact)."""
    model, params, x = setup
    jax.config.update("jax_enable_x64", True)
    try:
        to64 = lambda t: jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), t
        )
        params64, x64 = to64(params), jnp.asarray(np.asarray(x), jnp.float64)
        cot = jnp.asarray(
            np.random.default_rng(2).normal(size=(2, *SHAPE, K)), jnp.float64
        )

        def loss_plain(p):
            lg, pr = model.apply(p, x64)
            return jnp.sum(lg * cot) + jnp.sum(pr * pr)

        def loss_packed(p):
            lg, pr = packed_unet3d_apply(p, x64, num_classes=K,
                                         packed_levels=2)
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
