"""packed x spatial composition (models/unet_packed_sp.py): the
z-sharded packed-stem UNet3d forward/grads/trainer are EXACTLY the
single-device packed computation (which is itself exactness-tested
against the plain flax UNet in tests/test_unet_packed.py).

Runs on the 8-virtual-device CPU mesh (tests/conftest.py)."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tpuseg.core.mesh import SPACE_AXIS, make_mesh
from tpuseg.models.unet import UNet
from tpuseg.models.unet_packed import packed_unet3d_apply
from tpuseg.models.unet_packed_sp import packed_unet3d_apply_sp

F = 8
K = 3


def _data(shape, seed=0, batch=1):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(batch, *shape, 1)).astype(np.float32)
    y = rng.integers(0, K, size=(batch, *shape)).astype(np.int32)
    return x, y


def _sp_forward(mesh, params, x, **kw):
    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, SPACE_AXIS)),
        out_specs=(P(None, SPACE_AXIS), P(None, SPACE_AXIS)),
        check_vma=False,
    )
    def run(params, x):
        return packed_unet3d_apply_sp(
            params, x, axis_name=SPACE_AXIS, num_classes=K, features=F, **kw
        )

    return run(params, x)


@pytest.mark.parametrize("n_space,levels,packed_levels,shape", [
    (4, 2, 1, (32, 8, 8)),
    (2, 3, 2, (32, 16, 16)),
])
def test_sp_forward_exact(n_space, levels, packed_levels, shape):
    mesh = make_mesh(data=1, model=1, space=n_space)
    model = UNet(ndim=3, num_classes=K, features=F, dropout=0.0,
                 levels=levels)
    x, _ = _data(shape)
    params = model.init(jax.random.key(0), jnp.asarray(x))

    lg_ref, pr_ref = packed_unet3d_apply(
        params, jnp.asarray(x), num_classes=K, features=F, levels=levels,
        packed_levels=packed_levels,
    )
    lg, pr = _sp_forward(mesh, params, jnp.asarray(x), levels=levels,
                         packed_levels=packed_levels)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(lg_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pr), np.asarray(pr_ref), atol=1e-5)


def test_sp_grads_exact_f64():
    """f64 grad parity vs the single-device packed apply: the local loss
    sums decompose over shards, so psum'd per-shard grads are the global
    gradient exactly."""
    jax.config.update("jax_enable_x64", True)
    try:
        mesh = make_mesh(data=1, model=1, space=4)
        model = UNet(ndim=3, num_classes=K, features=F, dropout=0.0,
                     levels=2)
        x, _ = _data((32, 8, 8), seed=1)
        params = model.init(jax.random.key(0), jnp.asarray(x))
        to64 = lambda t: jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), t
        )
        params64 = to64(params)
        x64 = jnp.asarray(x, jnp.float64)
        cot = jnp.asarray(
            np.random.default_rng(2).normal(size=(1, 32, 8, 8, K)),
            jnp.float64,
        )

        def loss_single(p):
            lg, pr = packed_unet3d_apply(
                p, x64, num_classes=K, features=F, levels=2
            )
            return jnp.sum(lg * cot) + jnp.sum(pr * pr)

        @partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(None, SPACE_AXIS), P(None, SPACE_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def loss_grads_sp(p, x, cot):
            def local_loss(p):
                lg, pr = packed_unet3d_apply_sp(
                    p, x, axis_name=SPACE_AXIS, num_classes=K, features=F,
                    levels=2,
                )
                return jnp.sum(lg * cot) + jnp.sum(pr * pr)

            l, g = jax.value_and_grad(local_loss)(p)
            return (
                jax.lax.psum(l, SPACE_AXIS),
                jax.tree_util.tree_map(
                    lambda t: jax.lax.psum(t, SPACE_AXIS), g
                ),
            )

        v1, g1 = jax.value_and_grad(loss_single)(params64)
        v2, g2 = loss_grads_sp(params64, x64, cot)
        assert abs(v1 - v2) / abs(v1) < 1e-12
        flat2 = {jax.tree_util.keystr(k): v
                 for k, v in jax.tree_util.tree_leaves_with_path(g2)}
        for k, a in jax.tree_util.tree_leaves_with_path(g1):
            np.testing.assert_allclose(
                flat2[jax.tree_util.keystr(k)], a, rtol=1e-8, atol=1e-10,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}",
            )
    finally:
        jax.config.update("jax_enable_x64", False)


def _make_trainer(model, x, mesh=None, dropout_seed=0):
    from tpuseg.core.mesh import MeshContext
    from tpuseg.tasks.segmentation import make_segmentation_trainer
    from tpuseg.tasks.trainer import TrainerConfig

    return make_segmentation_trainer(
        model,
        example_image=np.zeros_like(x),
        num_classes=K,
        loss_name="MutilDiceLoss",
        alpha=[1.0] * K,
        config=TrainerConfig(epochs=1, lr=1e-3, optimizer="adam",
                             donate_state=False),
        mesh=MeshContext(mesh) if mesh is not None else None,
        packed_stem=True,
        seed=dropout_seed,
    )


def test_sp_trainer_matches_single_device_packed_incl_dropout():
    """make_segmentation_trainer(mesh space=2, packed_stem=True) returns
    the spatial trainer running the packed z-sharded forward; its loss
    trajectory matches the single-device packed trainer EXACTLY —
    including dropout (channel masks depend only on (N, C) and the
    replicated key, and the key schedules coincide for data=1)."""
    from tpuseg.tasks.spatial import SpatialSegTrainer

    mesh = make_mesh(data=1, model=1, space=2)
    model = UNet(ndim=3, num_classes=K, features=F, dropout=0.2, levels=2)
    x, y = _data((16, 8, 8), seed=3)
    batch = {"image": x, "label": y}

    losses = {}
    for use_mesh in (False, True):
        tr = _make_trainer(model, x, mesh=mesh if use_mesh else None)
        if use_mesh:
            assert isinstance(tr, SpatialSegTrainer) and tr.packed_stem
        tr._build_steps()
        state = tr.state
        db = tr._put(batch)
        ls = []
        for _ in range(3):
            state, m = tr._train_step(state, db)
            ls.append(float(m["loss"]))
        losses[use_mesh] = ls
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-5)


def test_sp_trainer_dp_x_sp_product():
    """dp x sp (data=2, space=2) with packed_stem: loss trajectory matches
    the single-device packed trainer on the same global batch
    (dropout=0 — with data>1 the dropout key folds the shard index)."""
    mesh = make_mesh(data=2, model=1, space=2)
    model = UNet(ndim=3, num_classes=K, features=F, dropout=0.0, levels=2)
    x, y = _data((16, 8, 8), seed=4, batch=2)
    batch = {"image": x, "label": y}

    losses = {}
    for use_mesh in (False, True):
        tr = _make_trainer(model, x, mesh=mesh if use_mesh else None)
        tr._build_steps()
        state = tr.state
        db = tr._put(batch)
        ls = []
        for _ in range(3):
            state, m = tr._train_step(state, db)
            ls.append(float(m["loss"]))
        losses[use_mesh] = ls
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-5)
