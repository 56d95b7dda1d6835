"""Spatially-partitioned segmentation training as a PRODUCT path.

`make_segmentation_trainer(mesh=...)` dispatches here whenever the mesh's
``space`` axis is >1: the trainer's jitted step runs the z-sharded twin of
the model (halo-exchange convs + psum'd GroupNorm,
tpuseg/parallel/spatial.py) inside shard_map, with

 * the batch axis sharded over ``data`` and volume depth over ``space``,
 * loss statistics psum'd over (data, space) — numerically the
   single-device loss (spatial_seg_loss; supported names in
   SPATIAL_LOSS_NAMES),
 * gradients psum'd, optimizer applied on the replicated result,
 * the standard Trainer epoch loop / checkpointing / resume unchanged.

The parameter tree matches the plain model's, so checkpoints written here
load into the unsharded network for inference (train sharded, infer
anywhere).  The reference has no spatial training at all — it downsamples
volumes to fit one GPU (`/root/reference/dataprocess/
data3dpreparewithSize.py:25-33`; SURVEY.md §2.3 SP row).

Dropout note: with ``data == 1`` the sharded step is exactly the
single-device step including dropout (the flax rng stream folds in module
paths, which the twins mirror).  With ``data > 1`` the dropout key is
folded with the data-shard index so different samples draw independent
masks; exactness vs a single device then holds for dropout == 0 (tested).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from tpuseg.core.mesh import DATA_AXIS, MODEL_AXIS, SPACE_AXIS, MeshContext
from tpuseg.core.prng import step_key
from tpuseg.core import optim as optim_lib
from tpuseg.parallel.spatial import (
    SPATIAL_LOSS_NAMES,
    spatial_multiclass_dice,
    spatial_seg_loss,
    spatial_twin,
)
from tpuseg.tasks.trainer import Trainer, TrainerConfig


class SpatialSegTrainer(Trainer):
    """Trainer whose train/eval steps run the z-sharded model twin."""

    def __init__(
        self,
        model,
        loss_name: str,
        num_classes: int,
        alpha,
        gamma: float,
        params,
        config: TrainerConfig,
        mesh: MeshContext,
        viz_fn=None,
        packed_stem: bool = False,
    ):
        assert mesh.mesh.shape[SPACE_AXIS] > 1
        assert mesh.mesh.shape[MODEL_AXIS] == 1, (
            "spatial training shards activations, not parameters; "
            "use mesh model=1 with space>1"
        )
        assert num_classes >= 2, "spatial training is the multiclass 3D path"
        self.num_classes = num_classes
        if loss_name not in SPATIAL_LOSS_NAMES:
            raise ValueError(
                f"loss {loss_name!r} is not shard-decomposable; "
                f"spatial training supports {SPATIAL_LOSS_NAMES}"
            )
        self.packed_stem = bool(packed_stem)
        if self.packed_stem:
            # packed x spatial composition (models/unet_packed_sp.py):
            # the z-sharded step runs the space-to-depth packed forward
            # with halo'd packed convs + psum'd GN.  UNet3d only — the
            # other twins keep the plain spatial path.
            from tpuseg.models.unet import UNet

            if not (isinstance(model, UNet) and model.ndim == 3):
                raise ValueError(
                    "packed_stem with space>1 supports UNet(ndim=3); "
                    f"got {type(model).__name__}"
                )
            self.sp_model = None
            self._packed_model = model
        else:
            self.sp_model = spatial_twin(model)
        self.loss_name = loss_name
        self.alpha = alpha
        self.gamma = gamma
        super().__init__(
            apply_fn=None, loss_fn=None, metric_fn=None,
            params=params, config=config, mesh=mesh, viz_fn=viz_fn,
        )

    # ------------------------------------------------------------- steps
    def _build_steps(self):
        mesh = self.mesh.mesh
        sp_model = self.sp_model
        if self.packed_stem:
            from tpuseg.models.unet_packed import UNET_PACKED_LEVELS_DEFAULT
            from tpuseg.models.unet_packed_sp import packed_unet3d_apply_sp

            m = self._packed_model
            nc, feats, lv, drop = (
                self.num_classes, m.features, m.levels, m.dropout,
            )
            plv = UNET_PACKED_LEVELS_DEFAULT

            def apply_local(params, image, train, key):
                return packed_unet3d_apply_sp(
                    params, image, axis_name=SPACE_AXIS, num_classes=nc,
                    features=feats, levels=lv, dropout=drop, train=train,
                    rng=key if train else None, packed_levels=plv,
                )
        else:

            def apply_local(params, image, train, key):
                kw = {"rngs": {"dropout": key}} if train else {}
                return sp_model.apply(params, image, train=train, **kw)

        loss_name, alpha, gamma = self.loss_name, self.alpha, self.gamma
        tx = self.tx
        n_data = mesh.shape[DATA_AXIS]
        loss_axes = (DATA_AXIS, SPACE_AXIS)
        vol_spec = P(DATA_AXIS, SPACE_AXIS)  # batch over data, depth over space

        def local_key(key):
            if n_data > 1:  # independent masks per data shard (module doc)
                return jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
            return key

        @partial(
            shard_map, mesh=mesh,
            in_specs=(P(), vol_spec, vol_spec, P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        def loss_grads_metric(params, image, label, key):
            def loss_fn(p):
                logits, probs = apply_local(p, image, True, local_key(key))
                loss = spatial_seg_loss(
                    logits.astype(jnp.float32), label, loss_name,
                    loss_axes, alpha, gamma,
                )
                return loss, probs

            (loss, probs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            grads = jax.tree_util.tree_map(
                lambda t: jax.lax.psum(t, loss_axes), grads
            )
            metric = spatial_multiclass_dice(probs, label, SPACE_AXIS)
            metric = jax.lax.pmean(metric, DATA_AXIS)
            return loss, grads, metric

        @partial(
            shard_map, mesh=mesh,
            in_specs=(P(), vol_spec, vol_spec),
            out_specs=(P(), P(), vol_spec),
            check_vma=False,
        )
        def eval_local(params, image, label):
            logits, probs = apply_local(params, image, False, None)
            loss = spatial_seg_loss(
                logits.astype(jnp.float32), label, loss_name,
                loss_axes, alpha, gamma,
            )
            metric = spatial_multiclass_dice(probs, label, SPACE_AXIS)
            metric = jax.lax.pmean(metric, DATA_AXIS)
            return loss, metric, probs

        def train_step(state, batch):
            key = step_key(
                jax.random.wrap_key_data(state["key"]), state["step"]
            )
            loss, grads, metric = loss_grads_metric(
                state["params"], batch["image"], batch["label"], key
            )
            updates, opt_state = tx.update(
                grads, state["opt_state"], state["params"]
            )
            params = optim_lib.apply_updates(state["params"], updates)
            new_state = {
                "params": params,
                "opt_state": opt_state,
                "key": state["key"],
                "step": state["step"] + 1,
            }
            return new_state, {"loss": loss, "metric": metric}

        def eval_step(state, batch):
            loss, metric, probs = eval_local(
                state["params"], batch["image"], batch["label"]
            )
            return {
                "loss": loss,
                "metric": metric,
                "outputs": {"probs": probs},
            }

        donate = (0,) if self.config.donate_state else ()
        self._train_step = jax.jit(train_step, donate_argnums=donate)
        self._eval_step = jax.jit(eval_step)

    # ----------------------------------------------------------- helpers
    def _put(self, batch):
        mesh = self.mesh.mesh

        def put(x):
            x = np.asarray(x)
            return jax.device_put(
                x, NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
            )

        return jax.tree_util.tree_map(put, batch)


def make_spatial_segmentation_trainer(
    model,
    example_image,
    num_classes: int,
    loss_name: str,
    alpha=None,
    gamma: float = 2.0,
    config: Optional[TrainerConfig] = None,
    mesh: Optional[MeshContext] = None,
    seed: int = 0,
    viz_fn=None,
    packed_stem: bool = False,
) -> SpatialSegTrainer:
    """Factory mirroring make_segmentation_trainer for space>1 meshes.

    `example_image` is a full (unsharded) example; params are initialized
    with the PLAIN model (identical tree to the spatial twin), so resume /
    torch import / export all interoperate."""
    config = config or TrainerConfig()
    params = model.init(jax.random.key(seed), jnp.asarray(example_image))
    return SpatialSegTrainer(
        model, loss_name, num_classes, alpha, gamma,
        params, config, mesh, viz_fn=viz_fn, packed_stem=packed_stem,
    )
