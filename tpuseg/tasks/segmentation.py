"""Segmentation task: binds (network, loss, metric) into Trainer callables.

Replaces the per-class glue of `/root/reference/model/modelUnet.py:69-89`
(stringly-typed loss/metric if-chains) with one parameterized factory.
Batches are channels-last: image (N, *spatial, C), label (N, *spatial)
int (multiclass) or float 0/1 (binary).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tpuseg import metrics as metrics_lib
from tpuseg.losses import build_loss
from tpuseg.tasks.trainer import Trainer, TrainerConfig
from tpuseg.core.mesh import MeshContext

# Opt-in: compute loss/metric on the space-to-depth-packed grid (no
# depth-to-space in the train graph).  Exact (voxel-permutation-invariant
# reductions; pinned in tests/test_unet_packed.py) but MEASURED ~7% slower
# than the fine-domain loss on chip in its DELTA-major generic form — see
# the round-4 ledger (BASELINE.md) and the comment at the dispatch site.
USE_PACKED_GRID_LOSS = False

# The CLASS-major packed-grid loss (losses/packed_class.py): softmax,
# one-hot compares and per-class stats as contiguous 8-channel slices —
# no (..., K) minor dim anywhere in the loss, on top of dropping the
# d2s pair.  Used when packed_stem and the loss has a packed twin;
# falls back to the fine-domain loss otherwise.  Independent of
# USE_PACKED_GRID_LOSS (which selects the delta-major generic form).
# Default OFF until the chip measurement lands (see round-4 ledger).
USE_PACKED_CLASS_LOSS = False


def make_segmentation_trainer(
    model,
    example_image,
    num_classes: int,
    loss_name: str,
    alpha=None,
    gamma: float = 2.0,
    accuracy_name: str = "dice",
    config: Optional[TrainerConfig] = None,
    mesh: Optional[MeshContext] = None,
    seed: int = 0,
    viz_fn=None,
    packed_stem: bool = False,
) -> Trainer:
    config = config or TrainerConfig()

    # space>1 mesh -> the z-sharded product path (halo convs + psum'd GN;
    # tasks/spatial.py).  Same entry point, same checkpoints.  With
    # model>1 the space axis belongs to other machinery (e.g. the dryrun's
    # dp+tp step on a full (2,2,2) mesh) — spatial training shards
    # activations, not parameters, so it requires model == 1.
    if (
        mesh is not None
        and mesh.mesh.shape.get("space", 1) > 1
        and mesh.mesh.shape.get("model", 1) == 1
    ):
        # packed x spatial composition: UNet3d runs the space-to-depth
        # packed forward z-sharded (models/unet_packed_sp.py — halo'd
        # packed convs + psum'd GN); other models need the per-layer
        # flax twins and keep the plain spatial path.
        if packed_stem:
            from tpuseg.models.unet import UNet

            if not (isinstance(model, UNet) and model.ndim == 3):
                raise ValueError(
                    "packed_stem with spatial (space>1) training supports "
                    f"UNet(ndim=3) only; got {type(model).__name__} — "
                    "drop packed_stem for the plain z-sharded twin"
                )
        from tpuseg.tasks.spatial import make_spatial_segmentation_trainer

        return make_spatial_segmentation_trainer(
            model, example_image, num_classes, loss_name,
            alpha=alpha, gamma=gamma, config=config, mesh=mesh,
            seed=seed, viz_fn=viz_fn, packed_stem=packed_stem,
        )

    loss = build_loss(loss_name, num_classes, alpha=alpha, gamma=gamma)

    params = model.init(jax.random.key(seed), jnp.asarray(example_image))

    if packed_stem:
        # space-to-depth packed finest level (models/unet_packed.py /
        # vnet_packed.py): identical parameter pytree (checkpoints and
        # interop unchanged), exact forward AND grads (f64 parity in
        # tests/test_unet_packed.py), ~2.6x faster train step on the
        # lane-starved finest-level blocks at batch 1.
        from tpuseg.models.unet import UNet
        from tpuseg.models.vnet import VNet

        # Packed-GRID loss: the supported losses/metrics reduce over
        # voxels, so they can consume the space-to-depth-packed logits
        # directly (labels packed to the matching voxel order on device)
        # — the final depth-to-space of logits+probs AND the fine-layout
        # (K-on-lanes, K≤5 of 128) loss elementwise ops drop out of the
        # train graph.  clDice skeletonizes spatially and viz_fn expects
        # fine-layout probs, so those fall back to fine-domain outputs.
        # MEASURED SLOWER on chip (round 4, packed_train_step_probe.py,
        # UNet3d 112x112x128 b1 f32, interleaved): packed-grid 71.0 vs
        # fine-domain 65.9 ms/step — the on-device label pack + 8K-lane
        # loss cost more than the d2s pair they remove.  Off by default;
        # the path stays exactness-tested (test_unet_packed.py).
        from tpuseg.models.resunet3d import ResUNet3d

        # ResUNet3d's deep-supervision aux heads train in the fine domain
        # (they upsample from coarser levels), so its packed twin always
        # returns fine-layout outputs — no packed-grid loss for it.
        is_resunet = isinstance(model, ResUNet3d)

        def _is_stunet(m):
            from tpuseg.models.stunet3d import STUNet3d

            return isinstance(m, STUNet3d)
        packed_loss_fn = None
        if (
            USE_PACKED_CLASS_LOSS and viz_fn is None and num_classes > 1
            and accuracy_name in ("dice", "iou") and not is_resunet
        ):
            from tpuseg.losses.packed_class import build_packed_loss

            packed_loss_fn = build_packed_loss(
                loss_name, num_classes, alpha=alpha, gamma=gamma
            )
        packed_class = packed_loss_fn is not None
        packed_grid = packed_class or (
            USE_PACKED_GRID_LOSS and viz_fn is None
            and "ClDice" not in loss_name and not is_resunet
        )
        packed_layout = "class" if packed_class else "delta"

        if isinstance(model, UNet) and model.ndim == 3:
            from tpuseg.models.unet_packed import packed_unet3d_apply

            def apply_fn(params, batch, train, rng):
                logits, probs = packed_unet3d_apply(
                    params, batch["image"], num_classes=num_classes,
                    features=model.features, levels=model.levels,
                    dropout=model.dropout, train=train,
                    rng=rng if train else None,
                    return_packed=packed_grid, packed_layout=packed_layout,
                )
                return {"logits": logits, "probs": probs}

        elif isinstance(model, VNet) and model.ndim == 3:
            from tpuseg.models.vnet_packed import packed_vnet3d_apply

            def apply_fn(params, batch, train, rng):
                logits, probs = packed_vnet3d_apply(
                    params, batch["image"], num_classes=num_classes,
                    features=model.features, dropout=model.dropout,
                    train=train, rng=rng if train else None,
                    return_packed=packed_grid, packed_layout=packed_layout,
                )
                return {"logits": logits, "probs": probs}

        elif _is_stunet(model):
            from tpuseg.models.stunet_packed import packed_stunet3d_apply

            def apply_fn(params, batch, train, rng):
                logits, probs = packed_stunet3d_apply(
                    params, batch["image"], num_classes=num_classes,
                    features=model.features, dropout=model.dropout,
                    train=train, rng=rng if train else None,
                    return_packed=packed_grid, packed_layout=packed_layout,
                )
                return {"logits": logits, "probs": probs}

        elif is_resunet:
            from tpuseg.models.resunet_packed import packed_resunet3d_apply

            def apply_fn(params, batch, train, rng):
                logits, probs, aux = packed_resunet3d_apply(
                    params, batch["image"], num_classes=num_classes,
                    features=model.features, dropout=model.dropout,
                    train=train, rng=rng if train else None,
                )
                return {"logits": logits, "probs": probs, "ds_logits": aux}

        else:
            raise ValueError(
                "packed_stem=True supports UNet(ndim=3), VNet(ndim=3), "
                f"STUNet3d and ResUNet3d; got {type(model).__name__}"
            )

        # r5 (ledger): TRAIN graphs use the affine GN form for
        # low-precision inputs (-2.5 ms/step bf16; fwd27 inference A/B
        # was a wash, so eval keeps the reshape form and its exact
        # plain-model numerics).  The context binds at trace time —
        # `train` is a Python bool here.
        from tpuseg.models import vnet_packed as _vp

        _inner_apply = apply_fn

        def apply_fn(params, batch, train, rng, _fn=_inner_apply):
            with _vp.affine_gn_lowp(_vp.AFFINE_GN_IN_TRAINING and train):
                return _fn(params, batch, train, rng)

    else:
        packed_grid = False
        packed_class = False

        def apply_fn(params, batch, train, rng):
            rngs = {"dropout": rng} if (train and rng is not None) else None
            out = model.apply(params, batch["image"], train=train, rngs=rngs)
            if len(out) == 3:  # deep-supervision nets: (logits, probs, aux_logits)
                logits, probs, aux = out
                return {"logits": logits, "probs": probs, "ds_logits": aux}
            logits, probs = out
            return {"logits": logits, "probs": probs}

    # deep supervision: auxiliary heads weighted 1/2, 1/4, 1/8 … coarsest last
    def _ds_extra(outputs, batch):
        extra = 0.0
        aux = outputs.get("ds_logits", ())
        # aux is ordered coarsest-first (see resunet3d/kiunet3d); weight the
        # finer heads more
        weights = [0.5 / (2 ** i) for i in range(len(aux))][::-1]
        for w, lg in zip(weights, aux):
            extra = extra + w * loss(lg, batch["label"])
        return extra

    if loss_name in ("BinaryLovaszLoss",):
        def loss_fn(outputs, batch):
            return loss(outputs["logits"][..., 0], batch["label"].astype(jnp.float32))
    else:
        def loss_fn(outputs, batch):
            return loss(outputs["logits"], batch["label"]) + _ds_extra(outputs, batch)

    if num_classes == 1:
        if accuracy_name == "dice":
            metric = metrics_lib.dice_coeff
        else:
            metric = metrics_lib.iou_coeff
    else:
        if accuracy_name == "dice":
            metric = metrics_lib.multiclass_dice_coeff
        else:
            metric = metrics_lib.multiclass_iou_coeff

    def metric_fn(outputs, batch):
        return metric(outputs["probs"], batch["label"])

    if packed_class:
        # CLASS-major packed outputs: the loss/metric are the slice-form
        # twins (losses/packed_class.py) on the packed logits + packed
        # delta-major labels — no (..., K) minor dim in the loss graph.
        from tpuseg.models.unet_packed import space_to_depth_labels
        from tpuseg.losses import packed_class as pc

        pc_metric = (
            pc.multiclass_dice_coeff if accuracy_name == "dice"
            else pc.multiclass_iou_coeff
        )

        def loss_fn(outputs, batch):  # noqa: F811
            lb8 = space_to_depth_labels(batch["label"])
            return packed_loss_fn(outputs["logits"], lb8)

        def metric_fn(outputs, batch):  # noqa: F811
            lb8 = space_to_depth_labels(batch["label"])
            return pc_metric(outputs["probs"], lb8,
                             num_classes=num_classes)

    elif packed_grid:
        # packed outputs (N, d, h, w, 8K): pair every voxel with its label
        # by merging (w, delta) — both sides use the same delta-major
        # order (models/unet_packed.py space_to_depth_labels), so each
        # supported loss/metric (a voxel reduction) equals its fine-domain
        # value exactly up to float reassociation (tests pin it).
        from tpuseg.models.unet_packed import space_to_depth_labels

        def _grid(chan, labels):
            n, d, h, w, ck = chan.shape
            k = ck // 8
            lb = space_to_depth_labels(labels).reshape(n, d, h, w * 8)
            return chan.reshape(n, d, h, w * 8, k), lb

        if loss_name == "BinaryLovaszLoss":
            def loss_fn(outputs, batch):  # noqa: F811
                lg, lb = _grid(outputs["logits"], batch["label"])
                return loss(lg[..., 0], lb.astype(jnp.float32))
        else:
            def loss_fn(outputs, batch):  # noqa: F811
                lg, lb = _grid(outputs["logits"], batch["label"])
                return loss(lg, lb)

        def metric_fn(outputs, batch):  # noqa: F811
            pb, lb = _grid(outputs["probs"], batch["label"])
            return metric(pb, lb)

    return Trainer(apply_fn, loss_fn, metric_fn, params, config, mesh, viz_fn=viz_fn)
