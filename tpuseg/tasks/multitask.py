"""Multi-task trainer glue for VSNet.

The reference defines VSNet's five outputs (`VSNet.py:1027-1063`: 3-class
vessel seg, sigmoid regression, 2-class edge seg, two deep-supervision
heads) but never wires a trainer for them; tpuseg provides the composite
loss:

    L = dice_ce(seg) + λ_reg·BCE(reg) + λ_edge·dice_ce(edge)
        + 0.5·dice_ce(deep2↓) + 0.25·dice_ce(deep3↓)

with the deep-supervision targets max-pooled to each head's resolution.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tpuseg import metrics as metrics_lib
from tpuseg.core.mesh import MeshContext
from tpuseg.losses import categorical
from tpuseg.losses.binary import bce_with_logits
from tpuseg.models.vsnet import VSNet
from tpuseg.tasks.trainer import Trainer, TrainerConfig


def _downsample_labels(labels, factor: int):
    """Label-preserving downsample: strided subsample (nearest)."""
    return labels[:, ::factor, ::factor, ::factor]


def make_vsnet_trainer(
    example_shape=(1, 32, 32, 32, 1),
    feature_size: int = 12,
    seg_classes: int = 3,
    reg_weight: float = 0.5,
    edge_weight: float = 0.5,
    alpha=None,
    config: Optional[TrainerConfig] = None,
    mesh: Optional[MeshContext] = None,
    seed: int = 0,
) -> Trainer:
    config = config or TrainerConfig(optimizer="adam")
    model = VSNet(feature_size=feature_size, seg_classes=seg_classes)
    params = model.init(jax.random.key(seed), jnp.zeros(example_shape, jnp.float32))

    def apply_fn(params, batch, train, rng):
        rngs = {"dropout": rng} if (train and rng is not None) else None
        seg_logits, probs, (reg, edge, deep2, deep3) = model.apply(
            params, batch["image"], train=train, rngs=rngs
        )
        return {
            "logits": seg_logits, "probs": probs,
            "reg": reg, "edge": edge, "deep2": deep2, "deep3": deep3,
        }

    def loss_fn(outputs, batch):
        lab = batch["label"]
        loss = categorical.ce_dice_loss(outputs["logits"], lab, alpha)
        if "reg_target" in batch:
            loss += reg_weight * bce_with_logits(outputs["reg"], batch["reg_target"])
        if "edge_label" in batch:
            loss += edge_weight * categorical.ce_dice_loss(
                outputs["edge"], batch["edge_label"]
            )
        loss += 0.5 * categorical.ce_dice_loss(
            outputs["deep2"], _downsample_labels(lab, 2), alpha
        )
        loss += 0.25 * categorical.ce_dice_loss(
            outputs["deep3"], _downsample_labels(lab, 4), alpha
        )
        return loss

    def metric_fn(outputs, batch):
        return metrics_lib.multiclass_dice_coeff(outputs["probs"], batch["label"])

    trainer = Trainer(apply_fn, loss_fn, metric_fn, params, config, mesh)
    trainer.model = model
    return trainer
