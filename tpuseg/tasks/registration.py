"""Deformable-registration task: NCC/MSE similarity + ddf smoothness +
optional label dice — the trainer for VNet3dRegistration.

The reference wires its registration net (`networks/VNet3dregistration.py`)
through the same Model-class template; here it binds into the generic
Trainer with a composite loss:
    L = sim(moved, fixed) + λ_smooth · ‖∇ddf‖² + λ_seg · dice(moved_lab, fixed_lab)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tpuseg.core.mesh import MeshContext
from tpuseg.models.registration import VNet3dRegistration, gradient_loss, ncc_loss
from tpuseg.tasks.trainer import Trainer, TrainerConfig


def make_registration_trainer(
    example_shape=(1, 16, 16, 16, 1),
    similarity: str = "ncc",
    smooth_weight: float = 0.01,
    seg_weight: float = 0.0,
    features: int = 16,
    config: Optional[TrainerConfig] = None,
    mesh: Optional[MeshContext] = None,
    seed: int = 0,
) -> Trainer:
    config = config or TrainerConfig(optimizer="adam")
    model = VNet3dRegistration(features=features)
    z = jnp.zeros(example_shape, jnp.float32)
    params = model.init(jax.random.key(seed), z, z, z)

    def apply_fn(params, batch, train, rng):
        rngs = {"dropout": rng} if (train and rng is not None) else None
        moved_img, moved_lab, ddf = model.apply(
            params, batch["moving_image"], batch["fixed_image"],
            batch["moving_label"], train=train, rngs=rngs,
        )
        return {"moved_image": moved_img, "moved_label": moved_lab, "ddf": ddf}

    def loss_fn(outputs, batch):
        if similarity == "ncc":
            sim = ncc_loss(outputs["moved_image"], batch["fixed_image"])
        else:
            sim = jnp.mean((outputs["moved_image"] - batch["fixed_image"]) ** 2)
        loss = sim + smooth_weight * gradient_loss(outputs["ddf"])
        if seg_weight > 0:
            p = outputs["moved_label"]
            t = batch["fixed_label"]
            inter = jnp.sum(p * t)
            dice = (2 * inter + 1e-5) / (jnp.sum(p) + jnp.sum(t) + 1e-5)
            loss = loss + seg_weight * (1.0 - dice)
        return loss

    def metric_fn(outputs, batch):
        p = (outputs["moved_label"] > 0.5).astype(jnp.float32)
        t = (batch["fixed_label"] > 0.5).astype(jnp.float32)
        inter = jnp.sum(p * t)
        return (2 * inter + 1e-5) / (jnp.sum(p) + jnp.sum(t) + 1e-5)

    trainer = Trainer(apply_fn, loss_fn, metric_fn, params, config, mesh)
    trainer.model = model
    return trainer
