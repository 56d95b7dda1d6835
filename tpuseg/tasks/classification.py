"""Classification task glue (binary sigmoid / multiclass softmax).

Capability parity with `/root/reference/model/modelResNet.py`: BCE or CE
loss on bare logits, accuracy metric, sigmoid/softmax predict.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tpuseg import metrics as metrics_lib
from tpuseg.core.mesh import MeshContext
from tpuseg.tasks.trainer import Trainer, TrainerConfig


def make_classification_trainer(
    model,
    example_image,
    num_classes: int,
    loss_name: str = "auto",
    config: Optional[TrainerConfig] = None,
    mesh: Optional[MeshContext] = None,
    seed: int = 0,
) -> Trainer:
    config = config or TrainerConfig()
    params = model.init(jax.random.key(seed), jnp.asarray(example_image))

    def apply_fn(params, batch, train, rng):
        rngs = {"dropout": rng} if (train and rng is not None) else None
        logits = model.apply(params, batch["image"], train=train, rngs=rngs)
        return {"logits": logits}

    if num_classes == 1 or loss_name == "BinaryCrossEntropyLoss":
        def loss_fn(outputs, batch):
            x = outputs["logits"].astype(jnp.float32).reshape(-1)
            t = batch["label"].astype(jnp.float32).reshape(-1)
            per = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
            return jnp.mean(per)

        def metric_fn(outputs, batch):
            pred = (jax.nn.sigmoid(outputs["logits"].reshape(-1)) > 0.5).astype(
                jnp.int32
            )
            return metrics_lib.accuracy(pred, batch["label"].astype(jnp.int32))
    else:
        def loss_fn(outputs, batch):
            logp = jax.nn.log_softmax(outputs["logits"].astype(jnp.float32), axis=-1)
            oh = jax.nn.one_hot(batch["label"].astype(jnp.int32), num_classes)
            return -jnp.mean(jnp.sum(oh * logp, axis=-1))

        def metric_fn(outputs, batch):
            pred = jnp.argmax(outputs["logits"], axis=-1)
            return metrics_lib.accuracy(pred, batch["label"].astype(jnp.int32))

    return Trainer(apply_fn, loss_fn, metric_fn, params, config, mesh)
