"""Tests: pipeline parallelism, VSNet multi-task trainer, resilient fit."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.core.mesh import make_mesh
from tpuseg.parallel.pipeline import pipeline_apply, sequential_reference

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_pipeline_matches_sequential(rng):
    """4-stage affine pipeline over the model axis == sequential result."""
    mesh = make_mesh(data=1, model=4, space=1)
    S, T, D = 4, 6, 16
    params = {
        "w": jnp.asarray(rng.normal(size=(S, D, D)).astype(np.float32) * 0.3),
        "b": jnp.asarray(rng.normal(size=(S, D)).astype(np.float32)),
    }
    mb = jnp.asarray(rng.normal(size=(T, 8, D)).astype(np.float32))

    def stage(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    out = pipeline_apply(stage, params, mb, mesh, axis="model")
    ref = sequential_reference(stage, params, mb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_conv_stages(rng):
    """Conv-block stages (the realistic PP unit) shard and match."""
    mesh = make_mesh(data=1, model=2, space=1)
    S, T = 2, 3
    k = jnp.asarray(rng.normal(size=(S, 3, 3, 4, 4)).astype(np.float32) * 0.2)
    mb = jnp.asarray(rng.normal(size=(T, 1, 8, 8, 4)).astype(np.float32))

    def stage(p, x):
        return jax.nn.relu(
            jax.lax.conv_general_dilated(
                x, p, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )

    out = pipeline_apply(stage, k, mb, mesh, axis="model")
    ref = sequential_reference(stage, k, mb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_vsnet_multitask_trainer(rng):
    from tpuseg.tasks.multitask import make_vsnet_trainer
    from tpuseg.tasks.trainer import TrainerConfig

    trainer = make_vsnet_trainer(
        example_shape=(1, 16, 16, 16, 1), feature_size=6,
        config=TrainerConfig(epochs=1, lr=1e-3, optimizer="adam"),
    )
    trainer._build_steps()
    batch = {
        "image": rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32),
        "label": rng.integers(0, 3, size=(1, 16, 16, 16)).astype(np.int32),
        "reg_target": rng.random((1, 16, 16, 16, 1)).astype(np.float32),
        "edge_label": rng.integers(0, 2, size=(1, 16, 16, 16)).astype(np.int32),
    }
    state, m = trainer._train_step(trainer.state, trainer._put(batch))
    assert np.isfinite(float(m["loss"]))
    assert 0 <= float(m["metric"]) <= 1


def test_fit_resilient_restarts(rng):
    """A loader that crashes once mid-training: fit_resilient resumes from
    the latest checkpoint and completes."""
    from tpuseg.models.unet import UNet
    from tpuseg.tasks.segmentation import make_segmentation_trainer
    from tpuseg.tasks.trainer import TrainerConfig

    model_dir = tempfile.mkdtemp()
    model = UNet(ndim=2, num_classes=1, features=8, dropout=0.0)
    trainer = make_segmentation_trainer(
        model, np.zeros((1, 16, 16, 1), np.float32), 1, "BinaryDiceLoss",
        config=TrainerConfig(epochs=3, lr=1e-3),
    )
    crashed = {"done": False}

    def make_batches():
        def gen():
            for i in range(2):
                yield {
                    "image": rng.normal(size=(2, 16, 16, 1)).astype(np.float32),
                    "label": (rng.random((2, 16, 16, 1)) > 0.5).astype(np.float32),
                }
                if not crashed["done"] and os.path.isdir(
                    os.path.join(model_dir, "latest")
                ):
                    crashed["done"] = True
                    raise RuntimeError("injected failure")
        return gen()

    h = trainer.fit_resilient(make_batches, make_batches, model_dir, max_restarts=2)
    assert crashed["done"]  # the failure really happened
    assert len(h["train_loss"]) >= 1
