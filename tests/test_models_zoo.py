"""Shape/contract tests for the wider model zoo (deep-supervision nets,
STUNet3d, TPDDNet, ResNet classifiers)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.models import build_model
from tpuseg.models.resnet import ResNetClassifier


def _run(model, x, train=False):
    params = model.init(jax.random.key(0), x)
    rngs = {"dropout": jax.random.key(1)} if train else None
    return params, model.apply(params, x, train=train, rngs=rngs)


def test_resunet3d_deep_supervision():
    x = jnp.zeros((1, 16, 16, 16, 1))
    model = build_model("resunet3d", num_classes=3, features=8)
    _, (logits, probs, aux) = _run(model, x)
    assert logits.shape == (1, 16, 16, 16, 3)
    assert len(aux) == 3
    for a in aux:
        assert a.shape == (1, 16, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_kiunet3d_shapes():
    x = jnp.zeros((1, 16, 16, 16, 1))
    model = build_model("kiunet3d", num_classes=1, features=8)
    _, (logits, probs, aux) = _run(model, x)
    assert logits.shape == (1, 16, 16, 16, 1)
    assert len(aux) == 3


def test_stunet3d_shapes():
    x = jnp.zeros((1, 16, 16, 16, 1))
    model = build_model("stunet3d", num_classes=4, features=8)
    _, (logits, probs) = _run(model, x)
    assert logits.shape == (1, 16, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_tpddnet_shapes_and_drop():
    x = jnp.zeros((1, 16, 16, 16, 1))
    model = build_model("tpddnet", num_classes=2)
    params, (logits, probs, aux) = _run(model, x)
    assert logits.shape == (1, 16, 16, 16, 2)
    assert len(aux) == 2
    # channel-drop active in train mode needs rng; different keys → different out
    o1 = model.apply(params, jnp.ones_like(x), train=True,
                     rngs={"dropout": jax.random.key(1)})
    o2 = model.apply(params, jnp.ones_like(x), train=True,
                     rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(o1[0]), np.asarray(o2[0]))


def test_resnet_classifier_shapes():
    for ndim, spatial in ((2, (32, 32)), (3, (16, 16, 16))):
        x = jnp.zeros((2, *spatial, 1))
        model = ResNetClassifier(ndim=ndim, num_classes=4)
        _, logits = _run(model, x)
        assert logits.shape == (2, 4)


def test_ds_training_step_runs():
    """Deep-supervision aux heads feed the loss without breaking grad."""
    from tpuseg.tasks.segmentation import make_segmentation_trainer
    from tpuseg.tasks.trainer import TrainerConfig

    model = build_model("resunet3d", num_classes=2, features=8)
    trainer = make_segmentation_trainer(
        model,
        example_image=np.zeros((1, 16, 16, 16, 1), np.float32),
        num_classes=2,
        loss_name="MutilDiceLoss",
        alpha=[1.0, 1.0],
        config=TrainerConfig(epochs=1, lr=1e-3),
    )
    trainer._build_steps()
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32),
        "label": rng.integers(0, 2, size=(2, 16, 16, 16)).astype(np.int32),
    }
    state, m = trainer._train_step(trainer.state, trainer._put(batch))
    assert np.isfinite(float(m["loss"]))
