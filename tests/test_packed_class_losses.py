"""Class-major packed losses/metrics (losses/packed_class.py) equal the
fine-domain implementations up to float reassociation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.losses import categorical, packed_class
from tpuseg.models.unet_packed import space_to_depth_labels
from tpuseg.models.vnet_packed import depth_to_space3d, packed_class_to_delta


K = 5


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    logitsp = jnp.asarray(
        rng.normal(size=(2, 8, 8, 8, 8 * K)).astype(np.float32)
    )  # class-major packed
    labels = jnp.asarray(
        rng.integers(0, K, size=(2, 16, 16, 16)).astype(np.int32)
    )
    # fine logits consistent with the packed tensor: class-major ->
    # delta-major -> depth-to-space
    logits_fine = depth_to_space3d(packed_class_to_delta(logitsp, K))
    lb8 = space_to_depth_labels(labels)
    return logitsp, logits_fine, labels, lb8


CASES = [
    ("cross_entropy_loss", {}),
    ("focal_loss", {"gamma": 2.0}),
    ("dice_loss", {}),
    ("ce_dice_loss", {}),
    ("el_dice_loss", {}),
    ("ss_loss", {}),
    ("tversky_loss", {}),
]


@pytest.mark.parametrize("name,kw", CASES)
def test_packed_loss_matches_fine(data, name, kw):
    logitsp, logits_fine, labels, lb8 = data
    alpha = [1.0, 2.0, 0.5, 1.5, 1.0]
    fine = float(getattr(categorical, name)(logits_fine, labels,
                                            alpha=alpha, **kw))
    packed = float(getattr(packed_class, name)(logitsp, lb8, alpha=alpha,
                                               num_classes=K, **kw))
    np.testing.assert_allclose(packed, fine, rtol=2e-5, atol=2e-6)


def test_packed_loss_missing_class(data):
    """Present-class masking: a class absent from the batch."""
    logitsp, logits_fine, labels, lb8 = data
    labels2 = jnp.where(labels == 3, 0, labels)
    lb8_2 = space_to_depth_labels(labels2)
    for name in ("dice_loss", "cross_entropy_loss", "tversky_loss"):
        fine = float(getattr(categorical, name)(logits_fine, labels2))
        packed = float(getattr(packed_class, name)(logitsp, lb8_2,
                                                   num_classes=K))
        np.testing.assert_allclose(packed, fine, rtol=2e-5, atol=2e-6)


def test_packed_metrics_match_fine(data):
    from tpuseg import metrics as metrics_lib

    logitsp, logits_fine, labels, lb8 = data
    probs_fine = jax.nn.softmax(logits_fine, axis=-1)
    # class-major packed probs from the same logits
    from tpuseg.models.vnet_packed import packed_softmax

    probsp = packed_softmax(logitsp, K, layout="class")
    fine_d = float(metrics_lib.multiclass_dice_coeff(probs_fine, labels))
    packed_d = float(packed_class.multiclass_dice_coeff(probsp, lb8,
                                                        num_classes=K))
    np.testing.assert_allclose(packed_d, fine_d, rtol=2e-5, atol=2e-6)
    fine_i = float(metrics_lib.multiclass_iou_coeff(probs_fine, labels))
    packed_i = float(packed_class.multiclass_iou_coeff(probsp, lb8,
                                                       num_classes=K))
    np.testing.assert_allclose(packed_i, fine_i, rtol=2e-5, atol=2e-6)


def test_trainer_class_loss_matches_fine(monkeypatch):
    """make_segmentation_trainer with USE_PACKED_CLASS_LOSS: first-step
    loss/metric equal the fine-domain packed_stem trainer's."""
    from tpuseg.models.unet import UNet
    from tpuseg.tasks import segmentation
    from tpuseg.tasks.trainer import TrainerConfig

    rng = np.random.default_rng(1)
    shape = (16, 16, 16)
    img = rng.normal(size=(1, *shape, 1)).astype(np.float32)
    lbl = rng.integers(0, 3, size=(1, *shape)).astype(np.int32)
    unet = UNet(ndim=3, num_classes=3, features=8, levels=2, dropout=0.0)

    def step(flag):
        monkeypatch.setattr(segmentation, "USE_PACKED_CLASS_LOSS", flag)
        tr = segmentation.make_segmentation_trainer(
            unet, img, 3, "MutilCrossEntropyDiceLoss", alpha=[1.0] * 3,
            config=TrainerConfig(epochs=1, lr=1e-3), packed_stem=True,
        )
        tr._build_steps()
        batch = tr._put({"image": img, "label": lbl})
        _, m = tr._train_step(tr.state, batch)
        return float(m["loss"]), float(m["metric"])

    loss_c, acc_c = step(True)
    loss_f, acc_f = step(False)
    np.testing.assert_allclose(loss_c, loss_f, rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(acc_c, acc_f, rtol=3e-5, atol=3e-6)
