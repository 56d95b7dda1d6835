"""End-to-end smoke example: train UNet2d on synthetic blobs.

The tpuseg equivalent of the reference's first recipe
(`/root/reference/example.py:16` trainbinaryvnet2d — binary 2D
segmentation) on generated data: random soft blobs, binary masks,
dice+BCE loss, dice metric, checkpointing, reload, predict.

Run on CPU:  python examples/train_synthetic.py --cpu
Run on TPU:  python examples/train_synthetic.py
(`JAX_PLATFORMS=cpu` also works where no site plugin pins the platform
list at interpreter start.)
"""
import os
import sys
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")
if "--cpu" in sys.argv or os.environ.get("JAX_PLATFORMS") == "cpu":
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpuseg.models.unet import UNet
from tpuseg.tasks.segmentation import make_segmentation_trainer
from tpuseg.tasks.trainer import TrainerConfig
from tpuseg.data.dataset import ArrayDataset, DataLoader


def make_blobs(n, size=32, seed=0):
    rng = np.random.default_rng(seed)
    samples = []
    for _ in range(n):
        cy, cx = rng.uniform(8, size - 8, 2)
        r = rng.uniform(4, 9)
        yy, xx = np.mgrid[0:size, 0:size]
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        mask = (d < r).astype(np.float32)
        img = mask + rng.normal(0, 0.35, (size, size)).astype(np.float32)
        samples.append(
            {"image": img[..., None].astype(np.float32), "label": mask[..., None]}
        )
    return ArrayDataset(samples)


def main():
    train_ds = make_blobs(64, seed=0)
    val_ds = make_blobs(16, seed=1)
    train_loader = DataLoader(train_ds, batch_size=8, shuffle=True)
    val_loader = DataLoader(val_ds, batch_size=8)

    model = UNet(ndim=2, num_classes=1, features=8, dropout=0.1)
    trainer = make_segmentation_trainer(
        model,
        example_image=np.zeros((1, 32, 32, 1), np.float32),
        num_classes=1,
        loss_name="BinaryCrossEntropyDiceLoss",
        config=TrainerConfig(epochs=8, lr=1e-3, optimizer="adamw"),
    )

    model_dir = os.environ.get("MODEL_DIR") or tempfile.mkdtemp(prefix="tpuseg_demo_")
    history = trainer.fit(
        lambda: iter(train_loader), lambda: iter(val_loader), model_dir
    )
    final_dice = history["valdation_accuracy"][-1]
    print(f"final validation dice: {final_dice:.4f}")

    # reload best checkpoint and predict one batch
    meta = trainer.load(model_dir, "best")
    print(f"reloaded best checkpoint: {meta}")
    batch = next(iter(val_loader))
    out = trainer.predict_batch(batch)
    pred = np.asarray(out["outputs"]["probs"]) > 0.5
    gt = np.asarray(batch["label"]) > 0.5
    dice = 2 * (pred & gt).sum() / (pred.sum() + gt.sum())
    print(f"reloaded-model batch dice: {dice:.4f}")
    assert final_dice > 0.85, "training failed to converge"
    assert dice > 0.85, "reloaded checkpoint failed"
    print("OK")


if __name__ == "__main__":
    main()
