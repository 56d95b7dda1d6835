"""Config-driven training entry point.

The tpuseg equivalent of `/root/reference/train.py` (CSV manifests →
MutilUNet3d, KiPA2022 112×112×128, 5 classes, MutilDiceLoss) — but
generic over the whole zoo via the config system, with the TPU-native
extras the reference lacks: mesh data-parallelism, resume, online
device-side augmentation, profiler traces.

    python examples/train.py --config cfg.json \
        --model.name unet3d --train.loss_name MutilDiceLoss \
        --data.train_csv data/traindata.csv --data.val_csv data/validata.csv
"""
import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpuseg.config import parse_cli
from tpuseg.core.mesh import MeshContext, make_mesh
from tpuseg.data.dataset import DataLoader, SegDataset2D, SegDataset3D, read_manifest_csv
from tpuseg.data.augment3d import make_batch_augmenter
from tpuseg.models import build_model
from tpuseg.tasks.segmentation import make_segmentation_trainer
from tpuseg.tasks.trainer import TrainerConfig
from tpuseg.tools.visualization import make_seg_viz, plot_result


def main(argv=None):
    cfg = parse_cli(argv)
    images, labels = read_manifest_csv(cfg.data.train_csv)
    if cfg.data.train_aug_csv:
        ai, al = read_manifest_csv(cfg.data.train_aug_csv)
        images, labels = list(images) + list(ai), list(labels) + list(al)
    val_images, val_labels = read_manifest_csv(cfg.data.val_csv)

    ndim = 3 if len(cfg.data.image_size) == 3 else 2
    if ndim == 3:
        train_ds = SegDataset3D(images, labels, binary=cfg.data.binary_labels)
        val_ds = SegDataset3D(val_images, val_labels, binary=cfg.data.binary_labels)
        x, y, z = cfg.data.image_size
        example = np.zeros((1, z, y, x, cfg.model.image_channel), np.float32)
    else:
        hw = tuple(cfg.data.image_size)
        train_ds = SegDataset2D(images, labels, hw, cfg.data.binary_labels)
        val_ds = SegDataset2D(val_images, val_labels, hw, cfg.data.binary_labels)
        example = np.zeros((1, *hw, cfg.model.image_channel), np.float32)

    transform = make_batch_augmenter() if (cfg.data.online_augment and ndim == 3) else None
    train_loader = DataLoader(
        train_ds, cfg.data.batch_size, shuffle=True, seed=cfg.data.shuffle_seed,
        transform=transform,
    )
    val_loader = DataLoader(val_ds, cfg.data.batch_size, shuffle=False)

    mesh = MeshContext(make_mesh(
        data=cfg.train.mesh_data, model=cfg.train.mesh_model,
        space=cfg.train.mesh_space,
    ))
    model = build_model(
        cfg.model.name, cfg.model.num_classes,
        features=cfg.model.features, dropout=cfg.model.dropout,
    )
    alpha = cfg.train.alpha or [1.0] * cfg.model.num_classes
    trainer = make_segmentation_trainer(
        model, example, cfg.model.num_classes, cfg.train.loss_name,
        alpha=alpha, gamma=cfg.train.gamma, accuracy_name=cfg.train.accuracy_name,
        config=TrainerConfig(
            epochs=cfg.train.epochs, lr=cfg.train.lr, optimizer=cfg.train.optimizer,
            grad_clip=cfg.train.grad_clip,
            early_stop_patience=cfg.train.early_stop_patience,
            compute_dtype=jnp.dtype(cfg.train.compute_dtype),
        ),
        mesh=mesh,
        viz_fn=make_seg_viz(cfg.model.num_classes, ndim),
        packed_stem=cfg.train.packed_stem,
    )
    if cfg.train.profile:
        from tpuseg.tools.profiling import trace_steps

        trace_steps(trainer, train_loader, os.path.join(cfg.train.model_dir, "trace"))

    history = trainer.fit(
        lambda: iter(train_loader), lambda: iter(val_loader),
        cfg.train.model_dir, resume=cfg.train.resume,
    )
    plot_result(cfg.train.model_dir, history["train_loss"], history["valdation_loss"],
                "train_loss", "valdation_loss", "loss")
    plot_result(cfg.train.model_dir, history["train_accuracy"],
                history["valdation_accuracy"], "train_accuracy",
                "valdation_accuracy", "accuracy")
    with open(os.path.join(cfg.train.model_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())


if __name__ == "__main__":
    main()
